"""Pallas TPU kernel: elementwise dropout on the hardware PRNG.

``jax.random.bernoulli`` burns a threefry draw per element and
materializes the keep mask in HBM (the attention-fc dropout over the
[Lq, d_v] token field costs ~0.6 ms per hop at 769x1537 — reference
Training/ptsemseg/models/td4_psp/transformer.py:89 ``self.dropout``).
This kernel generates the mask from the TPU hardware PRNG in VMEM —
never materialized — and its custom VJP regenerates the identical mask
per (seed, row-block) in the backward pass, so nothing but the seed is
saved. RNG streams are impl-defined (docs/PARITY.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_R = 1024


def _kernel(seed_ref, x_ref, o_ref, *, rate: float):
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
    thresh = jnp.uint32(round((1.0 - rate) * float(2**32)) - 1)
    keep = bits <= thresh
    o_ref[:] = jnp.where(keep, x_ref[:] * (1.0 / (1.0 - rate)),
                         jnp.zeros((), x_ref.dtype))


def _drop2d(x, seed, rate: float):
    r, c = x.shape
    rp = (r + _BLOCK_R - 1) // _BLOCK_R * _BLOCK_R
    xp = jnp.pad(x, ((0, rp - r), (0, 0))) if rp != r else x
    out = pl.pallas_call(
        functools.partial(_kernel, rate=rate),
        grid=(rp // _BLOCK_R,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((_BLOCK_R, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_BLOCK_R, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, c), x.dtype),
    )(seed, xp)
    return out[:r] if rp != r else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dropout_flat(x, seed, rate: float):
    return _drop2d(x, seed, rate)


def _dropout_flat_fwd(x, seed, rate):
    return _drop2d(x, seed, rate), seed


def _dropout_flat_bwd(rate, seed, dy):
    # dropout is linear in x with a fixed mask: the VJP applies the SAME
    # mask (regenerated per (seed, block)) to the cotangent
    return _drop2d(dy, seed, rate), None


_dropout_flat.defvjp(_dropout_flat_fwd, _dropout_flat_bwd)


def dropout_tpu(x: jnp.ndarray, rng, rate: float) -> jnp.ndarray:
    """Bernoulli(1-rate) dropout with 1/(1-rate) rescale over any-shaped
    ``x`` (flattened to [rows, minor]); differentiable, mask never
    materialized in HBM."""
    seed = jax.random.bits(rng, (1,), jnp.uint32).astype(jnp.int32)
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    return _dropout_flat(x2, seed, rate).reshape(shape)
