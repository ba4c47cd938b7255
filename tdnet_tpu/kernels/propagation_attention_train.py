"""Pallas TPU kernel: fused attention propagation, TRAINING path.

The training twins run the same propagation attention as streaming
(reference Training/ptsemseg/models/td4_psp/transformer.py:117-139 —
``softmax(q k^T / T)`` + attention dropout 0.1 + ``@ v``) but need
gradients and dropout. The XLA formulation materializes the
[Lq, Lkv] f32 score matrix in HBM forward AND backward (~160 MB per hop
at 769x1537) and burns a [Lq, Lkv] threefry draw per hop for the mask.

This kernel:
- forward: streams q in row blocks with K/V fully VMEM-resident
  (Lkv <= ~2.2k at every training geometry), fuses QK^T -> scale ->
  softmax -> dropout -> PV; the score matrix never leaves VMEM. The
  dropout mask comes from the TPU hardware PRNG seeded per
  (seed, q-block), so it is never materialized in HBM either.
- backward: recomputes scores/softmax/mask per q-block (bit-identical
  to forward: same inputs, same ops, same PRNG seeds), emits dq per
  block and accumulates dk/dv in f32 VMEM across the sequential grid.

Gradient math is the standard softmax/dropout VJP — the same multiset
of products as XLA autodiff, f32 accumulation throughout; only the
float summation order (q-row blocking) differs. The dropout RNG stream
differs from the XLA path's threefry (masks are impl-defined
randomness, as torch's RNG already differs from jax's — see
docs/PARITY.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# Shared by forward AND backward: the per-block PRNG seed (and thus the
# dropout mask) is a function of the q-block index, so both passes must
# block q identically. 256 keeps the backward's f32 score-sized
# intermediates + the f32 dk/dv accumulators comfortably inside VMEM.
_BLOCK_Q = 256


def _keep_mask(seed_ref, dropout_rate: float, shape):
    """Per-block Bernoulli(1-rate) keep mask from the TPU PRNG. Seeded
    with (seed, program_id): forward and backward regenerate the exact
    same mask for a block independently of grid size."""
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    bits = pltpu.prng_random_bits(shape)
    bits = pltpu.bitcast(bits, jnp.uint32)
    thresh = jnp.uint32(round((1.0 - dropout_rate) * float(2**32)) - 1)
    return bits <= thresh


def _softmax_p(q, k, scale, kv_len):
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if kv_len < k.shape[0]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, -jnp.inf)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=1, keepdims=True)   # f32 [BQ, Lk_pad]


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float,
                kv_len: int, dropout_rate: float):
    p = _softmax_p(q_ref[:], k_ref[:], scale, kv_len)
    if dropout_rate > 0.0:
        keep = _keep_mask(seed_ref, dropout_rate, p.shape)
        p = jnp.where(keep, p * (1.0 / (1.0 - dropout_rate)), 0.0)
    o = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[:],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[:] = o.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, dy_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float, kv_len: int,
                dropout_rate: float):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dk_ref[:] = jnp.zeros_like(dk_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)

    q = q_ref[:]
    dy = dy_ref[:]
    p = _softmax_p(q, k_ref[:], scale, kv_len)        # f32 [BQ, Lk]
    if dropout_rate > 0.0:
        keep = _keep_mask(seed_ref, dropout_rate, p.shape)
        inv_kp = 1.0 / (1.0 - dropout_rate)
        pd = jnp.where(keep, p * inv_kp, 0.0)
    else:
        pd = p
    pdc = pd.astype(v_ref.dtype)
    # dv += pd^T @ dy   (contraction over the q-block rows)
    dv_ref[:] += jax.lax.dot_general(pdc, dy, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    # dpd = dy @ v^T ; back through dropout; softmax VJP
    dpd = jax.lax.dot_general(dy, v_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    if dropout_rate > 0.0:
        dp = jnp.where(keep, dpd * inv_kp, 0.0)
    else:
        dp = dpd
    t = jnp.sum(dp * p, axis=1, keepdims=True)
    ds = (p * (dp - t)).astype(q.dtype)               # [BQ, Lk]
    dq_ref[:] = (jax.lax.dot_general(
        ds, k_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale).astype(dq_ref.dtype)
    dk_ref[:] += jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32) * scale


def _pad_rows(x, n):
    return jnp.pad(x, ((0, n - x.shape[0]), (0, 0))) if n != x.shape[0] else x


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _attn_train_2d(q, k, v, seed, temperature: float, dropout_rate: float):
    out, _ = _attn_train_2d_fwd(q, k, v, seed, temperature, dropout_rate)
    return out


def _specs(block_q, lk_pad, dk, dv):
    return [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # seed [1]
        pl.BlockSpec((block_q, dk), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((lk_pad, dk), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((lk_pad, dv), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]


def _attn_train_2d_fwd(q, k, v, seed, temperature, dropout_rate):
    lq, dk_ = q.shape
    lk, dv = v.shape
    block_q = _BLOCK_Q
    lq_pad = _round_up(lq, block_q)
    lk_pad = _round_up(lk, 128)
    qp = _pad_rows(q, lq_pad)
    kp = _pad_rows(k, lk_pad)
    vp = _pad_rows(v, lk_pad)
    grid = (lq_pad // block_q,)
    cost = pl.CostEstimate(
        flops=2 * lq_pad * lk_pad * (dk_ + dv),
        bytes_accessed=(lq_pad * (dk_ + dv) + lk_pad * (dk_ + dv))
                       * q.dtype.itemsize,
        transcendentals=lq_pad * lk_pad)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=1.0 / temperature, kv_len=lk,
                          dropout_rate=dropout_rate),
        grid=grid,
        in_specs=_specs(block_q, lk_pad, dk_, dv),
        out_specs=pl.BlockSpec((block_q, dv), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((lq_pad, dv), v.dtype),
        cost_estimate=cost,
    )(seed, qp, kp, vp)
    if lq_pad != lq:
        out = out[:lq]
    return out, (q, k, v, seed)


def _attn_train_2d_bwd(temperature, dropout_rate, res, dy):
    q, k, v, seed = res
    lq, dk_ = q.shape
    lk, dv = v.shape
    # backward must use the SAME block_q as forward so per-block PRNG
    # seeds (and therefore dropout masks) line up
    block_q = _BLOCK_Q
    lq_pad = _round_up(lq, block_q)
    lk_pad = _round_up(lk, 128)
    qp = _pad_rows(q, lq_pad)
    kp = _pad_rows(k, lk_pad)
    vp = _pad_rows(v, lk_pad)
    dyp = _pad_rows(dy, lq_pad)
    grid = (lq_pad // block_q,)
    cost = pl.CostEstimate(
        flops=6 * lq_pad * lk_pad * (dk_ + dv),
        bytes_accessed=(2 * lq_pad * (dk_ + dv) + 2 * lk_pad * (dk_ + dv))
                       * q.dtype.itemsize,
        transcendentals=lq_pad * lk_pad)
    dq, dk, dv_ = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=1.0 / temperature, kv_len=lk,
                          dropout_rate=dropout_rate),
        grid=grid,
        in_specs=_specs(block_q, lk_pad, dk_, dv) + [
            pl.BlockSpec((block_q, dv), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((block_q, dk_), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lk_pad, dk_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lk_pad, dv), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((lq_pad, dk_), q.dtype),
                   jax.ShapeDtypeStruct((lk_pad, dk_), jnp.float32),
                   jax.ShapeDtypeStruct((lk_pad, dv), jnp.float32)],
        cost_estimate=cost,
    )(seed, qp, kp, vp, dyp)
    return (dq[:lq], dk[:lk].astype(k.dtype), dv_[:lk].astype(v.dtype), None)


_attn_train_2d.defvjp(_attn_train_2d_fwd, _attn_train_2d_bwd)


def fused_propagation_attention_train(q: jnp.ndarray, k: jnp.ndarray,
                                      v: jnp.ndarray, *, temperature: float,
                                      dropout_rate: float = 0.0,
                                      dropout_rng=None) -> jnp.ndarray:
    """Differentiable fused propagation attention with in-kernel dropout.

    q [n, Lq, dk] x k [n, Lkv, dk] x v [n, Lkv, dv] -> [n, Lq, dv].
    ``dropout_rng`` (a jax PRNG key) seeds the hardware PRNG when
    ``dropout_rate > 0``; pass None for the deterministic path.
    """
    if dropout_rate > 0.0 and dropout_rng is None:
        raise ValueError("dropout_rate > 0 requires dropout_rng")
    n = q.shape[0]
    if dropout_rate > 0.0:
        # independent seed per batch element — under vmap each slice must
        # draw a distinct mask
        seed = jax.random.bits(dropout_rng, (n, 1), jnp.uint32).astype(jnp.int32)
    else:
        seed = jnp.zeros((n, 1), jnp.int32)
        dropout_rate = 0.0
    f = functools.partial(_attn_train_2d, temperature=temperature,
                          dropout_rate=dropout_rate)
    if n == 1:
        return f(q[0], k[0], v[0], seed[0])[None]
    # unrolled static batch, NOT jax.vmap: batching an SMEM-resident
    # operand (the seed) is unsupported by the Pallas TPU lowering
    # ("block shape ... divisible by 8 and 128 ... in memory space smem").
    # n is a small static batch; the per-call overhead is noise next to
    # the [Lq, Lkv] work inside.
    return jnp.stack([f(q[i], k[i], v[i], seed[i]) for i in range(n)])
