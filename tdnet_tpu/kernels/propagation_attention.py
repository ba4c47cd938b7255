"""Pallas TPU kernel: fused attention propagation.

The streaming hot path (SURVEY.md 2.1): the current frame's full-res
queries attend over a cached frame's subsampled K/V —
q [n, Lq, 64] x k [n, Lkv, 64] x v [n, Lkv, d_v], with Lq ~ 18k-33k and
Lkv ~ 1.2k-2.2k. XLA materializes the [Lq, Lkv] f32 attention matrix in
HBM (285 MB at 1025x2049); this kernel keeps K and V resident in VMEM,
streams q in row blocks, and fuses QK^T -> scale -> softmax -> PV (f32
accumulation) in one pass — the attention matrix never leaves VMEM.
Optionally fuses the per-token output projection (the reference
Attention.fc 1x1 conv, transformer.py:82-91).

Inference-path only (attention dropout falls back to the XLA impl).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int):
    q = q_ref[:]                     # [BQ, dk]
    k = k_ref[:]                     # [Lk_pad, dk]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale   # [BQ, Lk_pad]
    if kv_len < k.shape[0]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, -jnp.inf)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=1, keepdims=True)
    p = (p / denom).astype(v_ref.dtype)              # [BQ, Lk_pad]
    o = jax.lax.dot_general(
        p, v_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # [BQ, dv]
    o_ref[:] = o.astype(o_ref.dtype)


def _attn_fc_kernel(q_ref, k_ref, v_ref, wfc_ref, bfc_ref, o_ref, *,
                    scale: float, kv_len: int):
    """Attention + the per-token output projection (reference
    Attention.fc, transformer.py:82-91) fused: the [BQ, dv] PV block is
    multiplied by the VMEM-resident [dv, dv] fc weight before it ever
    leaves the core — one fewer HBM round trip of the [Lq, dv] field
    per hop."""
    q = q_ref[:]
    k = k_ref[:]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    if kv_len < k.shape[0]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, -jnp.inf)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=1, keepdims=True)
    p = (p / denom).astype(v_ref.dtype)
    o = jax.lax.dot_general(
        p, v_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o = jax.lax.dot_general(
        o.astype(v_ref.dtype), wfc_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bfc_ref[:].astype(jnp.float32)
    o_ref[:] = o.astype(o_ref.dtype)


def default_block_q(lq: int, lkv: int) -> int:
    """Per-shape q-row block. 256 measured fastest on v5e at the
    33k x 2.1k TD2 hot shape (1.61 ms vs 1.71 @512, 1.76 @1024); the
    18.7k x 1.2k TD4 shape prefers larger blocks (fewer grid steps,
    scores block still well under the VMEM scoped limit)."""
    return 512 if lkv <= 1536 else 256


def _fused_attention_2d(q, k, v, fc, *, temperature: float,
                        block_q: int | None):
    lq, dk = q.shape
    lk, dv = v.shape
    if block_q is None:
        block_q = default_block_q(lq, lk)
    lq_pad = _round_up(lq, block_q)
    lk_pad = _round_up(lk, 128)
    if lq_pad != lq:
        q = jnp.pad(q, ((0, lq_pad - lq), (0, 0)))
    if lk_pad != lk:
        k = jnp.pad(k, ((0, lk_pad - lk), (0, 0)))
        v = jnp.pad(v, ((0, lk_pad - lk), (0, 0)))

    grid = (lq_pad // block_q,)
    kv_specs = [
        pl.BlockSpec((block_q, dk), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((lk_pad, dk), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((lk_pad, dv), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    cost = pl.CostEstimate(
        flops=2 * lq_pad * lk_pad * (dk + dv)
              + (2 * lq_pad * dv * dv if fc is not None else 0),
        bytes_accessed=(lq_pad * dk + lk_pad * (dk + dv)
                        + lq_pad * dv) * q.dtype.itemsize,
        transcendentals=lq_pad * lk_pad,
    )
    if fc is None:
        out = pl.pallas_call(
            functools.partial(_attn_kernel, scale=1.0 / temperature,
                              kv_len=lk),
            grid=grid, in_specs=kv_specs,
            out_specs=pl.BlockSpec((block_q, dv), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((lq_pad, dv), v.dtype),
            cost_estimate=cost,
        )(q, k, v)
    else:
        wfc, bfc = fc
        out = pl.pallas_call(
            functools.partial(_attn_fc_kernel, scale=1.0 / temperature,
                              kv_len=lk),
            grid=grid,
            in_specs=kv_specs + [
                pl.BlockSpec((dv, dv), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, dv), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_q, dv), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((lq_pad, dv), v.dtype),
            cost_estimate=cost,
        )(q, k, v, wfc, bfc.reshape(1, dv))
    return out[:lq] if lq_pad != lq else out


def fused_propagation_attention(q: jnp.ndarray, k: jnp.ndarray,
                                v: jnp.ndarray, *, temperature: float,
                                block_q: int | None = None,
                                fc_w: jnp.ndarray | None = None,
                                fc_b: jnp.ndarray | None = None) -> jnp.ndarray:
    """softmax(q k^T / temperature) v [@ fc_w + fc_b], batched over axis 0.

    q [n, Lq, dk], k [n, Lkv, dk], v [n, Lkv, dv] -> [n, Lq, dv].
    ``fc_w`` [dv, dv] / ``fc_b`` [dv] additionally fuse the reference's
    per-token output projection (Attention.fc) into the kernel.
    """
    fc = None if fc_w is None else (fc_w, fc_b)
    f = functools.partial(_fused_attention_2d, fc=fc,
                          temperature=temperature, block_q=block_q)
    if q.shape[0] == 1:
        return f(q[0], k[0], v[0])[None]
    return jax.vmap(f)(q, k, v)
