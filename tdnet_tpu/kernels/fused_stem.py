"""Pallas TPU kernel: fused deep-base stem tail (conv1+BN+ReLU ->
conv2+BN+ReLU -> maxpool 3/2/1).

The deep-base stem (reference Testing/model/pspnet/resnet.py:122-134:
three 3x3 convs then maxpool) is HBM-bound under XLA at streaming
geometry: the TD2-PSP50 @1025x2049 profile (docs/PERF.md) shows the
stem+maxpool family at ~4.3 ms/frame against a ~0.8 ms roofline, most
of it relayout copies and pads between the convs and the pool
(conv1 [513,1025,64] and conv2 [513,1025,128] activations round-trip
HBM, then reduce_window reads 33 MB again).

This kernel computes the whole tail — conv1 (3x3, 64->64) + folded
eval-BN + ReLU, conv2 (3x3, 64->128) + folded eval-BN + ReLU, and the
3x3/stride-2/pad-1 max-pool — in one pass per (row-block, col-tile):
the conv0 output block is DMA'd into VMEM once (with conv/pool halos),
both convs run as dx-im2col'd K=192 MXU matmuls with f32 accumulation,
and only the POOLED [8, 132, 128] block is written back. The
intermediate activations never touch HBM.

Numerics match the unfused eval path to float-sum order: the conv
accumulator is rounded to the storage dtype before the BN affine (the
XLA path materializes the conv in storage dtype), BN runs in f32, and
ReLU/max are exact. Inference only — training keeps the reference
dataflow (BN batch stats need the full activations).

Boundary semantics, all handled in-kernel by masking:
- conv1/conv2 zero-padding: computed rows/cols outside the valid
  activation are forced to 0 before feeding the next conv;
- maxpool padding: invalid conv2 rows/cols are forced to -1 before the
  max (post-ReLU activations are >= 0 and every pool window contains at
  least one valid element, so -1 never wins).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# pooled-output tile: BR rows x PC cols per kernel invocation
BR = 8
PC = 132


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fused_stem_kernel(xp_ref, w1_ref, w2_ref, sb1_ref, sb2_ref, o_ref,
                       xb, sem, *, H: int, W: int, xw: int, dtype):
    """Grid (row_block i, col_tile j).

    xp_ref: ANY/HBM padded conv0 output [Hp, Wp, 64] (3 top / 3 left
    pad so every block's halo read is in range).
    w1_ref: [3, 192, 64]   dy-indexed dx-im2col'd conv1 weights (VMEM)
    w2_ref: [3, 192, 128]  same for conv2
    sb1_ref/sb2_ref: [2, 1, C] folded eval-BN (scale; bias) f32
    o_ref: pooled output block [BR, PC, 128]
    xb: VMEM scratch [2*BR+5, xw, 64] (conv0 rows incl. halos)
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    rows1 = 2 * BR + 3            # conv1 output rows this block
    rows2 = 2 * BR + 1            # conv2 output rows this block
    rowsx = 2 * BR + 5            # conv0 rows fetched (conv1 halo)
    c1w = 2 * PC + 3              # conv1 cols consumed by conv2+pool
    c2w = 2 * PC + 1              # conv2 cols consumed by the pool

    dma = pltpu.make_async_copy(
        xp_ref.at[pl.ds(i * 2 * BR, rowsx), pl.ds(j * 2 * PC, xw)],
        xb, sem)
    dma.start()
    dma.wait()

    # ---- conv1: dx-im2col (K = 3*64) then one matmul per dy ----------
    x = xb[:]                                          # [rowsx, xw, 64]
    xcol = jnp.concatenate(
        [x[:, 0:xw - 2], x[:, 1:xw - 1], x[:, 2:xw]], axis=-1)
    acc = None
    for dy in range(3):
        lhs = xcol[dy:dy + rows1].reshape(rows1 * (xw - 2), 192)
        t = jax.lax.dot_general(lhs, w1_ref[dy], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc = t if acc is None else acc + t
    c1 = acc.reshape(rows1, xw - 2, 64)
    # storage-dtype rounding between conv and BN (XLA-path dataflow)
    c1 = c1.astype(dtype).astype(jnp.float32)
    c1 = c1 * sb1_ref[0] + sb1_ref[1]
    c1 = jnp.maximum(c1.astype(dtype), 0)
    # zero rows/cols outside the valid conv1 activation (this IS
    # conv2's zero padding)
    g1r = jax.lax.broadcasted_iota(jnp.int32, (rows1, xw - 2), 0) \
        + i * 2 * BR - 2
    g1c = jax.lax.broadcasted_iota(jnp.int32, (rows1, xw - 2), 1) \
        + j * 2 * PC - 2
    ok1 = ((g1r >= 0) & (g1r < H) & (g1c >= 0) & (g1c < W))[..., None]
    c1 = jnp.where(ok1, c1, 0).astype(dtype)

    # ---- conv2 ------------------------------------------------------
    ccol = jnp.concatenate(
        [c1[:, 0:xw - 4], c1[:, 1:xw - 3], c1[:, 2:xw - 2]], axis=-1)
    acc = None
    for dy in range(3):
        lhs = ccol[dy:dy + rows2].reshape(rows2 * (xw - 4), 192)
        t = jax.lax.dot_general(lhs, w2_ref[dy], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc = t if acc is None else acc + t
    c2 = acc.reshape(rows2, xw - 4, 128)
    c2 = c2.astype(dtype).astype(jnp.float32)
    c2 = c2 * sb2_ref[0] + sb2_ref[1]
    c2 = jnp.maximum(c2.astype(dtype), 0)
    # pool padding: -1 outside the valid conv2 activation (values >= 0)
    g2r = jax.lax.broadcasted_iota(jnp.int32, (rows2, xw - 4), 0) \
        + i * 2 * BR - 1
    g2c = jax.lax.broadcasted_iota(jnp.int32, (rows2, xw - 4), 1) \
        + j * 2 * PC - 1
    ok2 = ((g2r >= 0) & (g2r < H) & (g2c >= 0) & (g2c < W))[..., None]
    c2 = jnp.where(ok2, c2, -1).astype(dtype)

    # ---- maxpool 3x3 / stride 2 / pad 1 ------------------------------
    # rows: out q pools c2 rows 2q..2q+2 (local)
    r0 = lax.slice(c2, (0, 0, 0), (rows2 - 1, c2w, 128), (2, 1, 1))
    r1 = lax.slice(c2, (1, 0, 0), (rows2, c2w, 128), (2, 1, 1))
    r2 = lax.slice(c2, (2, 0, 0), (rows2, c2w, 128), (2, 1, 1))
    rm = jnp.maximum(jnp.maximum(r0, r1), r2)          # [BR, c2w, 128]
    # cols: out c pools rm cols 2c..2c+2
    ev = rm[:, 0:2 * PC].reshape(BR, PC, 2, 128)
    c01 = jnp.maximum(ev[:, :, 0], ev[:, :, 1])
    e2 = rm[:, 2:2 * PC + 1:2]                          # cols 2,4,..,2PC
    o_ref[:] = jnp.maximum(c01, e2).astype(o_ref.dtype)


def fused_stem_tail(x: jnp.ndarray, w1: jnp.ndarray, sb1: jnp.ndarray,
                    w2: jnp.ndarray, sb2: jnp.ndarray,
                    *, interpret: bool = False) -> jnp.ndarray:
    """conv1+BN+ReLU -> conv2+BN+ReLU -> maxpool(3,2,1), fused.

    x: [n, H, W, 64] conv0 output AFTER its BN+ReLU (any float dtype).
    w1: [3,3,64,64] HWIO; w2: [3,3,64,128] HWIO.
    sb1/sb2: [2, C] f32 folded eval-BN (row 0 scale, row 1 bias).
    Returns [n, (H+1)//2, (W+1)//2, 128] in x.dtype.
    """
    n, H, W, ci = x.shape
    assert ci == 64 and w1.shape == (3, 3, 64, 64) \
        and w2.shape == (3, 3, 64, 128)
    Hp, Wp = (H + 1) // 2, (W + 1) // 2            # pooled geometry
    nbr = -(-Hp // BR)
    nbc = -(-Wp // PC)
    xw = _round_up(2 * PC + 5, 8)
    # pad: 3 halo rows/cols at the top/left; bottom/right up to the last
    # block's reach (values there are masked in-kernel, zeros are safe)
    hp = 2 * BR * (nbr - 1) + 2 * BR + 5
    wp = _round_up(2 * PC * (nbc - 1) + xw, 8)

    w1p = jnp.transpose(w1, (0, 1, 2, 3)).reshape(3, 3 * 64, 64)
    w2p = jnp.transpose(w2, (0, 1, 2, 3)).reshape(3, 3 * 64, 128)
    # im2col lane order is (dx, cin): w[dy, dx, c, :] -> row dx*64+c  ✓
    sb1 = sb1.astype(jnp.float32).reshape(2, 1, 64)
    sb2 = sb2.astype(jnp.float32).reshape(2, 1, 128)

    kern = functools.partial(_fused_stem_kernel, H=H, W=W, xw=xw,
                             dtype=x.dtype)

    def one(img):
        xp = jnp.pad(img, ((3, hp - H - 3), (3, wp - W - 3), (0, 0)))
        out = pl.pallas_call(
            kern,
            grid=(nbr, nbc),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((3, 192, 64), lambda i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, 192, 128), lambda i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 1, 64), lambda i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 1, 128), lambda i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BR, PC, 128), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nbr * BR, nbc * PC, 128),
                                           x.dtype),
            scratch_shapes=[
                pltpu.VMEM((2 * BR + 5, xw, 64), x.dtype),
                pltpu.SemaphoreType.DMA,
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * H * W * (9 * 64 * 64 + 9 * 64 * 128),
                bytes_accessed=(hp * wp * 64 + Hp * Wp * 128)
                * x.dtype.itemsize,
                transcendentals=0,
            ),
            interpret=interpret,
        )(xp, w1p, w2p, sb1, sb2)
        return out[:Hp, :Wp]

    return jax.vmap(one)(x) if n > 1 else one(x[0])[None]


def fold_bn_eval(bn: dict, eps: float = 1e-5) -> jnp.ndarray:
    """Eval-mode BN as a [2, C] f32 (scale; bias) pair:
    y = x * s + b with s = scale*rsqrt(var+eps), b = bias - mean*s —
    exactly ops/norm.py:batch_norm eval arithmetic."""
    mean = bn["mean"].astype(jnp.float32)
    var = bn["var"].astype(jnp.float32)
    s = jax.lax.rsqrt(var + eps) * bn["scale"].astype(jnp.float32)
    b = bn["bias"].astype(jnp.float32) - mean * s
    return jnp.stack([s, b])
