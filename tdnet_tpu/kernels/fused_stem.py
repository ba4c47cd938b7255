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
3x3/stride-2/pad-1 max-pool — in one VMEM pass per full-width row band
(BR pooled rows): the conv0 output band is DMA'd into VMEM once
(double-buffered across grid steps so the fetch of band i+1 overlaps
band i's compute), both convs run as per-(dy,dx)-tap MXU matmuls, and
only the POOLED [BR, Wp, 128] band is written back. The intermediate
activations never touch HBM.

Mosaic-dictated structure (v5e, learned by measurement — docs/PERF.md):
- dy (row) shifts live on the untiled leading dim, so the per-dy
  operands share flat (row, col) indexing and partial sums ADD in 2-D
  matmul form with no layout movement. dx (column) shifts are applied
  to the matmul OUTPUTS as offset column slices — elementwise-add
  relayouts handle sublane offsets cheaply, whereas concatenating
  dx-shifted INPUTS (classic im2col) fails to lower (offset-mismatched
  concat) or relayouts at ~5x the matmul cost.
- The conv0 input is lane-padded to 128 channels host-side: HBM block
  fetches need a tile-aligned minor dim. Weight rows 64..127 are zero.
- Strided slices lower to gathers (unsupported); the pool uses
  reshape-pair maxes on the leading dim and a (pcw, 2)-split reshape
  on the sublane dim.

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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# pooled-output rows per grid step (band height)
BR = 8


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fused_stem_kernel(xp_ref, w1_ref, w2_ref, sb1_ref, sb2_ref, o_ref,
                       xb, sem, *, H: int, W: int, xw: int, pcw: int,
                       nbr: int, dtype):
    """Grid (row_band i,). Full-width bands; double-buffered input DMA.

    xp_ref: ANY/HBM padded conv0 output [hp, xw, 128] (3 top / 3 left
    pad; 64 zero pad lanes).
    w1_ref: [9, 128, 64]  tap (dy*3+dx)-indexed conv1 weights (VMEM)
    w2_ref: [9, 64, 128]  same for conv2
    sb1_ref/sb2_ref: [2, 1, C] folded eval-BN (scale; bias) f32
    o_ref: pooled output band [BR, pcw, 128]
    xb: VMEM scratch [2, 2*BR+5, xw, 128] (conv0 band incl. halos,
    two DMA slots); sem: [2] DMA semaphores.
    """
    i = pl.program_id(0)
    rows1 = 2 * BR + 3            # conv1 output rows this band
    rows2 = 2 * BR + 1            # conv2 output rows this band
    rowsx = 2 * BR + 5            # conv0 rows fetched (conv1 halo)

    def fetch(band, slot):
        return pltpu.make_async_copy(
            xp_ref.at[pl.ds(band * 2 * BR, rowsx)], xb.at[slot],
            sem.at[slot])

    slot = jax.lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        fetch(0, 0).start()

    fetch(i, slot).wait()

    @pl.when(i + 1 < nbr)
    def _():
        fetch(i + 1, 1 - slot).start()

    x = xb[slot]                                       # [rowsx, xw, 128]

    # ---- conv1: 9 per-tap matmuls, dy summed flat, dx on outputs -----
    c1 = None
    for dx in range(3):
        acc = None
        for dy in range(3):
            lhs = x[dy:dy + rows1].reshape(rows1 * xw, 128)
            t = jax.lax.dot_general(
                lhs, w1_ref[dy * 3 + dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
        p = acc.reshape(rows1, xw, 64)[:, dx:dx + xw - 2]
        c1 = p if c1 is None else c1 + p
    # storage-dtype rounding between conv and BN (XLA-path dataflow)
    c1 = c1.astype(dtype).astype(jnp.float32)
    c1 = c1 * sb1_ref[0] + sb1_ref[1]
    c1 = jnp.maximum(c1.astype(dtype), 0)
    # zero rows/cols outside the valid conv1 activation (this IS
    # conv2's zero padding)
    g1r = jax.lax.broadcasted_iota(jnp.int32, (rows1, xw - 2, 1), 0) \
        + i * 2 * BR - 2
    g1c = jax.lax.broadcasted_iota(jnp.int32, (rows1, xw - 2, 1), 1) - 2
    ok1 = (g1r >= 0) & (g1r < H) & (g1c >= 0) & (g1c < W)
    c1 = jnp.where(ok1, c1, 0).astype(dtype)

    # ---- conv2 (same scheme, K=64) -----------------------------------
    c2 = None
    for dx in range(3):
        acc = None
        for dy in range(3):
            lhs = c1[dy:dy + rows2].reshape(rows2 * (xw - 2), 64)
            t = jax.lax.dot_general(
                lhs, w2_ref[dy * 3 + dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
        p = acc.reshape(rows2, xw - 2, 128)[:, dx:dx + xw - 4]
        c2 = p if c2 is None else c2 + p
    c2 = c2.astype(dtype).astype(jnp.float32)
    c2 = c2 * sb2_ref[0] + sb2_ref[1]
    c2 = jnp.maximum(c2.astype(dtype), 0)
    # pool padding: -1 outside the valid conv2 activation (values >= 0)
    g2r = jax.lax.broadcasted_iota(jnp.int32, (rows2, xw - 4, 1), 0) \
        + i * 2 * BR - 1
    g2c = jax.lax.broadcasted_iota(jnp.int32, (rows2, xw - 4, 1), 1) - 1
    ok2 = (g2r >= 0) & (g2r < H) & (g2c >= 0) & (g2c < W)
    c2 = jnp.where(ok2, c2, -1).astype(dtype)

    # ---- maxpool 3x3 / stride 2 / pad 1 ------------------------------
    # Strided slices lower to gathers (unsupported); rows (leading dim)
    # pool as pairs (2q,2q+1) and (2q+1,2q+2) via two unit-offset
    # reshapes; cols use the same pair trick on the sublane dim.
    cw = xw - 4                                         # c2 column count
    ra = jnp.max(c2[0:rows2 - 1].reshape(BR, 2, cw, 128), axis=1)
    rb = jnp.max(c2[1:rows2].reshape(BR, 2, cw, 128), axis=1)
    rm = jnp.maximum(ra, rb)                            # [BR, cw, 128]
    ca = jnp.max(rm[:, 0:2 * pcw].reshape(BR, pcw, 2, 128), axis=2)
    cb = jnp.max(rm[:, 1:2 * pcw + 1].reshape(BR, pcw, 2, 128), axis=2)
    o_ref[:] = jnp.maximum(ca, cb).astype(o_ref.dtype)


def fused_stem_tail(x: jnp.ndarray, w1: jnp.ndarray, sb1: jnp.ndarray,
                    w2: jnp.ndarray, sb2: jnp.ndarray,
                    *, interpret: bool | None = None) -> jnp.ndarray:
    """conv1+BN+ReLU -> conv2+BN+ReLU -> maxpool(3,2,1), fused.

    x: [n, H, W, 64] conv0 output AFTER its BN+ReLU (any float dtype).
    w1: [3,3,64,64] HWIO; w2: [3,3,64,128] HWIO.
    sb1/sb2: [2, C] f32 folded eval-BN (row 0 scale, row 1 bias).
    Returns [n, (H+1)//2, (W+1)//2, 128] in x.dtype.
    """
    if interpret is None:  # Mosaic lowering is TPU-only
        interpret = jax.default_backend() != "tpu"
    n, H, W, ci = x.shape
    assert ci == 64 and w1.shape == (3, 3, 64, 64) \
        and w2.shape == (3, 3, 64, 128)
    Hp, Wp = (H + 1) // 2, (W + 1) // 2            # pooled geometry
    nbr = -(-Hp // BR)
    pcw = _round_up(Wp, 8)                         # full-width col band
    xw = _round_up(2 * pcw + 5, 8)
    # pad: 3 halo rows/cols at the top/left; bottom/right up to the last
    # band's reach; lanes to the 128 tile (values there are masked
    # in-kernel, zeros are safe)
    hp = 2 * BR * (nbr - 1) + 2 * BR + 5

    # tap-indexed (dy*3+dx) weights. conv1's input is lane-padded to 128
    # channels, so its K rows 64..127 are zeros.
    w1p = jnp.pad(w1, ((0, 0), (0, 0), (0, 64), (0, 0))).reshape(9, 128, 64)
    w2p = w2.reshape(9, 64, 128)
    sb1 = sb1.astype(jnp.float32).reshape(2, 1, 64)
    sb2 = sb2.astype(jnp.float32).reshape(2, 1, 128)

    kern = functools.partial(_fused_stem_kernel, H=H, W=W, xw=xw,
                             pcw=pcw, nbr=nbr, dtype=x.dtype)

    def one(img):
        xp = jnp.pad(img, ((3, hp - H - 3), (3, xw - W - 3), (0, 64)))
        out = pl.pallas_call(
            kern,
            grid=(nbr,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((9, 128, 64), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((9, 64, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 1, 64), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 1, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BR, pcw, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nbr * BR, pcw, 128), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, 2 * BR + 5, xw, 128), x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=2 * H * W * (9 * 64 * 64 + 9 * 64 * 128),
                bytes_accessed=(hp * xw * 128 + Hp * Wp * 128)
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
    if "fscale" in bn:  # already pre-folded (ops/norm.py:fold_bn_eval)
        return jnp.stack([bn["fscale"], bn["fbias"]])
    mean = bn["mean"].astype(jnp.float32)
    var = bn["var"].astype(jnp.float32)
    s = jax.lax.rsqrt(var + eps) * bn["scale"].astype(jnp.float32)
    b = bn["bias"].astype(jnp.float32) - mean * s
    return jnp.stack([s, b])
