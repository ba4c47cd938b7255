"""Pooling primitives with exact PyTorch semantics.

- ``adaptive_avg_pool``: ``nn.AdaptiveAvgPool2d(s)`` for the PSP pyramid
  branches {1,2,3,6} (reference: Testing/model/pspnet/td4_psp18.py:250-253).
  Torch bins are uneven integer partitions: bin i spans
  [floor(i*H/s), ceil((i+1)*H/s)). Since s <= 6, we unroll the (at most 36)
  static slices — every slice is compile-time static, XLA fuses the means.
- ``grid_subsample``: ``nn.MaxPool2d(kernel_size=1, stride=s)`` — plain
  grid subsampling of the K/V token field (reference:
  Testing/model/pspnet/transformer.py:26 stride 4;
  Training/.../td4_psp/transformer.py:26 stride 3).
- ``max_pool``: the ResNet stem ``MaxPool2d(3, 2, padding=1)``
  (reference: Testing/model/pspnet/resnet.py:137).

All ops take NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def adaptive_avg_pool(x: jnp.ndarray, out_size: int | tuple[int, int]) -> jnp.ndarray:
    """Exact torch AdaptiveAvgPool2d over NHWC input."""
    if isinstance(out_size, int):
        oh = ow = out_size
    else:
        oh, ow = out_size
    n, h, w, c = x.shape

    def bounds(inp, out):
        starts = [int(np.floor(i * inp / out)) for i in range(out)]
        ends = [int(np.ceil((i + 1) * inp / out)) for i in range(out)]
        return starts, ends

    hs, he = bounds(h, oh)
    ws, we = bounds(w, ow)
    rows = []
    for i in range(oh):
        cols = []
        for j in range(ow):
            cell = x[:, hs[i]:he[i], ws[j]:we[j], :]
            cols.append(jnp.mean(cell, axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # [n, oh, ow, c]


def _sum_matrix(inp: int, out: int, dtype):
    """[out, inp] 0/1 cell-membership matrix of torch adaptive-pool
    cells, plus the per-cell element counts [out]."""
    m = np.zeros((out, inp), np.float32)
    counts = np.zeros((out,), np.float32)
    for i in range(out):
        s = int(np.floor(i * inp / out))
        e = int(np.ceil((i + 1) * inp / out))
        m[i, s:e] = 1.0
        counts[i] = e - s
    return jnp.asarray(m, dtype), counts


def adaptive_avg_pool_multi(x: jnp.ndarray, sizes: tuple[int, ...]):
    """All PSP pyramid pools in ONE pass over ``x`` (inference fast path).

    ``adaptive_avg_pool`` reads the full input once per bin size (4x for
    the {1,2,3,6} pyramid — ~540 MB of HBM traffic on the TD2 c4 grid).
    Here the per-bin H-summing matrices are stacked into one [sum(b), H]
    contraction (a single read of ``x``), then each bin's W contraction
    runs on the tiny [b, W, C] intermediate. Same cell semantics as
    torch AdaptiveAvgPool2d, exact to float-sum order: the matrices are
    0/1 (sums, no weight rounding) and each cell is divided once by its
    exact integer-valued count, like sum-then-divide.
    Returns a list of [n, s, s, c] arrays in ``sizes`` order.
    """
    n, h, w, c = x.shape
    bf16 = x.dtype == jnp.bfloat16
    prec = None if bf16 else jax.lax.Precision.HIGHEST
    cdt = x.dtype if bf16 else jnp.float32
    hmats = [_sum_matrix(h, s, cdt) for s in sizes]
    rh = jnp.concatenate([m for m, _ in hmats])
    y = jnp.einsum("bh,nhwc->nbwc", rh, x.astype(cdt), precision=prec)
    outs = []
    off = 0
    for (_, ch), s in zip(hmats, sizes):
        rw, cw = _sum_matrix(w, s, cdt)
        t = jnp.einsum("ow,nbwc->nboc", rw, y[:, off:off + s],
                       precision=prec)
        denom = jnp.asarray(ch[:, None] * cw[None, :], jnp.float32)
        t = t.astype(jnp.float32) / denom[None, :, :, None]
        outs.append(t.astype(x.dtype))
        off += s
    return outs


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(x, axis=(1, 2), keepdims=True)


def grid_subsample(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """MaxPool2d(kernel_size=1, stride=s): keep every s-th pixel (NHWC)."""
    if stride == 1:
        return x
    return x[:, ::stride, ::stride, :]


def _max_pool_native(x: jnp.ndarray, window: int, stride: int,
                     padding: int) -> jnp.ndarray:
    # -inf (not finfo.min) as init: JAX's reduce_window max VJP rule
    # requires the identity element to be recognized for differentiation.
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return jax.lax.reduce_window(
        x, neg, jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def _phases2(xp: jnp.ndarray):
    """Split NHWC into the 4 (h%2, w%2) phase grids via one reshape-
    transpose relayout. H/W of ``xp`` must be even."""
    n, h, w, c = xp.shape
    t = xp.reshape(n, h // 2, 2, w // 2, 2, c).transpose(2, 4, 0, 1, 3, 5)
    return [[t[0, 0], t[0, 1]], [t[1, 0], t[1, 1]]]


@jax.custom_vjp
def _max_pool_321(x: jnp.ndarray) -> jnp.ndarray:
    return _max_pool_native(x, 3, 2, 1)


def _mp321_fwd(x):
    return _max_pool_native(x, 3, 2, 1), x


def _mp321_bwd(x, dy):
    """Gather-form first-max backward for MaxPool2d(3, 2, 1).

    XLA's select-and-scatter VJP ran at ~40 GB/s on the stem shape
    (2.1 ms + a 1 ms layout copy per path on v5e; 12.6 ms of the bf16
    TD4 train step), and a strided scatter-add rewrite measured worse
    (202 -> 245 ms/step): TPU strided writes relayout. This version has
    NO scatter and NO strided slice in the hot path: one space-to-depth
    relayout of x and of the dx accumulation, with every window tap a
    DENSE slice of a phase grid. Gradient routing matches torch (and
    XLA select-and-scatter): the FIRST maximum in row-major window
    order receives the gradient.
    """
    n, H, W, C = x.shape
    Ho = (H + 2 - 3) // 2 + 1
    Wo = (W + 2 - 3) // 2 + 1
    neg = jnp.array(-jnp.inf, x.dtype)
    # padded coords: window (oh, ow) covers rows 2oh..2oh+2, cols 2ow..2ow+2
    hp = 2 * Ho + 2                      # even, >= 2(Ho-1)+3
    wp = 2 * Wo + 2
    xp = jnp.pad(x, ((0, 0), (1, hp - H - 1), (1, wp - W - 1), (0, 0)),
                 constant_values=neg)
    ph = _phases2(xp)                    # [hp/2, wp/2] each

    def tap(kh, kw):
        src = ph[kh % 2][kw % 2]
        return lax.slice(src, (0, kh // 2, kw // 2, 0),
                         (n, kh // 2 + Ho, kw // 2 + Wo, C))

    # first-max index over the 9 taps, row-major (torch tie order)
    best = tap(0, 0)
    bidx = jnp.zeros(best.shape, jnp.int32)
    k = 0
    taps = [(0, 0)]
    for kh in range(3):
        for kw in range(3):
            if (kh, kw) == (0, 0):
                continue
            k += 1
            t = tap(kh, kw)
            better = t > best
            best = jnp.where(better, t, best)
            bidx = jnp.where(better, k, bidx)
            taps.append((kh, kw))

    # per-phase accumulation via fusable pads + adds (dynamic-update-slice
    # accumulators measured ~6 ms/step across the 4 stem pools; pad+add
    # fuses into one elementwise pass per phase)
    acc: dict = {}
    for k, (kh, kw) in enumerate(taps):
        contrib = jnp.where(bidx == k, dy, jnp.zeros_like(dy))
        padded = jnp.pad(contrib, ((0, 0), (kh // 2, 1 - kh // 2),
                                   (kw // 2, 1 - kw // 2), (0, 0)))
        key = (kh % 2, kw % 2)
        acc[key] = padded if key not in acc else acc[key] + padded
    phases = [[acc[(0, 0)], acc[(0, 1)]], [acc[(1, 0)], acc[(1, 1)]]]
    # depth-to-space: interleave the 4 phase accumulators
    st = jnp.stack([jnp.stack(row) for row in phases])  # [2,2,n,Ho+1,Wo+1,C]
    dxp = st.transpose(2, 3, 0, 4, 1, 5).reshape(n, 2 * Ho + 2, 2 * Wo + 2, C)
    dx = lax.slice(dxp, (0, 1, 1, 0), (n, 1 + H, 1 + W, C))
    return (dx,)


_max_pool_321.defvjp(_mp321_fwd, _mp321_bwd)


def max_pool(x: jnp.ndarray, window: int = 3, stride: int = 2,
             padding: int = 1) -> jnp.ndarray:
    """torch MaxPool2d(window, stride, padding) over NHWC.

    The (3, 2, 1) stem pool carries a custom gather-form backward (see
    ``_mp321_bwd``); other geometries keep the native select-and-scatter
    VJP.
    """
    if (window, stride, padding) == (3, 2, 1):
        return _max_pool_321(x)
    return _max_pool_native(x, window, stride, padding)
