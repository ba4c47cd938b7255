"""Bilinear / nearest resize with PyTorch ``align_corners=True`` semantics.

Every upsample in the reference nets uses
``F.interpolate(mode='bilinear', align_corners=True)`` (reference:
Testing/model/pspnet/td4_psp18.py:27, Training/.../td4_psp.py:14).
``jax.image.resize`` implements the half-pixel (align_corners=False)
convention, so we build the interpolation explicitly.

TPU-first design: separable bilinear interpolation is expressed as two
dense matmuls ``y = A_h @ x @ A_w^T`` which map straight onto the MXU and
fuse with surrounding ops, instead of gather-based sampling which maps
poorly onto the VPU. The interpolation matrices are compile-time
constants for static shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _interp_matrix_np(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense [out_size, in_size] 1-D linear interpolation matrix."""
    if in_size == 1:
        return np.ones((out_size, 1), dtype=np.float64)
    if align_corners:
        if out_size == 1:
            src = np.zeros((1,), dtype=np.float64)
        else:
            src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
        src = np.clip(src, 0.0, in_size - 1)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.clip(i0, 0, in_size - 2)
    w1 = src - i0
    w0 = 1.0 - w1
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.arange(out_size)
    mat[rows, i0] += w0
    mat[rows, i0 + 1] += w1
    return mat


def interp_matrix(in_size: int, out_size: int, align_corners: bool = True,
                  dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray(_interp_matrix_np(in_size, out_size, align_corners), dtype=dtype)


def resize_bilinear(x: jnp.ndarray, out_hw: tuple[int, int],
                    align_corners: bool = True,
                    precision: str | None = None) -> jnp.ndarray:
    """Bilinear resize of NHWC ``x`` to spatial size ``out_hw``.

    Matches ``torch.nn.functional.interpolate(x, out_hw, mode='bilinear',
    align_corners=align_corners)`` bit-for-bit up to float associativity.

    Precision: f32 inputs always use HIGHEST (TPU matmuls default to bf16
    passes, which makes a convex combination overshoot its inputs — torch
    parity needs full-f32 interpolation weights). bf16 inputs default to
    the fast native-precision path: the data has 8 mantissa bits anyway,
    and the big full-resolution logit upsamples are bandwidth-bound.
    Pass ``precision='highest'`` to force exactness for bf16 too.
    """
    n, h, w, c = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    dt = x.dtype
    if precision is None:
        precision = "fast" if dt == jnp.bfloat16 else "highest"
    if precision == "highest":
        prec = jax.lax.Precision.HIGHEST
        cdt = jnp.float32
    else:
        prec = jax.lax.Precision.DEFAULT
        cdt = dt
    ah = interp_matrix(h, oh, align_corners, dtype=cdt)
    aw = interp_matrix(w, ow, align_corners, dtype=cdt)
    y = x.astype(cdt)
    # [oh,h] x [n,h,w,c] -> [n,oh,w,c] ; then [ow,w] contraction on axis 2.
    y = jnp.einsum("Oh,nhwc->nOwc", ah, y, precision=prec)
    y = jnp.einsum("Ow,nhwc->nhOc", aw, y, precision=prec)
    return y.astype(dt)


def resize_nearest(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbour resize of NHWC/NHW ``x`` (torch 'nearest' convention)."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[..., None]
    n, h, w, c = x.shape
    oh, ow = out_hw
    ih = (np.arange(oh) * h // oh).astype(np.int32)
    iw = (np.arange(ow) * w // ow).astype(np.int32)
    y = x[:, jnp.asarray(ih)][:, :, jnp.asarray(iw)]
    return y[..., 0] if squeeze else y
