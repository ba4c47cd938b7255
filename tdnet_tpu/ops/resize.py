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


def _upsample_axis_phased(x: jnp.ndarray, axis: int, k: int) -> jnp.ndarray:
    """Exact align-corners k-x upsample along ``axis`` (f32 math).

    With (out-1) = k*(in-1) the interpolation matrix has exactly two
    nonzeros per row with k repeating weight phases: out[k*i + r] =
    (1 - r/k)*in[i] + (r/k)*in[i+1]. Computing it as 2-tap mul-adds
    (VPU, bandwidth-bound) instead of a dense [out, in] matmul skips
    the in-2 zero products per output — bit-identical to the HIGHEST-
    precision matmul since adding exact zeros never changes an f32 sum.
    """
    size = x.shape[axis]
    sl = lambda s, e: tuple(slice(None) if d != axis else slice(s, e)
                            for d in range(x.ndim))
    a = x[sl(0, size - 1)]
    b = x[sl(1, size)]
    # phase weights r/k are exactly representable for the k <= 256 that
    # occur here, in bf16 too; bf16 inputs stay bf16 (bandwidth-bound)
    w1 = (jnp.arange(k, dtype=jnp.float32) / k).astype(x.dtype)
    shape = [1] * (x.ndim + 1)
    shape[axis + 1] = k
    w1 = w1.reshape(shape)
    a = jnp.expand_dims(a, axis + 1)
    b = jnp.expand_dims(b, axis + 1)
    y = a * (1 - w1) + b * w1                        # [..., in-1, k, ...]
    new_shape = list(x.shape)
    new_shape[axis] = (size - 1) * k
    y = y.reshape(new_shape)
    return jnp.concatenate([y, x[sl(size - 1, size)]], axis=axis)


def resize_bilinear(x: jnp.ndarray, out_hw: tuple[int, int],
                    align_corners: bool = True,
                    precision: str | None = None) -> jnp.ndarray:
    """Bilinear resize of NHWC ``x`` to spatial size ``out_hw``.

    Matches ``torch.nn.functional.interpolate(x, out_hw, mode='bilinear',
    align_corners=align_corners)`` bit-for-bit up to float associativity.

    Integer-ratio align-corners upsamples (the reference's stride-8
    output geometries: 129x257 -> 1025x2049 etc.) take an exact 2-tap
    phase-decomposed path (see _upsample_axis_phased). Everything else
    is the dense-matmul path. Precision there: f32 inputs always use
    HIGHEST (TPU matmuls default to bf16 passes, which makes a convex
    combination overshoot its inputs — torch parity needs full-f32
    interpolation weights). bf16 inputs default to the fast
    native-precision path: the data has 8 mantissa bits anyway, and the
    big full-resolution logit upsamples are bandwidth-bound. Pass
    ``precision='highest'`` to force exactness for bf16 too.
    """
    n, h, w, c = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    dt = x.dtype
    if (align_corners and h > 1 and w > 1 and oh > h and ow > w
            and (oh - 1) % (h - 1) == 0 and (ow - 1) % (w - 1) == 0
            and (dt != jnp.bfloat16 or precision == "highest")):
        # f32 exactness cases only: the 2-tap path beats the HIGHEST-
        # precision dense matmul (f32 MXU passes) and is bit-identical
        # to it. bf16 measured marginally faster on the dense bf16
        # matmul (v5e, 129x257x19 -> 1025x2049), so it stays below.
        y = x.astype(jnp.float32)
        y = _upsample_axis_phased(y, 1, (oh - 1) // (h - 1))
        y = _upsample_axis_phased(y, 2, (ow - 1) // (w - 1))
        return y.astype(dt)
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
