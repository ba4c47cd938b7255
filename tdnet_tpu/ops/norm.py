"""Normalization layers (functional, NHWC).

- ``batch_norm``: torch ``BatchNorm2d`` semantics (eps 1e-5, momentum 0.1,
  unbiased running var) with the reference's optional fused leaky-ReLU
  activation (reference: Testing/model/pspnet/td4_psp18.py:11-24).
  SyncBatchNorm (reference: Training/ptsemseg/models/__init__.py:26-28,
  torch-encoding CUDA/NCCL) is obtained for free on TPU: under ``jit``
  with the batch axis sharded over the mesh, the GSPMD partitioner turns
  the batch-moment reductions into ICI all-reduces. Under ``shard_map``
  pass ``axis_name`` to reduce explicitly.
- ``layer_norm_2d``: torch ``nn.LayerNorm([H, W])`` over the spatial
  plane of each (n, c) slice, with learned per-pixel affine (reference:
  Testing/model/pspnet/td4_psp18.py:306-312 — shape-locked to the
  configured input resolution, which we reproduce but derive from config).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_batch_norm(c: int, dtype=jnp.float32):
    return {
        "scale": jnp.ones((c,), dtype),
        "bias": jnp.zeros((c,), dtype),
        "mean": jnp.zeros((c,), dtype),
        "var": jnp.ones((c,), dtype),
    }


def batch_norm(x: jnp.ndarray, params: dict, *, train: bool = False,
               eps: float = 1e-5, momentum: float = 0.1,
               activation: str | None = None, axis_name: str | None = None):
    """NHWC batch norm. Returns ``y`` in eval mode, ``(y, new_stats)`` in train.

    ``new_stats`` is a dict with updated ``mean``/``var`` running buffers
    (unbiased variance, matching torch).
    """
    cdt = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(cdt)
    if train:
        mean = jnp.mean(xf, axis=(0, 1, 2))
        mean_sq = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
        if axis_name is not None:
            mean = jax.lax.pmean(mean, axis_name)
            mean_sq = jax.lax.pmean(mean_sq, axis_name)
        var = mean_sq - jnp.square(mean)
        n = x.shape[0] * x.shape[1] * x.shape[2]
        if axis_name is not None:
            n = n * jax.lax.psum(1, axis_name)
        unbiased = var * (n / max(n - 1, 1))
        new_stats = {
            "mean": (1 - momentum) * params["mean"] + momentum * mean.astype(params["mean"].dtype),
            "var": (1 - momentum) * params["var"] + momentum * unbiased.astype(params["var"].dtype),
        }
    else:
        mean = params["mean"].astype(cdt)
        var = params["var"].astype(cdt)

    inv = jax.lax.rsqrt(var + eps) * params["scale"].astype(cdt)
    y = (xf - mean) * inv + params["bias"].astype(cdt)
    y = y.astype(x.dtype)
    if activation == "leaky_relu":
        y = jax.nn.leaky_relu(y, negative_slope=0.01)
    elif activation == "relu":
        y = jax.nn.relu(y)
    elif activation is not None:
        raise ValueError(f"unknown activation {activation}")
    if train:
        return y, new_stats
    return y


def init_layer_norm_2d(h: int, w: int, dtype=jnp.float32):
    return {"scale": jnp.ones((h, w), dtype), "bias": jnp.zeros((h, w), dtype)}


def layer_norm_2d(x: jnp.ndarray, params: dict, eps: float = 1e-5) -> jnp.ndarray:
    """torch nn.LayerNorm([H, W]) applied to NHWC input.

    Normalizes each (n, c) spatial plane over H*W then applies the learned
    per-pixel [H, W] affine (broadcast over channels).
    """
    cdt = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(cdt)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(cdt)[None, :, :, None] + params["bias"].astype(cdt)[None, :, :, None]
    return y.astype(x.dtype)
