"""Pyramid pooling (full and grouped) and the PSP head.

Grouped variant (reference: Testing/model/pspnet/td4_psp18.py:243-284):
4 adaptive-avg-pool branches {1,2,3,6} -> 1x1 conv to C/4 -> BN+ReLU ->
align-corners bilinear upsample; then slice channel group ``pid`` out of
the identity path (C/path_num wide) and out of each pyramid branch
(C/(4*path_num) wide) and concatenate -> 2*C/path_num channels.

Full variant (reference: Testing/model/pspnet/pspnet.py:118-153): no
slicing, concat (x, f1..f4) -> 2C, used by the PSPNet-101 baseline head.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tdnet_tpu.nn.module import Ctx
from tdnet_tpu.ops import (adaptive_avg_pool_multi, conv2d, init_batch_norm,
                           init_conv_kaiming, resize_bilinear)

_BINS = (1, 2, 3, 6)


def init_pyramid_pooling(key, in_channels: int, dtype=jnp.float32) -> dict:
    out_channels = in_channels // 4
    keys = jax.random.split(key, 4)
    p = {}
    for i in range(4):
        p[f"conv{i + 1}"] = {
            "conv": init_conv_kaiming(keys[i], 1, 1, in_channels, out_channels,
                                      dtype=dtype),
            "bn": init_batch_norm(out_channels, dtype),
        }
    return p


def apply_pyramid_pooling(params: dict, x: jnp.ndarray, ctx: Ctx, *,
                          path_num: int | None = None, pid: int | None = None):
    """Returns (z, updated_params). Grouped when path_num/pid given."""
    n, h, w, c = x.shape
    np_ = dict(params)

    def chan_slice(t, start, size):
        if isinstance(start, int):
            return t[..., start:start + size]
        return jax.lax.dynamic_slice_in_dim(t, start, size, axis=3)

    g = gq = None
    if path_num is not None:
        g, gq = c // path_num, c // (path_num * 4)

    # all four pyramid pools in ONE pass over x (ops/pool.py:64) — the
    # per-bin cell-mean form read x 4x forward and scattered 4 backward
    # passes; the matmul form's VJP is two small einsum transposes
    pools = adaptive_avg_pool_multi(x, _BINS)
    feats = []
    for i, bins in enumerate(_BINS):
        br = dict(params[f"conv{i + 1}"])
        f = pools[i]
        f = conv2d(f, br["conv"]["w"])
        f, br["bn"] = ctx.bn(f, br["bn"], activation="relu")
        if path_num is not None:
            # channel-slice BEFORE the upsample: slicing commutes exactly
            # with bilinear interpolation, and the grouped nets keep only
            # C/(4*path_num) of the branch's C/4 channels (reference
            # slices after, td4_psp18.py:279-282 — same numbers, half the
            # upsample work and memory)
            f = chan_slice(f, pid * gq, gq)
        f = resize_bilinear(f, (h, w))
        np_[f"conv{i + 1}"] = br
        feats.append(f)

    if path_num is not None:
        x = chan_slice(x, pid * g, g)
    return jnp.concatenate([x] + feats, axis=-1), np_


def apply_pyramid_pooling_groups(params: dict, x: jnp.ndarray, ctx: Ctx,
                                 path_num: int):
    """All ``path_num`` grouped PSP outputs with the branch work SHARED.

    The grouped teacher (reference pspnet_4p.py:95-102) evaluates the
    same pyramid-pooling module once per group — pools, 1x1 convs, BN
    and upsamples are identical across groups (shared params; only the
    channel slices differ), so computing them per group did 4x the work.
    Here each branch runs once at full width and the per-group z is
    assembled by slicing. Returns (list of z per group, updated_params).
    """
    n, h, w, c = x.shape
    np_ = dict(params)
    g, gq = c // path_num, c // (path_num * 4)
    pools = adaptive_avg_pool_multi(x, _BINS)
    feats = []
    for i in range(4):
        br = dict(params[f"conv{i + 1}"])
        f = conv2d(pools[i], br["conv"]["w"])
        f, br["bn"] = ctx.bn(f, br["bn"], activation="relu")
        f = resize_bilinear(f, (h, w))
        np_[f"conv{i + 1}"] = br
        feats.append(f)
    zs = [jnp.concatenate(
        [x[..., p * g:(p + 1) * g]]
        + [f[..., p * gq:(p + 1) * gq] for f in feats], axis=-1)
        for p in range(path_num)]
    return zs, np_


def init_psp_head(key, in_channels: int, nclass: int, dtype=jnp.float32) -> dict:
    """PSPNet baseline head (reference: Testing/model/pspnet/pspnet.py:102-115):
    full pyramid -> 3x3 conv 2C->C/4 -> BN+ReLU -> Dropout2d(0.1) -> 1x1 conv."""
    inter = in_channels // 4
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "psp": init_pyramid_pooling(k1, in_channels, dtype),
        "conv": {"conv": init_conv_kaiming(k2, 3, 3, in_channels * 2, inter, dtype=dtype),
                 "bn": init_batch_norm(inter, dtype)},
        "out": init_conv_kaiming(k3, 1, 1, inter, nclass, bias=True, dtype=dtype),
    }


def apply_psp_head(params: dict, x: jnp.ndarray, ctx: Ctx):
    np_ = dict(params)
    z, np_["psp"] = apply_pyramid_pooling(params["psp"], x, ctx)
    cv = dict(params["conv"])
    z = conv2d(z, cv["conv"]["w"], padding=1)
    z, cv["bn"] = ctx.bn(z, cv["bn"], activation="relu")
    np_["conv"] = cv
    z = ctx.dropout2d(z, 0.1)
    z = conv2d(z, params["out"]["w"], params["out"]["b"])
    return z, np_
