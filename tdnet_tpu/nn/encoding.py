"""QKV encoding and the cross-frame attention-propagation module.

Encoding (reference: Testing/model/pspnet/transformer.py:9-56):
- ``w_qs`` / ``w_ks``: 1x1 conv(+bias) -> BN with fused leaky-ReLU ->
  1x1 conv(+bias) to d_k=64
- ``w_vs``: single 1x1 conv(+bias) to d_v
- cached frames are spatially subsampled (MaxPool2d(1, stride)) either
  BEFORE the projections (td4 + all streaming models, stride 4 at test /
  3 at train: Testing transformer.py:26, Training td4_psp/transformer.py:26)
  or AFTER them (td2 training, stride 3: Training
  td2_psp/transformer.py:26-44) — configured via ``pool_before_proj``.

Attention (reference: transformer.py:60-92): scaled-dot-product
attention over tokens + per-token 1x1 fc conv with dropout; the final
hop reshapes tokens back to the NHWC feature map.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from tdnet_tpu.nn.module import Ctx
from tdnet_tpu.ops import (conv2d, grid_subsample, init_batch_norm,
                           init_conv_kaiming, scaled_dot_attention)


def _init_proj2(key, d_model, d_k, dtype):
    """ConvBNReLU(d_model->d_k, leaky) + Conv(d_k->d_k), both with bias."""
    k1, k2 = jax.random.split(key)
    return {
        "conv0": init_conv_kaiming(k1, 1, 1, d_model, d_k, bias=True, dtype=dtype),
        "bn0": init_batch_norm(d_k, dtype),
        "conv1": init_conv_kaiming(k2, 1, 1, d_k, d_k, bias=True, dtype=dtype),
    }


def init_encoding(key, d_model: int, d_k: int, d_v: int, dtype=jnp.float32) -> dict:
    kq, kk, kv = jax.random.split(key, 3)
    return {
        "w_qs": _init_proj2(kq, d_model, d_k, dtype),
        "w_ks": _init_proj2(kk, d_model, d_k, dtype),
        "w_vs": init_conv_kaiming(kv, 1, 1, d_model, d_v, bias=True, dtype=dtype),
    }


def _apply_proj2(p, x, ctx: Ctx):
    np_ = dict(p)
    y = conv2d(x, p["conv0"]["w"], p["conv0"]["b"])
    y, np_["bn0"] = ctx.bn(y, p["bn0"], activation="leaky_relu")
    y = conv2d(y, p["conv1"]["w"], p["conv1"]["b"])
    return y, np_


def _tokens(x: jnp.ndarray) -> jnp.ndarray:
    n, h, w, c = x.shape
    return x.reshape(n, h * w, c)


def apply_encoding_full(params: dict, fea: jnp.ndarray, ctx: Ctx):
    """Current-frame encoding (pre=False): full-res q tokens + v feature map.

    Returns (q [n, H*W, d_k], v [n, H, W, d_v], updated_params).
    """
    np_ = dict(params)
    q, np_["w_qs"] = _apply_proj2(params["w_qs"], fea, ctx)
    v = conv2d(fea, params["w_vs"]["w"], params["w_vs"]["b"])
    return _tokens(q), v, np_


def apply_encoding_cached(params: dict, fea: jnp.ndarray, ctx: Ctx, *,
                          kv_stride: int, pool_before_proj: bool = True):
    """Cached-frame encoding (pre=True): subsampled q/k/v token fields.

    Returns (q, k, v, updated_params), each [n, L', d].
    """
    np_ = dict(params)
    if pool_before_proj:
        fea = grid_subsample(fea, kv_stride)
        k, np_["w_ks"] = _apply_proj2(params["w_ks"], fea, ctx)
        v = conv2d(fea, params["w_vs"]["w"], params["w_vs"]["b"])
        q, np_["w_qs"] = _apply_proj2(params["w_qs"], fea, ctx)
        return _tokens(q), _tokens(k), _tokens(v), np_
    k, np_["w_ks"] = _apply_proj2(params["w_ks"], fea, ctx)
    v = conv2d(fea, params["w_vs"]["w"], params["w_vs"]["b"])
    q, np_["w_qs"] = _apply_proj2(params["w_qs"], fea, ctx)
    k = grid_subsample(k, kv_stride)
    v = grid_subsample(v, kv_stride)
    q = grid_subsample(q, kv_stride)
    return _tokens(q), _tokens(k), _tokens(v), np_


def init_attention(key, d_v: int, dtype=jnp.float32) -> dict:
    return {"fc": init_conv_kaiming(key, 1, 1, d_v, d_v, bias=True, dtype=dtype)}


def apply_attention(params: dict, k_src: jnp.ndarray, v_src: jnp.ndarray,
                    q_tgr: jnp.ndarray, ctx: Ctx, *, d_k: int,
                    fea_hw: tuple[int, int] | None = None):
    """One propagation hop: attend q_tgr over (k_src, v_src) then 1x1 fc.

    Token inputs [n, L, d]; returns tokens [n, Lq, d_v] or, when ``fea_hw``
    is given (final hop), the NHWC map [n, H, W, d_v].
    (The reference's fc is a 1x1 conv over a [N*P, C, 1, 1] view —
    i.e. a per-token dense layer; reference transformer.py:82-91.)
    """
    temperature = math.sqrt(d_k)
    do_drop = ctx.train and ctx.use_dropout
    drop_rng = ctx.next_rng() if (do_drop and ctx.rng is not None) else None
    w = params["fc"]["w"][0, 0]  # [d_v, d_v] (HWIO 1x1)
    if ctx.attn_impl == "pallas" and ctx.train:
        # differentiable fused kernel (custom VJP; in-kernel hardware-PRNG
        # dropout) — the [Lq, Lkv] score matrix never touches HBM in
        # either pass. The fc stays outside: its weights need gradients.
        from tdnet_tpu.kernels.propagation_attention_train import \
            fused_propagation_attention_train
        out = fused_propagation_attention_train(
            q_tgr, k_src, v_src, temperature=temperature,
            dropout_rate=0.1 if do_drop else 0.0, dropout_rng=drop_rng)
        out = jnp.einsum("nld,de->nle", out, w) + params["fc"]["b"]
    elif ctx.attn_impl == "pallas" and drop_rng is None:
        # fused path: the per-token fc rides inside the kernel — the
        # [Lq, d_v] PV field never round-trips HBM before the projection
        from tdnet_tpu.kernels.propagation_attention import \
            fused_propagation_attention
        out = fused_propagation_attention(
            q_tgr, k_src, v_src, temperature=temperature,
            fc_w=w, fc_b=params["fc"]["b"])
    else:
        out = scaled_dot_attention(q_tgr, k_src, v_src,
                                   temperature=temperature,
                                   dropout_rate=0.1 if do_drop else 0.0,
                                   dropout_rng=drop_rng, impl=ctx.attn_impl)
        # per-token fc: [n, L, d_v] x [d_v, d_v]
        out = jnp.einsum("nld,de->nle", out, w) + params["fc"]["b"]
    out = ctx.dropout(out, 0.1)
    if fea_hw is not None:
        h, w_ = fea_hw
        out = out.reshape(out.shape[0], h, w_, out.shape[-1])
    return out
