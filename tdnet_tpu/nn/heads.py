"""Prediction heads.

- FCNHead (reference: Testing/model/pspnet/td4_psp18.py:287-302):
  3x3 conv (no bias) -> BN -> ReLU -> Dropout2d(0.1) -> 1x1 conv to nclass.
- PredLayer (teacher shared head, reference:
  Training/ptsemseg/models/td4_psp/pspnet_4p.py:197-207):
  BN -> ReLU -> Dropout2d(0.1) -> 1x1 conv.
- GroupConv (teacher per-group 3x3, reference: pspnet_4p.py:182-194
  with BNLU=False): plain 3x3 conv, no bias, no norm.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tdnet_tpu.nn.module import Ctx
from tdnet_tpu.ops import conv2d, init_batch_norm, init_conv_kaiming


def init_fcn_head(key, in_channels: int, nclass: int, *, chn_down: int = 4,
                  dtype=jnp.float32) -> dict:
    inter = in_channels // chn_down
    k1, k2 = jax.random.split(key)
    return {
        "conv": init_conv_kaiming(k1, 3, 3, in_channels, inter, dtype=dtype),
        "bn": init_batch_norm(inter, dtype),
        "out": init_conv_kaiming(k2, 1, 1, inter, nclass, bias=True, dtype=dtype),
    }


def apply_fcn_head(params: dict, x: jnp.ndarray, ctx: Ctx):
    np_ = dict(params)
    y = conv2d(x, params["conv"]["w"], padding=1)
    y, np_["bn"] = ctx.bn(y, params["bn"], activation="relu")
    y = ctx.dropout2d(y, 0.1)
    y = conv2d(y, params["out"]["w"], params["out"]["b"])
    return y, np_


def init_pred_layer(key, in_channels: int, nclass: int, dtype=jnp.float32) -> dict:
    return {
        "bn": init_batch_norm(in_channels, dtype),
        "out": init_conv_kaiming(key, 1, 1, in_channels, nclass, bias=True,
                                 dtype=dtype),
    }


def apply_pred_layer(params: dict, x: jnp.ndarray, ctx: Ctx):
    np_ = dict(params)
    y, np_["bn"] = ctx.bn(x, params["bn"], activation="relu")
    y = ctx.dropout2d(y, 0.1)
    y = conv2d(y, params["out"]["w"], params["out"]["b"])
    return y, np_


def init_group_conv(key, in_channels: int, out_channels: int,
                    dtype=jnp.float32) -> dict:
    return init_conv_kaiming(key, 3, 3, in_channels, out_channels, dtype=dtype)


def apply_group_conv(params: dict, x: jnp.ndarray):
    return conv2d(x, params["w"], padding=1)
