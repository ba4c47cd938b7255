"""FANet blocks: standard-stride ResNet, FAModule (linear "fast
attention"), FPNOutput head.

Reference: Training/ptsemseg/models/td2_fanet/{resnet.py,td2_fa.py}.
The reference td2_fa is unfinished (live pdb.set_trace in __init__,
td2_fa.py:80); we implement the architecture it defines, without the
trap. Quirks reproduced for checkpoint parity:

- FAModule.up is a 1x1 conv with padding=1 (td2_fa.py:348) — it GROWS
  the map by 2 px per side; the next _upsample_add interpolates the
  artifact away. Kept verbatim.
- FANet ResNet BasicBlock: leaky-ReLU fused into bn1, linear bn2, plain
  ReLU after the residual add (resnet.py:34-65).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tdnet_tpu.nn.module import Ctx
from tdnet_tpu.ops import (conv2d, init_batch_norm, init_conv_kaiming,
                           max_pool, resize_bilinear)


# ---------------------------------------------------------------------------
# conv + BN(activation) pair used throughout FANet (bias=False convs)
# ---------------------------------------------------------------------------

def init_conv_bn(key, ks, cin, cout, dtype=jnp.float32):
    return {"conv": init_conv_kaiming(key, ks, ks, cin, cout, dtype=dtype),
            "bn": init_batch_norm(cout, dtype)}


def apply_conv_bn(p, x, ctx: Ctx, *, stride=1, padding=0, activation=None,
                  quantize=False):
    """``quantize=True`` opts this conv into the int8 PTQ path when
    ``ctx.quant == 'int8'`` (backbone residual blocks only; the stem and
    the FAModule attention projections stay in the float dtype)."""
    np_ = dict(p)
    if quantize and not ctx.train and ctx.quant == "int8":
        from tdnet_tpu.ops.quant import conv2d_int8
        y = conv2d_int8(x, p["conv"]["w"], stride=stride, padding=padding)
    else:
        y = conv2d(x, p["conv"]["w"], stride=stride, padding=padding)
    y, np_["bn"] = ctx.bn(y, p["bn"], activation=activation)
    return y, np_


# ---------------------------------------------------------------------------
# Standard-stride ResNet (4-scale)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class FANetResNetConfig:
    """NOTE: the reference passes strides=[2,2,2,2] for ALL FANet
    backbones (td2_fanet/resnet.py:156-188) — layer1 strides too, so the
    'feat4' scale is really 1/8 of the input (and LN [96,192] matches a
    768x1536 input at 1/8). The in-code '1/8' comments there are stale."""
    block: str = "basic"
    layers: tuple[int, ...] = (2, 2, 2, 2)
    strides: tuple[int, ...] = (2, 2, 2, 2)

    @property
    def expansion(self):
        return 4 if self.block == "bottleneck" else 1


FANET_BACKBONES = {
    "resnet18": lambda: FANetResNetConfig("basic", (2, 2, 2, 2)),
    "resnet34": lambda: FANetResNetConfig("basic", (3, 4, 6, 3)),
    "resnet50": lambda: FANetResNetConfig("bottleneck", (3, 4, 6, 3)),
}


def init_fanet_resnet(key, cfg: FANetResNetConfig, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 1024))
    p = {"stem": init_conv_bn(next(keys), 7, 3, 64, dtype)}
    inplanes = 64
    for li, (planes, n, stride) in enumerate(
            zip((64, 128, 256, 512), cfg.layers, cfg.strides)):
        blocks = []
        for bi in range(n):
            s = stride if bi == 0 else 1
            cout = planes * cfg.expansion
            b = {}
            if cfg.block == "basic":
                b["conv1"] = init_conv_bn(next(keys), 3, inplanes, planes, dtype)
                b["conv2"] = init_conv_bn(next(keys), 3, planes, planes, dtype)
            else:
                b["conv1"] = init_conv_bn(next(keys), 1, inplanes, planes, dtype)
                b["conv2"] = init_conv_bn(next(keys), 3, planes, planes, dtype)
                b["conv3"] = init_conv_bn(next(keys), 1, planes, cout, dtype)
            if inplanes != cout or s != 1:
                b["downsample"] = init_conv_bn(next(keys), 1, inplanes, cout,
                                               dtype)
            blocks.append(b)
            inplanes = cout
        p[f"layer{li + 1}"] = blocks
    return p


def _apply_fanet_block(b, x, ctx: Ctx, block_kind: str, s: int):
    nb = dict(b)
    if block_kind == "basic":
        out, nb["conv1"] = apply_conv_bn(b["conv1"], x, ctx, stride=s,
                                         padding=1, activation="leaky_relu",
                                         quantize=True)
        out, nb["conv2"] = apply_conv_bn(b["conv2"], out, ctx, padding=1,
                                         quantize=True)
    else:
        out, nb["conv1"] = apply_conv_bn(b["conv1"], x, ctx,
                                         activation="leaky_relu",
                                         quantize=True)
        out, nb["conv2"] = apply_conv_bn(b["conv2"], out, ctx, stride=s,
                                         padding=1, activation="leaky_relu",
                                         quantize=True)
        out, nb["conv3"] = apply_conv_bn(b["conv3"], out, ctx, quantize=True)
    if "downsample" in b:
        sc, nb["downsample"] = apply_conv_bn(b["downsample"], x, ctx, stride=s,
                                             quantize=True)
    else:
        sc = x
    return jax.nn.relu(sc + out), nb


def apply_fanet_resnet(params, x, cfg: FANetResNetConfig, ctx: Ctx):
    np_ = dict(params)
    x, np_["stem"] = apply_conv_bn(params["stem"], x, ctx, stride=2,
                                   padding=3, activation="leaky_relu")
    x = max_pool(x, 3, 2, 1)
    feats = []
    for li in range(4):
        blocks = []
        for bi, b in enumerate(params[f"layer{li + 1}"]):
            s = cfg.strides[li] if bi == 0 else 1
            x, nb = _apply_fanet_block(b, x, ctx, cfg.block, s)
            blocks.append(nb)
        np_[f"layer{li + 1}"] = blocks
        feats.append(x)
    return feats, np_  # [feat4, feat8, feat16, feat32]


# ---------------------------------------------------------------------------
# FAModule — linear (cosine) attention + FPN lateral/up/smooth
# ---------------------------------------------------------------------------

def init_fa_module(key, in_chan: int, out_chan: int = 128, dtype=jnp.float32):
    mid = in_chan // 2
    ks = jax.random.split(key, 6)
    return {
        "w_qs": init_conv_bn(ks[0], 1, in_chan, 32, dtype),
        "w_ks": init_conv_bn(ks[1], 1, in_chan, 32, dtype),
        "w_vs": init_conv_bn(ks[2], 1, in_chan, in_chan, dtype),
        "latlayer3": init_conv_bn(ks[3], 1, in_chan, in_chan, dtype),
        "up": init_conv_bn(ks[4], 1, in_chan, mid, dtype),
        "smooth": init_conv_bn(ks[5], 3, in_chan, out_chan, dtype),
    }


def _l2norm(x, axis, eps=1e-12):
    n = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis,
                         keepdims=True))
    return (x / jnp.maximum(n, eps).astype(x.dtype))


def apply_fa_module(p, feat, up_fea_in, ctx: Ctx, *, up_flag: bool,
                    smf_flag: bool):
    """Returns same outputs as the reference flag combination
    (td2_fa.py:353-398) plus updated params as the last element."""
    np_ = dict(p)
    q, np_["w_qs"] = apply_conv_bn(p["w_qs"], feat, ctx)
    k, np_["w_ks"] = apply_conv_bn(p["w_ks"], feat, ctx)
    v, np_["w_vs"] = apply_conv_bn(p["w_vs"], feat, ctx,
                                   activation="leaky_relu")
    n, h, w, c = feat.shape
    qt = _l2norm(q.reshape(n, h * w, 32), axis=2)
    kt = _l2norm(k.reshape(n, h * w, 32), axis=2)
    vt = v.reshape(n, h * w, c)
    f = jnp.einsum("nlk,nlc->nkc", kt, vt, preferred_element_type=jnp.float32)
    y = jnp.einsum("nlk,nkc->nlc", qt, f.astype(qt.dtype),
                   preferred_element_type=jnp.float32).astype(feat.dtype)
    y = y.reshape(n, h, w, c)
    wy, np_["latlayer3"] = apply_conv_bn(p["latlayer3"], y, ctx,
                                         activation="leaky_relu")
    p_feat = wy + feat

    def upsample_add(x_, y_):
        return resize_bilinear(x_, y_.shape[1:3]) + y_

    outs = []
    if up_fea_in is not None:
        p_feat = upsample_add(up_fea_in, p_feat)
    if up_flag:
        # reference quirk: 1x1 conv with padding=1 -> grows map by 2 px/side
        up_feat, np_["up"] = apply_conv_bn(p["up"], p_feat, ctx, padding=1,
                                           activation="leaky_relu")
        outs.append(up_feat)
    if smf_flag and (not up_flag or up_fea_in is not None):
        smooth, np_["smooth"] = apply_conv_bn(p["smooth"], p_feat, ctx,
                                              padding=1,
                                              activation="leaky_relu")
        outs.append(smooth)
    return (*outs, np_)


def init_fpn_output(key, in_chan, mid_chan, nclass, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {"conv": init_conv_bn(k1, 3, in_chan, mid_chan, dtype),
            "conv_out": init_conv_kaiming(k2, 1, 1, mid_chan, nclass,
                                          bias=False, dtype=dtype)}


def apply_fpn_output(p, x, ctx: Ctx):
    np_ = dict(p)
    y, np_["conv"] = apply_conv_bn(p["conv"], x, ctx, padding=1,
                                   activation="leaky_relu")
    y = conv2d(y, p["conv_out"]["w"])
    return y, np_
