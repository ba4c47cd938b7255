"""Dilated multi-grid ResNet backbones (output stride 8).

Reference: Testing/model/pspnet/resnet.py:114-215 and
Training/ptsemseg/models/td4_psp/resnet.py (same topology plus an
``aux`` c3 output). Geometry:

- layer3: stride 1, dilation 2 (first block conv dil 1, rest dil 2)
- layer4: stride 1, dilation 4 with multi-grid dilations [4, 8, 16]
  (reference: resnet.py:170-202 ``_make_layer``); without multi-grid the
  first block uses dil 2, rest dil 4
- deep_base (resnet50/101/152): 3x 3x3-conv stem to 128ch
  (resnet.py:122-131); resnet18/34: single 7x7 stem to 64ch

All activations NHWC. apply returns (c3, c4, updated_params).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tdnet_tpu.nn.module import Ctx
from tdnet_tpu.ops import (conv2d, init_batch_norm, init_conv_msra_out,
                           max_pool)
from tdnet_tpu.ops.conv import (conv2d_mm, conv2d_mm_wgrad, conv2d_stem_oct,
                                conv2d_stem_s2d)
from tdnet_tpu.ops.quant import conv2d_int8

_MULTI_DILATIONS = (4, 8, 16)


def _conv3x3(x, w, ctx: Ctx, *, stride: int, padding: int, dilation: int):
    """Residual-block 3x3 conv. In training the stride-1 convs route
    through per-tap dense MXU matmuls — XLA's phase-decomposed dilated
    convs (and especially their weight gradients, ~45 TFLOP/s) dominated
    the bf16 train profile on v5e. ``ctx.conv_wgrad``:
    - "mm_wgrad": XLA fwd/dgrad + matmul wgrad — the measured-best mix
      end to end (default);
    - "pallas": kernels/dilated_conv row-block kernel for dilation >= 4
      (fwd + dgrad; tap-matmul wgrad), mm_wgrad below. Wins per-conv in
      isolation but the pallas_call boundary blocks XLA fusion around it
      and the full step regresses — opt-in only;
    - "mm": fully matmul-form conv (measured slower; kept for A/B);
    - "mixed": "mm" for narrow convs (ci <= 128, where XLA's 8-phase
      packed conv layout surrounds every fwd/dgrad with relayout
      copies — the [193,8,49..51,64] copy family in the bf16 profile),
      "mm_wgrad" for wide ones (where full-mm measured slower);
    - "xla": native convs."""
    if ctx.train and stride == 1:
        if ctx.conv_wgrad == "pallas":
            if dilation >= 4:
                from tdnet_tpu.kernels.dilated_conv import conv2d_pallas_dil
                return conv2d_pallas_dil(x, w, padding, dilation)
            return conv2d_mm_wgrad(x, w, padding, dilation)
        if ctx.conv_wgrad == "mixed":
            if x.shape[-1] <= 128:
                return conv2d_mm(x, w, padding, dilation)
            return conv2d_mm_wgrad(x, w, padding, dilation)
        if ctx.conv_wgrad == "mm":
            return conv2d_mm(x, w, padding, dilation)
        if ctx.conv_wgrad == "mm_wgrad":
            return conv2d_mm_wgrad(x, w, padding, dilation)
    if not ctx.train and ctx.quant == "int8":
        return conv2d_int8(x, w, stride=stride, padding=padding,
                           dilation=dilation)
    return conv2d(x, w, stride=stride, padding=padding, dilation=dilation)


def _conv1x1(x, w, ctx: Ctx, *, stride: int = 1):
    """Residual-block 1x1 conv (bottleneck project/expand, downsample);
    routes through the int8 MXU path with the 3x3s when quantized."""
    if not ctx.train and ctx.quant == "int8":
        return conv2d_int8(x, w, stride=stride)
    return conv2d(x, w, stride=stride)


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    block: str                 # 'basic' | 'bottleneck'
    layers: tuple[int, ...]
    deep_base: bool = False
    dilated: bool = True
    multi_grid: bool = True

    @property
    def expansion(self) -> int:
        return 4 if self.block == "bottleneck" else 1

    @property
    def out_channels(self) -> int:
        return 512 * self.expansion


def resnet10() -> ResNetConfig:
    return ResNetConfig("basic", (1, 1, 1, 1))


def resnet18() -> ResNetConfig:
    return ResNetConfig("basic", (2, 2, 2, 2))


def resnet34() -> ResNetConfig:
    return ResNetConfig("basic", (3, 4, 6, 3))


def resnet50() -> ResNetConfig:
    return ResNetConfig("bottleneck", (3, 4, 6, 3), deep_base=True)


def resnet101() -> ResNetConfig:
    return ResNetConfig("bottleneck", (3, 4, 23, 3), deep_base=True)


def resnet152() -> ResNetConfig:
    return ResNetConfig("bottleneck", (3, 8, 36, 3), deep_base=True)


BACKBONES = {
    "resnet10": resnet10, "resnet18": resnet18, "resnet34": resnet34,
    "resnet50": resnet50, "resnet101": resnet101, "resnet152": resnet152,
}


def _block_plan(cfg: ResNetConfig):
    """Per-layer list of per-block (stride, dil, prev_dil, in_ch, mid_ch)."""
    plan = []
    inplanes = 128 if cfg.deep_base else 64
    for li, (planes, blocks) in enumerate(zip((64, 128, 256, 512), cfg.layers)):
        if cfg.dilated:
            stride = 1 if li in (2, 3) else (2 if li == 1 else 1)
            dilation = {0: 1, 1: 1, 2: 2, 3: 4}[li]
            multi_grid = cfg.multi_grid and li == 3
        else:
            stride = 1 if li == 0 else 2
            dilation = 1
            multi_grid = False
        layer = []
        for bi in range(blocks):
            if bi == 0:
                if multi_grid:
                    d = _MULTI_DILATIONS[0]
                elif dilation in (1, 2):
                    d = 1
                elif dilation == 4:
                    d = 2
                else:
                    raise ValueError(dilation)
                s = stride
            else:
                d = _MULTI_DILATIONS[bi] if multi_grid else dilation
                s = 1
            layer.append(dict(stride=s, dil=d, prev_dil=dilation,
                              in_ch=inplanes, mid_ch=planes))
            inplanes = planes * cfg.expansion
        plan.append(layer)
    return plan


def _init_conv_bn(key, kh, kw, cin, cout, dtype):
    k1, _ = jax.random.split(key)
    return {**init_conv_msra_out(k1, kh, kw, cin, cout, dtype=dtype),
            }, init_batch_norm(cout, dtype)


def init_resnet(key, cfg: ResNetConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 4096))
    p: dict = {}
    if cfg.deep_base:
        c0, b0 = _init_conv_bn(next(keys), 3, 3, 3, 64, dtype)
        c1, b1 = _init_conv_bn(next(keys), 3, 3, 64, 64, dtype)
        c2, _ = _init_conv_bn(next(keys), 3, 3, 64, 128, dtype)
        p["stem"] = {"conv0": c0, "bn0": b0, "conv1": c1, "bn1": b1, "conv2": c2}
        p["bn1"] = init_batch_norm(128, dtype)
    else:
        c0, _ = _init_conv_bn(next(keys), 7, 7, 3, 64, dtype)
        p["stem"] = {"conv0": c0}
        p["bn1"] = init_batch_norm(64, dtype)

    plan = _block_plan(cfg)
    for li, layer in enumerate(plan):
        blocks = []
        for spec in layer:
            cin, mid = spec["in_ch"], spec["mid_ch"]
            cout = mid * cfg.expansion
            b: dict = {}
            if cfg.block == "basic":
                b["conv1"], b["bn1"] = _init_conv_bn(next(keys), 3, 3, cin, mid, dtype)
                b["conv2"], b["bn2"] = _init_conv_bn(next(keys), 3, 3, mid, mid, dtype)
            else:
                b["conv1"], b["bn1"] = _init_conv_bn(next(keys), 1, 1, cin, mid, dtype)
                b["conv2"], b["bn2"] = _init_conv_bn(next(keys), 3, 3, mid, mid, dtype)
                b["conv3"], b["bn3"] = _init_conv_bn(next(keys), 1, 1, mid, cout, dtype)
            if spec["stride"] != 1 or cin != cout:
                dc, db = _init_conv_bn(next(keys), 1, 1, cin, cout, dtype)
                b["downsample"] = {"conv": dc, "bn": db}
            blocks.append(b)
        p[f"layer{li + 1}"] = blocks
    return p


def _apply_basic(b, x, spec, ctx: Ctx):
    nb = dict(b)
    out = _conv3x3(x, b["conv1"]["w"], ctx, stride=spec["stride"],
                   padding=spec["dil"], dilation=spec["dil"])
    out, nb["bn1"] = ctx.bn(out, b["bn1"], activation="relu")
    out = _conv3x3(out, b["conv2"]["w"], ctx, stride=1,
                   padding=spec["prev_dil"], dilation=spec["prev_dil"])
    if "downsample" in b:
        res = _conv1x1(x, b["downsample"]["conv"]["w"], ctx,
                       stride=spec["stride"])
        res, dbn = ctx.bn(res, b["downsample"]["bn"])
        nb["downsample"] = {"conv": b["downsample"]["conv"], "bn": dbn}
    else:
        res = x
    # block tail bn -> += identity -> relu as one fused op (one backward
    # pass instead of bn-bwd + relu-bwd over the c4-grid activation)
    out, nb["bn2"] = ctx.bn(out, b["bn2"], activation="relu", residual=res)
    return out, nb


def _apply_bottleneck(b, x, spec, ctx: Ctx):
    nb = dict(b)
    out = _conv1x1(x, b["conv1"]["w"], ctx)
    out, nb["bn1"] = ctx.bn(out, b["bn1"], activation="relu")
    out = _conv3x3(out, b["conv2"]["w"], ctx, stride=spec["stride"],
                   padding=spec["dil"], dilation=spec["dil"])
    out, nb["bn2"] = ctx.bn(out, b["bn2"], activation="relu")
    out = _conv1x1(out, b["conv3"]["w"], ctx)
    if "downsample" in b:
        res = _conv1x1(x, b["downsample"]["conv"]["w"], ctx,
                       stride=spec["stride"])
        res, dbn = ctx.bn(res, b["downsample"]["bn"])
        nb["downsample"] = {"conv": b["downsample"]["conv"], "bn": dbn}
    else:
        res = x
    out, nb["bn3"] = ctx.bn(out, b["bn3"], activation="relu", residual=res)
    return out, nb


def apply_resnet(params: dict, x: jnp.ndarray, cfg: ResNetConfig, ctx: Ctx):
    """Returns (c3, c4, updated_params)."""
    np_ = dict(params)
    stem = dict(params["stem"])
    stem_impl = ctx.stem_impl
    # "fused": Pallas deep-stem tail (conv1+BN+ReLU -> conv2+BN+ReLU ->
    # maxpool in one VMEM pass — kernels/fused_stem.py). Eval-only (the
    # train path needs full activations for BN batch stats) and only
    # meaningful for deep-base; elsewhere it degrades to the best
    # default for that stem shape.
    fused_tail = (cfg.deep_base and stem_impl == "fused" and not ctx.train)
    if not cfg.deep_base and stem_impl == "fused":
        stem_impl = "oct"
    if cfg.deep_base and stem_impl in ("oct", "fused") and not fused_tail:
        # 3x3 deep-base stems (27-deep contraction) measured slightly
        # SLOWER with the im2col matmul on v5e (48.3 -> 47.1 FPS for
        # TD2-PSP50 @1025x2049); the win is the channel-starved 7x7
        # (TD4-PSP18 @769x1537: 131.5 -> 160.8 FPS).
        stem_impl = "xla"
    if fused_tail:
        from tdnet_tpu.kernels.fused_stem import (fold_bn_eval,
                                                  fused_stem_tail)
        x = conv2d(x, stem["conv0"]["w"], stride=2, padding=1)
        x, stem["bn0"] = ctx.bn(x, stem["bn0"], activation="relu")
        x = fused_stem_tail(x, stem["conv1"]["w"],
                            fold_bn_eval(stem["bn1"]),
                            stem["conv2"]["w"],
                            fold_bn_eval(params["bn1"]))
        np_["stem"] = stem
        np_["bn1"] = params["bn1"]
    else:
        stem_conv = {"xla": lambda x, w, padding: conv2d(x, w, stride=2,
                                                         padding=padding),
                     "s2d": conv2d_stem_s2d,
                     "oct": conv2d_stem_oct}[stem_impl]
        if cfg.deep_base:
            x = stem_conv(x, stem["conv0"]["w"], padding=1)
            x, stem["bn0"] = ctx.bn(x, stem["bn0"], activation="relu")
            x = conv2d(x, stem["conv1"]["w"], padding=1)
            x, stem["bn1"] = ctx.bn(x, stem["bn1"], activation="relu")
            x = conv2d(x, stem["conv2"]["w"], padding=1)
        else:
            x = stem_conv(x, stem["conv0"]["w"], padding=3)
        np_["stem"] = stem
        x, np_["bn1"] = ctx.bn(x, params["bn1"], activation="relu")
        x = max_pool(x, 3, 2, 1)

    plan = _block_plan(cfg)
    apply_block = _apply_basic if cfg.block == "basic" else _apply_bottleneck
    feats = []
    for li in range(4):
        blocks = []
        for b, spec in zip(params[f"layer{li + 1}"], plan[li]):
            x, nb = apply_block(b, x, spec, ctx)
            blocks.append(nb)
        np_[f"layer{li + 1}"] = blocks
        feats.append(x)
    c3, c4 = feats[2], feats[3]
    return c3, c4, np_
