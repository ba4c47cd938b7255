"""Frozen grouped-PSP teachers for knowledge distillation.

Reference: Training/ptsemseg/models/td4_psp/pspnet_4p.py and
td2_psp/pspnet_2p.py. A ResNet-101 trunk feeds path_num grouped
PyramidPooling slices; each group gets a 3x3 conv (no bias/norm) to 512
channels; a SHARED PredLayer head produces the full-sum logits and the
per-group logits.

Reference quirks reproduced behind ``compat_swap`` (on by default):
- pspnet_4p returns (out12, out1, out3, out2, out4) — groups 2 and 3
  crossed (pspnet_4p.py:103, SURVEY.md 2.10.1). We return the tuple in
  the reference's *unpack* order (T_full, T_1, T_2, T_3, T_4), i.e. with
  the same crossing the student actually trains against.
- 4p scales each per-group logit input by 4 (gp+gp+gp+gp,
  pspnet_4p.py:99-102); 2p does not (pspnet_2p.py:82-93).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tdnet_tpu.nn import (BACKBONES, Ctx, apply_group_conv, apply_pred_layer,
                          apply_pyramid_pooling_groups, apply_resnet,
                          init_group_conv, init_pred_layer,
                          init_pyramid_pooling, init_resnet)


@dataclasses.dataclass(frozen=True)
class TeacherConfig:
    nclass: int = 19
    backbone: str = "resnet101"
    path_num: int = 4
    compat_swap: bool = True     # reproduce the 4p tuple-order crossing

    @property
    def channels(self) -> int:
        # reference pspnet_4p hardcodes 2048 (resnet101); derive from the
        # trunk so small test backbones work too
        return self.backbone_cfg.out_channels

    @property
    def group_in(self) -> int:
        # grouped PSP output width: 2*C/path_num
        return 2 * self.channels // self.path_num

    @property
    def backbone_cfg(self):
        return BACKBONES[self.backbone]()


def init_teacher(key, cfg: TeacherConfig, dtype=jnp.float32) -> dict:
    kb, kp, kh = jax.random.split(key, 3)
    gkeys = jax.random.split(kb, cfg.path_num + 1)
    return {
        "backbone": init_resnet(gkeys[-1], cfg.backbone_cfg, dtype),
        "psp": init_pyramid_pooling(kp, cfg.channels, dtype),
        "groups": [init_group_conv(gkeys[p], cfg.group_in, 512, dtype)
                   for p in range(cfg.path_num)],
        "head": init_pred_layer(kh, 512, cfg.nclass, dtype),
    }


def apply_teacher(params: dict, x: jnp.ndarray, cfg: TeacherConfig,
                  group_id: jnp.ndarray | None = None,
                  quant: str | None = None, stem_impl: str = "xla"):
    """Returns (T_full, T_1, ..., T_P) logits at the c4 grid resolution,
    or — when ``group_id`` (a traced int, the student's pos_id) is given —
    ``(T_full, T_group_id)`` with ONLY that group's head applied. The KD
    loss consumes exactly T_full and T_{pos_id} (reference
    td4_psp.py:370-374); running the shared PredLayer over the three
    unused groups was pure waste in the train step.

    Always runs in eval mode (the reference calls teacher.eval() before
    every use and freezes all params: pspnet_4p.py:124-128).
    ``quant='int8'`` runs the frozen backbone on the int8 MXU path
    (ops/quant.py) — the KD targets absorb the bounded quant noise;
    opt-in, default is the exact reference dataflow.
    ``stem_impl="fused"`` runs the frozen deep-base stem through the
    Pallas fused tail (kernels/fused_stem.py — exact to float-sum
    order); TPU-only, the trainer gates it on the backend like
    attn_impl.
    """
    ctx = Ctx(train=False, quant=quant, stem_impl=stem_impl)
    _, c4, _ = apply_resnet(params["backbone"], x, cfg.backbone_cfg, ctx)
    # shared-branch grouped PSP: pools/convs/BN/upsamples run once, not
    # once per group (nn/pyramid.py:apply_pyramid_pooling_groups)
    zs, _ = apply_pyramid_pooling_groups(params["psp"], c4, ctx,
                                         cfg.path_num)
    gs = [apply_group_conv(params["groups"][p], z)
          for p, z in enumerate(zs)]
    full, _ = apply_pred_layer(params["head"], sum(gs), ctx)
    scale = 4.0 if cfg.path_num == 4 else 1.0
    swap = cfg.path_num == 4 and cfg.compat_swap
    if group_id is not None:
        # group feature the student at pos_id trains against, honoring the
        # reference's tuple-order crossing: T_2 is group 3, T_3 is group 2.
        order = [0, 2, 1, 3] if swap else list(range(cfg.path_num))
        sel = sum(jnp.where(group_id == i, 1.0, 0.0).astype(g.dtype) * g
                  for i, g in zip(order, gs))
        return full, apply_pred_layer(params["head"], sel * scale, ctx)[0]
    outs = [apply_pred_layer(params["head"], g * scale, ctx)[0] for g in gs]
    if swap:
        # reference returns (out12, out1, out3, out2, out4) and unpacks it
        # as (T_full, T_1, T_2, T_3, T_4): the student's T_2 is group 3's
        # logits and T_3 is group 2's.
        outs = [outs[0], outs[2], outs[1], outs[3]]
    return (full, *outs)


def freeze_mask(params: dict):
    """All-False trainability mask (teacher is fully frozen)."""
    return jax.tree.map(lambda _: False, params)
