"""Single-frame PSPNet baseline (reference: Testing/model/pspnet/pspnet.py).

Used for the speed/accuracy comparison (`--model psp101`) and as the
source network for checkpoint surgery.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tdnet_tpu.nn import (BACKBONES, Ctx, apply_fcn_head, apply_psp_head,
                          apply_resnet, init_fcn_head, init_psp_head,
                          init_resnet)
from tdnet_tpu.ops import resize_bilinear


@dataclasses.dataclass(frozen=True)
class PSPNetConfig:
    nclass: int = 19
    backbone: str = "resnet101"
    in_size: tuple[int, int] = (769, 1537)
    aux: bool = False

    @property
    def expansion(self) -> int:
        return 4 if self.backbone in ("resnet50", "resnet101", "resnet152") else 1

    @property
    def channels(self) -> int:
        return 512 * self.expansion

    @property
    def backbone_cfg(self):
        return BACKBONES[self.backbone]()


def init_pspnet(key, cfg: PSPNetConfig, dtype=jnp.float32) -> dict:
    kb, kh, ka = jax.random.split(key, 3)
    p = {"backbone": init_resnet(kb, cfg.backbone_cfg, dtype),
         "head": init_psp_head(kh, cfg.channels, cfg.nclass, dtype)}
    if cfg.aux:
        p["aux"] = init_fcn_head(ka, 256 * cfg.expansion, cfg.nclass,
                                 chn_down=4, dtype=dtype)
    return p


def apply_pspnet(params: dict, x: jnp.ndarray, cfg: PSPNetConfig, ctx: Ctx,
                 return_aux: bool = False):
    np_ = dict(params)
    c3, c4, np_["backbone"] = apply_resnet(params["backbone"], x,
                                           cfg.backbone_cfg, ctx)
    out, np_["head"] = apply_psp_head(params["head"], c4, ctx)
    out = resize_bilinear(out, cfg.in_size)
    if return_aux and cfg.aux:
        aux, np_["aux"] = apply_fcn_head(params["aux"], c3, ctx)
        aux = resize_bilinear(aux, cfg.in_size)
        return out, aux, np_
    return out, np_
