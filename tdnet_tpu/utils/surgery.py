"""Checkpoint surgery: single-path PSPNet checkpoint -> teacher / student.

Reproduces the reference's channel-regathering splitters
(Training/ptsemseg/utils.py:70-202) against our pytree layout, working
directly from source-checkpoint names instead of torch key gymnastics.

The core operation: the source PSPNet head's first conv consumes the
full pyramid concat [identity(C) | f1..f4(C/4 each)] (2C channels). The
grouped nets consume [identity_g | f1_g..f4_g] where slice g of the
identity is C/groups wide and of each pyramid branch C/(4*groups) wide.
Group g's conv weight is therefore the source weight with input channels
gathered at:
  identity: [g*C/G, (g+1)*C/G)
  branch j: [C + j*C/4 + g*C/(4G), ...)        (j = 0..3)
(reference utils.py:95-125: step1 = i_c/2/G, step2 = i_c/8/G with
i_c = 2C.)
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from tdnet_tpu.utils.torch_import import (_bn, _conv, fcn_head_from_torch,
                                          pyramid_from_torch,
                                          resnet_from_torch,
                                          strip_module_prefix)


def grouped_head_conv(w_oihw: np.ndarray, groups: int, g: int) -> np.ndarray:
    """Gather input channels of the source head conv for group ``g``."""
    i_c = w_oihw.shape[1]
    step1 = i_c // 2 // groups
    step2 = i_c // 8 // groups
    idx = list(range(g * step1, (g + 1) * step1))
    for j in range(4):
        off = i_c * (4 + j) // 8
        idx += list(range(off + g * step2, off + g * step2 + step2))
    return w_oihw[:, idx]


def _head_conv_groups(sd: dict, groups: int) -> list[np.ndarray]:
    w = sd["head.conv5.1.weight"]  # [inter, 2C, 3, 3] OIHW
    return [grouped_head_conv(w, groups, g) for g in range(groups)]


def teacher_from_psp_checkpoint(sd: dict, teacher_cfg) -> dict:
    """split_psp_state_dict equivalent (reference utils.py:138-202).

    ``sd``: numpy state dict of a vanilla grouped-source PSPNet
    (keys pretrained.*, head.conv5.*, auxlayer.*).
    """
    sd = strip_module_prefix(sd)
    P = teacher_cfg.path_num
    # For P == 2 the reference's splitter also materializes groups 3,4 as
    # copies of 1,2 (utils.py:181-185) but pspnet_2p loads only
    # grp_state1/2 (pspnet_2p.py:102-107), so two groups are all there is.
    gws = _head_conv_groups(sd, P)
    groups = [{"w": jnp.asarray(np.transpose(gw, (2, 3, 1, 0)))} for gw in gws]
    return {
        "backbone": resnet_from_torch(sd, teacher_cfg.backbone_cfg, "pretrained."),
        "psp": pyramid_from_torch(sd, "head.conv5.0."),
        "groups": groups,
        "head": {"bn": _bn(sd, "head.conv5.2"),
                 "out": _conv(sd, "head.conv5.5")},
    }


def student_bootstrap_from_psp_checkpoint(sd: dict, cfg, params: dict) -> dict:
    """split_psp_dict equivalent (reference utils.py:70-135): initialize a
    freshly-initialized TDNet ``params`` tree from a single-path PSPNet
    checkpoint. Backbone/psp/aux are replicated to every path; for P=4
    the heads get the 2-group channel-shuffled first conv plus the shared
    bn/out conv (reference td4_psp.py:421-443, heads 1,3 <- group 0 and
    2,4 <- group 1); for P=2 heads stay at fresh init (td2_psp.py:215-233
    loads only backbone/psp/aux). Encoding/attention/LN stay fresh."""
    sd = strip_module_prefix(sd)
    P = cfg.path_num
    backbone = resnet_from_torch(sd, cfg.backbone_cfg, "pretrained.")
    psp = pyramid_from_torch(sd, "head.conv5.0.")
    aux = fcn_head_from_torch(sd, "auxlayer.") if "auxlayer.conv5.0.weight" in sd else None

    paths = dict(params["paths"])

    def rep(tree):
        return jax.tree.map(lambda x: jnp.stack([x] * P), tree)

    paths["backbone"] = rep(backbone)
    paths["psp"] = rep(psp)
    if aux is not None and "aux" in paths:
        paths["aux"] = rep(aux)

    if P == 4:
        gws = _head_conv_groups(sd, 2)
        heads = []
        for p in range(P):
            g = cfg.psp_pid(p)  # (0,1,0,1)
            heads.append({
                "conv": {"w": jnp.asarray(np.transpose(gws[g], (2, 3, 1, 0)))},
                "bn": _bn(sd, "head.conv5.2"),
                "out": _conv(sd, "head.conv5.5"),
            })
        paths["head"] = jax.tree.map(lambda *xs: jnp.stack(xs), *heads)
    return {"paths": paths, "atn": params["atn"]}
