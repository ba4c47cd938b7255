"""PyTorch checkpoint -> JAX pytree importers.

Converts reference checkpoints (torch pickles, NCHW/OIHW) into this
framework's stacked-path NHWC pytrees, covering the reference's three
checkpoint mechanisms (SURVEY.md section 5.4):

1. bootstrap init from a single-path PSPNet checkpoint with channel
   surgery (reference: Training/ptsemseg/utils.py:70-135 split_psp_dict),
2. teacher init (utils.py:138-202 split_psp_state_dict),
3. trained TDNet checkpoints (Testing naming:
   pretrained{1..P}/psp{1..P}/enc{1..P}/atn{p}_{s}/layer_norm{p}/head{p}).

torch (CPU) is used only here, at conversion time — never on the
compute path.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def load_torch_state(path: str) -> dict:
    import torch
    state = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "model_state" in state:
        state = state["model_state"]
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in state.items()}


def strip_module_prefix(sd: dict) -> dict:
    """DataParallel 'module.' prefix removal (reference utils.py:211-220)."""
    if all(k.startswith("module.") for k in sd):
        return {k[7:]: v for k, v in sd.items()}
    return sd


def _conv(sd, prefix, bias=None):
    w = sd[prefix + ".weight"]
    p = {"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))}  # OIHW -> HWIO
    if bias is None:
        bias = prefix + ".bias" in sd
    if bias:
        p["b"] = jnp.asarray(sd[prefix + ".bias"])
    return p


def _bn(sd, prefix):
    return {
        "scale": jnp.asarray(sd[prefix + ".weight"]),
        "bias": jnp.asarray(sd[prefix + ".bias"]),
        "mean": jnp.asarray(sd[prefix + ".running_mean"]),
        "var": jnp.asarray(sd[prefix + ".running_var"]),
    }


def _ln(sd, prefix):
    return {"scale": jnp.asarray(sd[prefix + ".weight"]),
            "bias": jnp.asarray(sd[prefix + ".bias"])}


def resnet_from_torch(sd: dict, cfg, prefix: str = "") -> dict:
    """cfg: tdnet_tpu.nn.resnet.ResNetConfig; prefix e.g. 'pretrained1.'."""
    from tdnet_tpu.nn.resnet import _block_plan
    g = lambda s: prefix + s
    p: dict = {}
    if cfg.deep_base:
        p["stem"] = {
            "conv0": _conv(sd, g("conv1.0")), "bn0": _bn(sd, g("conv1.1")),
            "conv1": _conv(sd, g("conv1.3")), "bn1": _bn(sd, g("conv1.4")),
            "conv2": _conv(sd, g("conv1.6")),
        }
    else:
        p["stem"] = {"conv0": _conv(sd, g("conv1"))}
    p["bn1"] = _bn(sd, g("bn1"))
    plan = _block_plan(cfg)
    for li, layer in enumerate(plan):
        blocks = []
        for bi in range(len(layer)):
            bp = g(f"layer{li + 1}.{bi}")
            b = {"conv1": _conv(sd, bp + ".conv1"), "bn1": _bn(sd, bp + ".bn1"),
                 "conv2": _conv(sd, bp + ".conv2"), "bn2": _bn(sd, bp + ".bn2")}
            if cfg.block == "bottleneck":
                b["conv3"] = _conv(sd, bp + ".conv3")
                b["bn3"] = _bn(sd, bp + ".bn3")
            if bp + ".downsample.0.weight" in sd:
                b["downsample"] = {"conv": _conv(sd, bp + ".downsample.0"),
                                   "bn": _bn(sd, bp + ".downsample.1")}
            blocks.append(b)
        p[f"layer{li + 1}"] = blocks
    return p


def pyramid_from_torch(sd: dict, prefix: str) -> dict:
    p = {}
    for i in range(1, 5):
        p[f"conv{i}"] = {"conv": _conv(sd, f"{prefix}conv{i}.0"),
                         "bn": _bn(sd, f"{prefix}conv{i}.1")}
    return p


def _proj2_from_torch(sd: dict, prefix: str) -> dict:
    # nn.Sequential(ConvBNReLU(conv+bn), ConvBNReLU(conv)) ->
    # keys {prefix}.0.conv.*, {prefix}.0.bn.*, {prefix}.1.conv.*
    return {"conv0": _conv(sd, prefix + ".0.conv"),
            "bn0": _bn(sd, prefix + ".0.bn"),
            "conv1": _conv(sd, prefix + ".1.conv")}


def encoding_from_torch(sd: dict, prefix: str) -> dict:
    return {"w_qs": _proj2_from_torch(sd, prefix + "w_qs"),
            "w_ks": _proj2_from_torch(sd, prefix + "w_ks"),
            "w_vs": _conv(sd, prefix + "w_vs.0.conv")}


def attention_from_torch(sd: dict, prefix: str) -> dict:
    return {"fc": _conv(sd, prefix + "fc.0.conv")}


def fcn_head_from_torch(sd: dict, prefix: str) -> dict:
    return {"conv": _conv(sd, prefix + "conv5.0"),
            "bn": _bn(sd, prefix + "conv5.1"),
            "out": _conv(sd, prefix + "conv5.4")}


def pred_layer_from_torch(sd: dict, prefix: str) -> dict:
    return {"bn": _bn(sd, prefix + "conv5.0"),
            "out": _conv(sd, prefix + "conv5.3")}


def psp_head_from_torch(sd: dict, prefix: str) -> dict:
    """PSPHead (baseline pspnet): conv5 = Sequential(PyramidPooling, conv,
    bn, relu, dropout, conv)."""
    return {"psp": pyramid_from_torch(sd, prefix + "conv5.0."),
            "conv": {"conv": _conv(sd, prefix + "conv5.1"),
                     "bn": _bn(sd, prefix + "conv5.2")},
            "out": _conv(sd, prefix + "conv5.5")}


def _conv_bn_pair(sd, conv_prefix, bn_prefix):
    return {"conv": _conv(sd, conv_prefix), "bn": _bn(sd, bn_prefix)}


def fanet_resnet_from_torch(sd: dict, cfg, prefix: str = "") -> dict:
    """FANet standard-stride resnet (td2_fanet/resnet.py naming)."""
    g = lambda s: prefix + s
    p = {"stem": _conv_bn_pair(sd, g("conv1"), g("bn1"))}
    for li in range(4):
        blocks = []
        bi = 0
        while g(f"layer{li + 1}.{bi}.conv1.weight") in sd:
            bp = g(f"layer{li + 1}.{bi}")
            b = {"conv1": _conv_bn_pair(sd, bp + ".conv1", bp + ".bn1"),
                 "conv2": _conv_bn_pair(sd, bp + ".conv2", bp + ".bn2")}
            if bp + ".conv3.weight" in sd:
                b["conv3"] = _conv_bn_pair(sd, bp + ".conv3", bp + ".bn3")
            if bp + ".downsample.0.weight" in sd:
                b["downsample"] = _conv_bn_pair(sd, bp + ".downsample.0",
                                                bp + ".downsample.1")
            blocks.append(b)
            bi += 1
        p[f"layer{li + 1}"] = blocks
    return p


def fa_module_from_torch(sd: dict, prefix: str) -> dict:
    def pair(name):
        return _conv_bn_pair(sd, f"{prefix}{name}.conv", f"{prefix}{name}.bn")
    return {k: pair(k) for k in
            ("w_qs", "w_ks", "w_vs", "latlayer3", "up", "smooth")}


def fpn_output_from_torch(sd: dict, prefix: str) -> dict:
    return {"conv": _conv_bn_pair(sd, prefix + "conv.conv", prefix + "conv.bn"),
            "conv_out": _conv(sd, prefix + "conv_out")}


def fatd_from_torch(sd: dict, cfg) -> dict:
    """td2_fa state dict (training naming) -> stacked FATD pytree."""
    import jax
    sd = strip_module_prefix(sd)
    subnets = []
    for p in range(cfg.path_num):
        i = p + 1
        subnets.append({
            "backbone": fanet_resnet_from_torch(sd, cfg.backbone_cfg,
                                                f"pretrained{i}."),
            "ffm_32": fa_module_from_torch(sd, f"ffm_32_{i}."),
            "ffm_16": fa_module_from_torch(sd, f"ffm_16_{i}."),
            "ffm_8": fa_module_from_torch(sd, f"ffm_8_{i}."),
            "ffm_4": fa_module_from_torch(sd, f"ffm_4_{i}."),
            "enc": encoding_from_torch(sd, f"enc{i}."),
            "ln": _ln(sd, f"layer_norm{i}.ln"),
            "head": fpn_output_from_torch(sd, f"head{i}."),
            "head_aux": fpn_output_from_torch(sd, f"head_aux{i}."),
        })
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *subnets)
    rows = []
    for p in range(cfg.path_num):
        hops = [attention_from_torch(sd, f"atn{p + 1}.")
                for _ in range(cfg.window)]
        rows.append(jax.tree.map(lambda *ys: jnp.stack(ys), *hops))
    atn = jax.tree.map(lambda *xs: jnp.stack(xs), *rows)
    return {"paths": stacked, "atn": atn}


def fanet_bootstrap_from_checkpoint(sd: dict, cfg, params: dict) -> dict:
    """split_fanet_dict equivalent (reference utils.py:35-67 +
    td2_fa.pretrained_init): replicate a single-path FANet checkpoint
    (keys resnet.*, ffm_*.*, clslayer_8.*, clslayer_32.*) to both paths."""
    import jax
    sd = strip_module_prefix(sd)
    P = cfg.path_num

    def rep(tree):
        return jax.tree.map(lambda x: jnp.stack([x] * P), tree)

    paths = dict(params["paths"])
    paths["backbone"] = rep(fanet_resnet_from_torch(sd, cfg.backbone_cfg,
                                                    "resnet."))
    for k in ("ffm_32", "ffm_16", "ffm_8", "ffm_4"):
        paths[k] = rep(fa_module_from_torch(sd, k + "."))
    paths["head"] = rep(fpn_output_from_torch(sd, "clslayer_8."))
    paths["head_aux"] = rep(fpn_output_from_torch(sd, "clslayer_32."))
    return {"paths": paths, "atn": params["atn"]}


def tdnet_from_torch(sd: dict, cfg) -> dict:
    """Full TDNet checkpoint (Testing/ twin naming) -> stacked pytree.

    cfg: tdnet_tpu.models.tdnet.TDNetConfig.
    """
    import jax
    sd = strip_module_prefix(sd)
    P = cfg.path_num
    bcfg = cfg.backbone_cfg
    subnets = []
    for p in range(P):
        i = p + 1
        sub = {
            "backbone": resnet_from_torch(sd, bcfg, f"pretrained{i}."),
            "psp": pyramid_from_torch(sd, f"psp{i}."),
            "enc": encoding_from_torch(sd, f"enc{i}."),
            "ln": _ln(sd, f"layer_norm{i}.ln"),
            "head": fcn_head_from_torch(sd, f"head{i}."),
        }
        if cfg.aux and f"auxlayer{i}.conv5.0.weight" in sd:
            sub["aux"] = fcn_head_from_torch(sd, f"auxlayer{i}.")
        subnets.append(sub)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *subnets)

    # P=4: atn{p+1}_{s+1}, stored pre-rotated: hop h of path p -> s=(p+h+1)%P
    # P=2: a single hop per path named atn{p+1} (td2_psp50.py:81-82).
    rows = []
    for p in range(P):
        hops = []
        for h in range(cfg.window):
            if P == 2:
                name = f"atn{p + 1}."
            else:
                s = (p + h + 1) % P
                name = f"atn{p + 1}_{s + 1}."
            hops.append(attention_from_torch(sd, name))
        rows.append(jax.tree.map(lambda *ys: jnp.stack(ys), *hops))
    atn = jax.tree.map(lambda *xs: jnp.stack(xs), *rows)
    return {"paths": stacked, "atn": atn}
