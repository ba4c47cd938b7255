"""Clip-forward (training twin) parity vs the reference Training models,
plus the streaming-vs-clip equivalence invariant the reference never
tests (SURVEY.md section 4).
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

TRAIN_REF = "/root/reference/Training"
pytestmark = pytest.mark.skipif(not os.path.isdir(TRAIN_REF),
                                reason="reference repo not mounted")

from tdnet_tpu.models.tdnet import (TDNetConfig, clip_forward, init_cache,
                                    init_tdnet, select_path, stream_step)
from tdnet_tpu.nn.module import Ctx
from tdnet_tpu.utils.torch_import import tdnet_from_torch

IN_HW = (97, 193)


def _bn_with_activation():
    import torch.nn as nn

    class BatchNorm2d(nn.BatchNorm2d):
        def __init__(self, num_features, activation="none"):
            super().__init__(num_features=num_features)
            if activation == "leaky_relu":
                self.activation = nn.LeakyReLU()
            else:
                self.activation = lambda x: x

        def forward(self, x):
            return self.activation(super().forward(x))

    return BatchNorm2d


def _stub_external_deps():
    """The reference package imports torchvision and torch-encoding at
    package-__init__ time; neither is needed for the modules under test."""
    import types
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        tv.models = tvm
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm
    if "encoding" not in sys.modules:
        enc = types.ModuleType("encoding")
        encnn = types.ModuleType("encoding.nn")
        encnn.SyncBatchNorm = _bn_with_activation()
        enc.nn = encnn
        sys.modules["encoding"] = enc
        sys.modules["encoding.nn"] = encnn


def _load_training_model(arch, path_num, backbone):
    _stub_external_deps()
    sys.path.insert(0, TRAIN_REF)
    try:
        import importlib
        mod = importlib.import_module(f"ptsemseg.models.{arch}.{arch}")
        res = importlib.import_module(f"ptsemseg.models.{arch}.resnet")
    finally:
        sys.path.pop(0)
    # bypass the ImageNet download in the reference's pretrained=True path
    block = res.BasicBlock if backbone in ("resnet18", "resnet34") else res.Bottleneck
    layers = {"resnet18": [2, 2, 2, 2], "resnet50": [3, 4, 6, 3]}[backbone]

    def make_resnet(pretrained=False, **kw):
        return res.ResNet(block, layers, **kw)

    setattr(mod, backbone, make_resnet)
    cls = getattr(mod, arch)
    return cls(nclass=19, norm_layer=_bn_with_activation(), backbone=backbone,
               path_num=path_num, loss_fn=None, mdl_path=None, teacher=None)


def _randomize(module, seed):
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            if k.endswith("running_var"):
                sd[k] = torch.rand(v.shape, generator=g) * 0.5 + 0.5
            elif k.endswith("running_mean"):
                sd[k] = torch.randn(v.shape, generator=g) * 0.1
            else:
                sd[k] = torch.randn(v.shape, generator=g) * 0.05
    module.load_state_dict(sd)


def _patch_ln(module, hw):
    import torch.nn as nn
    for _, child in module.named_children():
        if child.__class__.__name__ == "Layer_Norm":
            child.ln = nn.LayerNorm(list(hw))
        else:
            _patch_ln(child, hw)


def _training_sd_to_testing_names(sd, path_num):
    """The training twin stores atn under the same names as testing for
    P=4 (atn{p}_{s}); for P=2 it uses atn1/atn2 like the testing twin.
    Only auxlayers are extra; keep them (importer picks them up)."""
    return {k: np.asarray(v.detach().numpy()) for k, v in sd.items()
            if not k.startswith("KLD")}


@pytest.mark.parametrize("arch,path_num,backbone,pool_before", [
    pytest.param("td4_psp", 4, "resnet18", True, marks=pytest.mark.slow),
    ("td2_psp", 2, "resnet50", False),
])
def test_clip_forward_parity(arch, path_num, backbone, pool_before):
    ref = _load_training_model(arch, path_num, backbone)
    _randomize(ref, seed=11)
    cfg = TDNetConfig(nclass=19, backbone=backbone, path_num=path_num,
                      in_size=IN_HW, kv_stride=3, pool_before_proj=pool_before,
                      aux=True)
    _patch_ln(ref, cfg.feat_hw)
    g = torch.Generator().manual_seed(5)
    for m in ref.modules():
        if isinstance(m, torch.nn.LayerNorm):
            with torch.no_grad():
                m.weight.copy_(torch.rand(m.weight.shape, generator=g) + 0.5)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)
    ref.eval()

    sd = _training_sd_to_testing_names(ref.state_dict(), path_num)
    params = tdnet_from_torch(sd, cfg)

    rng = np.random.RandomState(17)
    frames = rng.randn(path_num, 1, 3, *IN_HW).astype(np.float32) * 0.5
    f_list = [torch.from_numpy(f) for f in frames]
    frames_j = jnp.asarray(np.transpose(frames, (0, 1, 3, 4, 2)))

    fwd = jax.jit(lambda pp, fr, pid: clip_forward(pp, fr, pid, cfg,
                                                   Ctx(train=False))["out"])
    with torch.no_grad():
        for pos_id in range(path_num):
            ref_out = ref(f_list, pos_id=pos_id).numpy()
            got = np.transpose(np.asarray(fwd(params, frames_j, pos_id)),
                               (0, 3, 1, 2))
            np.testing.assert_allclose(
                got, ref_out, atol=2e-3, rtol=1e-3,
                err_msg=f"{arch} pos_id {pos_id} diverged")


def test_streaming_equals_clip():
    """The invariant tying the Training/ and Testing/ twins together:
    streaming over frames [f1..fP] (subnets in rotation) produces the same
    logits for fP as the stateless clip forward with pos_id = p."""
    cfg = TDNetConfig(nclass=19, backbone="resnet18", path_num=4,
                      in_size=IN_HW, kv_stride=3, pool_before_proj=True,
                      aux=False)
    params = init_tdnet(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(23)
    frames = jnp.asarray(rng.randn(4, 1, *IN_HW, 3).astype(np.float32) * 0.5)

    pos_id = 2  # current subnet for frame f4
    clip_out = clip_forward(params, frames, pos_id, cfg, Ctx(train=False))["out"]

    cache = init_cache(cfg, batch=1)
    out = None
    for j in range(4):
        p = (pos_id + 1 + j) % 4 if j < 3 else pos_id
        pp = select_path(params["paths"], p)
        ap = select_path(params["atn"], p)
        out, cache = stream_step(pp, ap, cache, frames[j], cfg,
                                 cfg.psp_pid(p), Ctx(train=False))
    np.testing.assert_allclose(np.asarray(out), np.asarray(clip_out),
                               atol=1e-4, rtol=1e-4)
