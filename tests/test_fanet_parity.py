"""TD2-FANet parity vs the reference td2_fa (pdb trap bypassed)."""

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

from tests.test_clip_parity import (_bn_with_activation, _patch_ln,
                                    _randomize, _stub_external_deps)

IN_HW = (96, 192)  # 1/4 grid: 24x48


def _load_ref_td2fa():
    _stub_external_deps()
    import pdb
    orig = pdb.set_trace
    pdb.set_trace = lambda *a, **k: None  # reference td2_fa.py:80 trap
    sys.path.insert(0, TRAIN_REF)
    try:
        import importlib
        res_mod = importlib.import_module("ptsemseg.models.td2_fanet.resnet")
        res_mod.model_zoo.load_url = lambda *a, **k: {}  # no egress
        res_mod.ResNet.init_weight = lambda self, sd=None: None
        mod = importlib.import_module("ptsemseg.models.td2_fanet.td2_fa")
        model = mod.td2_fa(nclass=19, backbone="resnet18",
                           norm_layer=_bn_with_activation(), loss_fn=None,
                           path_num=2, mdl_path=None, teacher=None)
    finally:
        sys.path.pop(0)
        pdb.set_trace = orig
    return model


def test_td2_fa_clip_parity():
    ref = _load_ref_td2fa()
    _randomize(ref, seed=31)

    from tdnet_tpu.models.fanet_td import FATDConfig, fa_clip_forward
    from tdnet_tpu.nn.module import Ctx
    from tdnet_tpu.utils.torch_import import fatd_from_torch

    cfg = FATDConfig(nclass=19, backbone="resnet18", path_num=2,
                     in_size=IN_HW)
    _patch_ln(ref, cfg.feat_hw)
    g = torch.Generator().manual_seed(8)
    for m in ref.modules():
        if isinstance(m, torch.nn.LayerNorm):
            with torch.no_grad():
                m.weight.copy_(torch.rand(m.weight.shape, generator=g) + 0.5)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)
    ref.eval()

    sd = {k: np.asarray(v.detach().numpy()) for k, v in ref.state_dict().items()
          if not k.startswith("KLD")}
    params = fatd_from_torch(sd, cfg)

    rng = np.random.RandomState(41)
    frames = rng.randn(2, 1, 3, *IN_HW).astype(np.float32) * 0.5
    f_list = [torch.from_numpy(f) for f in frames]
    frames_j = jnp.asarray(np.transpose(frames, (0, 1, 3, 4, 2)))

    with torch.no_grad():
        for pos_id in range(2):
            ref_out = ref(f_list, pos_id=pos_id).numpy()
            got = fa_clip_forward(params, frames_j, pos_id, cfg,
                                  Ctx(train=False))["out"]
            got = np.transpose(np.asarray(got), (0, 3, 1, 2))
            np.testing.assert_allclose(got, ref_out, atol=2e-3, rtol=1e-3,
                                       err_msg=f"td2_fa pos_id {pos_id}")


def test_td2_fa_stream_equals_clip():
    from tdnet_tpu.models.fanet_td import (FATDConfig, fa_clip_forward,
                                           fa_stream_step, init_fa_cache,
                                           init_fatd)
    from tdnet_tpu.models.tdnet import select_path
    from tdnet_tpu.nn.module import Ctx

    cfg = FATDConfig(nclass=19, backbone="resnet18", path_num=2,
                     in_size=IN_HW)
    params = init_fatd(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(5)
    frames = jnp.asarray(rng.randn(2, 1, *IN_HW, 3).astype(np.float32) * 0.5)

    pos_id = 1
    clip_out = fa_clip_forward(params, frames, pos_id, cfg,
                               Ctx(train=False))["out"]
    cache = init_fa_cache(cfg)
    out = None
    for j in range(2):
        p = (pos_id + 1 + j) % 2 if j < 1 else pos_id
        out, cache = fa_stream_step(select_path(params["paths"], p),
                                    select_path(params["atn"], p),
                                    cache, frames[j], cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(clip_out),
                               atol=1e-4, rtol=1e-4)
