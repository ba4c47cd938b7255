"""PSPNet-101 baseline parity vs the reference Testing model, plus
CamVid / NYUDv2 loader smoke tests and device-preprocess parity."""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF = "/root/reference/Testing/model"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

from tests.test_reference_parity import _load_ref_module, _randomize

IN_HW = (97, 193)


def test_psp101_baseline_parity():
    mod = _load_ref_module("pspnet")
    ref = mod.pspnet(nclass=19, backbone="resnet101", model_path=None)
    _randomize(ref, seed=77)
    ref.eval()

    from tdnet_tpu.models import PSPNetConfig, apply_pspnet
    from tdnet_tpu.nn.module import Ctx
    from tdnet_tpu.utils.torch_import import psp_head_from_torch, resnet_from_torch

    cfg = PSPNetConfig(nclass=19, backbone="resnet101", in_size=IN_HW)
    sd = {k: np.asarray(v.detach().numpy()) for k, v in ref.state_dict().items()}
    params = {"backbone": resnet_from_torch(sd, cfg.backbone_cfg, "pretrained."),
              "head": psp_head_from_torch(sd, "head.")}

    rng = np.random.RandomState(1)
    x = rng.randn(1, 3, *IN_HW).astype(np.float32) * 0.5
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()
    got, _ = apply_pspnet(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                          cfg, Ctx(train=False))
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               ref_out, atol=2e-3, rtol=1e-3)


def _write_png(path, arr):
    import imageio.v2 as imageio
    imageio.imwrite(path, arr)


def test_camvid_loader(tmp_path):
    from tdnet_tpu.data.camvid import CamVidClips
    rng = np.random.RandomState(0)
    root = str(tmp_path)
    os.makedirs(f"{root}/train")
    os.makedirs(f"{root}/trainannot")
    os.makedirs(f"{root}/train_sequence")
    for i in range(3):
        fid = 6690 + 30 * i
        name = f"0001TP_{fid:06d}.png"
        _write_png(f"{root}/train/{name}",
                   rng.randint(0, 255, (72, 96, 3), np.uint8))
        lbl = rng.randint(0, 12, (72, 96)).astype(np.uint8)
        _write_png(f"{root}/trainannot/{name}", lbl)
        for back in range(0, 5):
            _write_png(f"{root}/train_sequence/0001TP_{fid - back:06d}.png",
                       rng.randint(0, 255, (72, 96, 3), np.uint8))
    ds = CamVidClips(root, split="train", path_num=2, seed=0, interval=2)
    clip, lbl = ds[1]
    assert len(clip) == 2 and clip[0].shape == (72, 96, 3)
    assert lbl.shape == (72, 96)
    assert set(np.unique(lbl)).issubset(set(range(11)) | {250})


def test_nyudv2_loader_static_fallback(tmp_path):
    from tdnet_tpu.data.nyudv2 import NYUDv2Clips
    rng = np.random.RandomState(0)
    root = str(tmp_path)
    os.makedirs(f"{root}/images/train")
    os.makedirs(f"{root}/labels/train")
    for i in range(2):
        name = f"{i:04d}.png"
        _write_png(f"{root}/images/train/{name}",
                   rng.randint(0, 255, (60, 80, 3), np.uint8))
        _write_png(f"{root}/labels/train/{name}",
                   rng.randint(0, 41, (60, 80)).astype(np.uint8))
    ds = NYUDv2Clips(root, split="train", path_num=4, seed=0)
    clip, lbl = ds[0]  # no sequence dir -> static-clip fallback
    assert len(clip) == 4
    np.testing.assert_array_equal(clip[0], clip[3])
    assert set(np.unique(lbl)).issubset(set(range(40)) | {250})


def test_device_preprocess_matches_host():
    from tdnet_tpu.data.prefetch import make_device_preprocess
    from tdnet_tpu.data.streaming import normalize_frame
    from tdnet_tpu.ops import resize_bilinear
    rng = np.random.RandomState(2)
    raw = rng.randint(0, 255, (1, 64, 96, 3), np.uint8)
    pre = make_device_preprocess((32, 48), dtype=jnp.float32)
    got = np.asarray(pre(jnp.asarray(raw)))
    want = np.asarray(resize_bilinear(
        jnp.asarray(normalize_frame(raw[0])[None]), (32, 48)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_synthetic_demo_clip(tmp_path):
    """The repo-local demo fixture (reference analog: Testing/data/vid1)
    renders deterministically and streams through FrameSource."""
    from tdnet_tpu.data.streaming import FrameSource
    from tdnet_tpu.data.synthetic import make_demo_clip, render_frame

    a = render_frame(3)
    b = render_frame(3)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (256, 512, 3) and a.dtype == np.uint8
    assert not np.array_equal(render_frame(0), render_frame(5))  # motion

    paths = make_demo_clip(str(tmp_path / "clip"), n_frames=4)
    assert len(paths) == 4 and all(os.path.exists(p) for p in paths)
    src = FrameSource(str(tmp_path / "clip"), (64, 128))
    frames = list(src)
    assert len(frames) == 4 and frames[0][0].shape == (1, 64, 128, 3)
