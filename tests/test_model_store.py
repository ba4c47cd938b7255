"""Model store + optimizer registry + scheduler components."""

import hashlib
import os

import numpy as np
import torch

import jax.numpy as jnp


def test_model_store(tmp_path, monkeypatch):
    import sys
    from tests.test_clip_parity import _stub_external_deps
    _stub_external_deps()
    sys.path.insert(0, "/root/reference/Training")
    try:
        import importlib
        res = importlib.import_module("ptsemseg.models.td4_psp.resnet")
    finally:
        sys.path.pop(0)
    model = res.ResNet(res.BasicBlock, [2, 2, 2, 2], dilated=True,
                       multi_grid=True, deep_base=False,
                       norm_layer=torch.nn.BatchNorm2d)
    sd = model.state_dict()
    cache = tmp_path / "models"
    cache.mkdir()
    path = cache / "resnet18-tmp.pth"
    torch.save(sd, str(path))
    # name the file with its real sha1 prefix so verification passes
    sha = hashlib.sha1(open(path, "rb").read()).hexdigest()[:8]
    final = cache / f"resnet18-{sha}.pth"
    os.rename(path, final)

    from tdnet_tpu.nn.resnet import resnet18
    from tdnet_tpu.utils import model_store
    monkeypatch.setitem(model_store.KNOWN_DIGESTS, "resnet18", ("sha1", sha))
    found = model_store.get_model_file("resnet18", root=str(cache))
    assert found == str(final)
    bb = model_store.load_imagenet_backbone("resnet18", resnet18(),
                                            root=str(cache))
    assert bb is not None
    w = np.asarray(bb["stem"]["conv0"]["w"])
    ref = sd["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(w, ref, atol=0)
    # miss path: unknown name -> None
    assert model_store.get_model_file("resnet999", root=str(cache)) is None


def test_model_store_download(tmp_path, monkeypatch):
    """Download-on-miss (reference model_store.py:53-83) against a
    file:// mirror: zoo .zip path, torchvision .pth path, and the
    graceful no-egress miss."""
    import io
    import warnings
    import zipfile

    from tdnet_tpu.utils import model_store

    # encoding-zoo path: {repo}encoding/models/resnet50-{sh8}.zip
    payload = b"fake resnet50s checkpoint bytes"
    sha = hashlib.sha1(payload).hexdigest()
    repo = tmp_path / "mirror"
    (repo / "encoding" / "models").mkdir(parents=True)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(f"resnet50-{sha[:8]}.pth", payload)
    (repo / "encoding" / "models" / f"resnet50-{sha[:8]}.zip").write_bytes(
        buf.getvalue())
    cache = tmp_path / "cache"
    cache.mkdir()
    monkeypatch.setitem(model_store.KNOWN_DIGESTS, "resnet50s", ("sha1", sha))
    monkeypatch.setenv("ENCODING_REPO", f"file://{repo}/")
    got = model_store.get_model_file("resnet50s", root=str(cache))
    assert got == str(cache / f"resnet50s-{sha[:8]}.pth")
    assert open(got, "rb").read() == payload
    # second call: cache hit, no re-download (mirror can vanish)
    monkeypatch.setenv("ENCODING_REPO", f"file://{tmp_path}/nowhere/")
    assert model_store.get_model_file("resnet50s", root=str(cache)) == got

    # torchvision path: flat .pth with sha256-prefix filename convention
    tv = b"fake resnet18 torchvision bytes"
    sha256 = hashlib.sha256(tv).hexdigest()
    (repo / f"resnet18-{sha256[:8]}.pth").write_bytes(tv)
    monkeypatch.setattr(model_store, "TORCHVISION_URL",
                        f"file://{repo}/{{name}}-{{sha}}.pth")
    monkeypatch.setitem(model_store.KNOWN_DIGESTS, "resnet18", ("sha256", sha256[:8]))
    cache2 = tmp_path / "cache2"
    cache2.mkdir()
    got2 = model_store.get_model_file("resnet18", root=str(cache2))
    assert got2 is not None and open(got2, "rb").read() == tv
    # digest algorithms don't cross: a sha256 prefix must NOT verify
    # under the sha1 check (and vice versa) — each entry is tagged
    assert not model_store.check_sha1(got2, sha256[:8], "sha1")
    assert model_store.check_sha1(got2, sha256[:8], "sha256")

    # hash mismatch -> rejected, warned, miss
    monkeypatch.setitem(model_store.KNOWN_DIGESTS, "resnet18", ("sha256", "0" * 64))
    cache3 = tmp_path / "cache3"
    cache3.mkdir()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert model_store.get_model_file("resnet18", root=str(cache3)) is None
    assert any("download failed" in str(x.message) for x in w)

    # no egress / unreachable mirror -> graceful None
    monkeypatch.setitem(model_store.KNOWN_DIGESTS, "resnet34", ("sha256", "12345678"))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        monkeypatch.setattr(model_store, "TORCHVISION_URL",
                            f"file://{tmp_path}/missing/{{name}}-{{sha}}.pth")
        assert model_store.get_model_file("resnet34", root=str(cache3)) is None


def test_optimizer_registry():
    import optax
    from tdnet_tpu.train.optim import get_optimizer
    params = {"w": jnp.ones((4, 3)), "b": jnp.zeros((3,))}
    grads = {"w": jnp.ones((4, 3)), "b": jnp.ones((3,))}
    for name in ("sgd", "adam", "adamax", "adadelta", "adagrad", "rmsprop"):
        tx = get_optimizer(name)
        st = tx.init(params)
        upd, _ = tx.update(grads, st, params)
        out = optax.apply_updates(params, upd)
        assert np.isfinite(np.asarray(out["w"])).all(), name


def test_scheduler_registry():
    from tdnet_tpu.train.schedulers import (constant_lr, get_scheduler,
                                            polynomial_lr, warmup_lr)
    assert abs(float(constant_lr(0.1)(100)) - 0.1) < 1e-6
    poly = polynomial_lr(0.1, max_iter=100)
    assert abs(float(poly(0)) - 0.1) < 1e-6
    assert float(poly(100)) == 0.0
    warm = warmup_lr(constant_lr(0.1), warmup_iters=10, mode="linear",
                     gamma=0.2)
    assert abs(float(warm(0)) - 0.02) < 1e-6
    assert abs(float(warm(20)) - 0.1) < 1e-6
    assert get_scheduler(None) is None
