"""Pallas fused deep-stem tail vs the unfused eval dataflow.

kernels/fused_stem.py computes conv1+BN+ReLU -> conv2+BN+ReLU ->
maxpool(3,2,1) of the deep-base stem (reference Testing/model/pspnet/
resnet.py:122-134) in one VMEM pass. These tests pin (a) the kernel
against the op-by-op eval path at several geometries incl. odd edges
(interpret mode — the compiled path is exercised on the real TPU by
bench.py and `cli.test --stem_impl fused`), and (b) the apply_resnet
integration: Ctx(stem_impl="fused") must be numerically indistinguishable
(float-sum order) from the default path, and must silently fall back for
non-deep-base backbones and in train mode.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdnet_tpu.nn.module import Ctx


def _bn(rng, c):
    return {"scale": jnp.asarray(rng.rand(c).astype(np.float32) + 0.5),
            "bias": jnp.asarray(rng.randn(c).astype(np.float32)),
            "mean": jnp.asarray(rng.randn(c).astype(np.float32)),
            "var": jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)}


@pytest.mark.parametrize("hw", [(65, 129), (127, 255), (64, 96)])
def test_fused_stem_tail_matches_ops(hw, monkeypatch):
    from tdnet_tpu.kernels import fused_stem as fs
    from tdnet_tpu.ops import conv2d
    from tdnet_tpu.ops.norm import batch_norm
    from tdnet_tpu.ops.pool import max_pool

    orig = fs.pl.pallas_call
    monkeypatch.setattr(fs.pl, "pallas_call",
                        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, *hw, 64).astype(np.float32))
    w1 = jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(3, 3, 64, 128).astype(np.float32) * 0.1)
    bn1, bn2 = _bn(rng, 64), _bn(rng, 128)

    y = conv2d(x, w1, padding=1)
    y = batch_norm(y, bn1, train=False, activation="relu")
    y = conv2d(y, w2, padding=1)
    y = batch_norm(y, bn2, train=False, activation="relu")
    ref = max_pool(y, 3, 2, 1)

    out = fs.fused_stem_tail(x, w1, fs.fold_bn_eval(bn1),
                             w2, fs.fold_bn_eval(bn2))
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_apply_resnet_fused_stem_matches_default(monkeypatch):
    from tdnet_tpu.kernels import fused_stem as fs
    from tdnet_tpu.nn.resnet import apply_resnet, init_resnet, resnet50

    orig = fs.pl.pallas_call
    monkeypatch.setattr(fs.pl, "pallas_call",
                        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))
    cfg = resnet50()
    params = init_resnet(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 65, 129, 3))
    c3_r, c4_r, _ = apply_resnet(params, x, cfg, Ctx(train=False))
    c3_f, c4_f, _ = apply_resnet(params, x, cfg,
                                 Ctx(train=False, stem_impl="fused"))
    np.testing.assert_allclose(np.asarray(c4_f), np.asarray(c4_r),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(c3_f), np.asarray(c3_r),
                               atol=1e-3, rtol=1e-3)


def test_fused_stem_falls_back_when_unsupported():
    """No Pallas call may be emitted for non-deep-base backbones or in
    train mode — those must keep the reference dataflow bit-for-bit."""
    from tdnet_tpu.nn.resnet import apply_resnet, init_resnet, resnet18

    cfg = resnet18()   # single 7x7 stem: "fused" degrades to "oct"
    params = init_resnet(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 65, 129, 3))
    a, _, _ = apply_resnet(params, x, cfg, Ctx(train=False,
                                               stem_impl="fused"))
    b, _, _ = apply_resnet(params, x, cfg, Ctx(train=False,
                                               stem_impl="oct"))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    from tdnet_tpu.nn.resnet import resnet50
    cfg = resnet50()   # deep-base, but train mode: reference dataflow
    params = init_resnet(jax.random.PRNGKey(0), cfg)
    ctx_f = Ctx(train=True, rng=jax.random.PRNGKey(2), stem_impl="fused")
    ctx_x = Ctx(train=True, rng=jax.random.PRNGKey(2), stem_impl="xla")
    ya = apply_resnet(params, x, cfg, ctx_f)[1]
    yb = apply_resnet(params, x, cfg, ctx_x)[1]
    np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb))
