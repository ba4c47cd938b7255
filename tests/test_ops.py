"""Golden parity tests for the core numerics kit vs PyTorch CPU.

The reference is 100% PyTorch, so torch (CPU) is the executable spec for
the primitive semantics: align-corners bilinear, adaptive avg-pool,
BatchNorm, spatial LayerNorm, conv, attention.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tdnet_tpu import ops


def to_nhwc(t):
    return np.transpose(t, (0, 2, 3, 1))


def to_nchw(a):
    return np.transpose(np.asarray(a), (0, 3, 1, 2))


@pytest.mark.parametrize("in_hw,out_hw", [
    ((97, 193), (769, 1537)),
    ((1, 1), (97, 193)),
    ((2, 2), (97, 193)),
    ((3, 3), (97, 193)),
    ((6, 6), (97, 193)),
    ((13, 29), (7, 11)),   # downsample
])
def test_resize_bilinear_align_corners(in_hw, out_hw):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, *in_hw).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), out_hw, mode="bilinear",
                        align_corners=True).numpy()
    got = to_nchw(ops.resize_bilinear(jnp.asarray(to_nhwc(x)), out_hw))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("out_size", [1, 2, 3, 6])
@pytest.mark.parametrize("in_hw", [(97, 193), (33, 65), (8, 8)])
def test_adaptive_avg_pool(out_size, in_hw):
    rng = np.random.RandomState(1)
    x = rng.randn(2, 5, *in_hw).astype(np.float32)
    ref = F.adaptive_avg_pool2d(torch.from_numpy(x), out_size).numpy()
    got = to_nchw(ops.adaptive_avg_pool(jnp.asarray(to_nhwc(x)), out_size))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("in_hw", [(97, 193), (33, 65), (8, 8)])
def test_adaptive_avg_pool_multi(in_hw):
    """One-pass pyramid pool matches torch per-bin adaptive pooling."""
    rng = np.random.RandomState(7)
    x = rng.randn(2, 5, *in_hw).astype(np.float32)
    outs = ops.adaptive_avg_pool_multi(jnp.asarray(to_nhwc(x)), (1, 2, 3, 6))
    for s, got in zip((1, 2, 3, 6), outs):
        ref = F.adaptive_avg_pool2d(torch.from_numpy(x), s).numpy()
        np.testing.assert_allclose(to_nchw(got), ref, atol=1e-5, rtol=1e-5)


def test_grid_subsample_matches_stride_maxpool():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 4, 97, 193).astype(np.float32)
    for s in (3, 4):
        ref = torch.nn.MaxPool2d(kernel_size=1, stride=s)(torch.from_numpy(x)).numpy()
        got = to_nchw(ops.grid_subsample(jnp.asarray(to_nhwc(x)), s))
        np.testing.assert_array_equal(got, ref)


def test_max_pool_stem():
    rng = np.random.RandomState(3)
    x = rng.randn(1, 4, 100, 101).astype(np.float32)
    ref = torch.nn.MaxPool2d(3, 2, padding=1)(torch.from_numpy(x)).numpy()
    got = to_nchw(ops.max_pool(jnp.asarray(to_nhwc(x)), 3, 2, 1))
    np.testing.assert_allclose(got, ref, atol=0, rtol=0)


def test_batch_norm_eval_and_leaky_relu():
    rng = np.random.RandomState(4)
    c = 7
    x = rng.randn(2, c, 9, 11).astype(np.float32)
    bn = torch.nn.BatchNorm2d(c).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(rng.rand(c).astype(np.float32) + 0.5))
        bn.bias.copy_(torch.from_numpy(rng.randn(c).astype(np.float32)))
        bn.running_mean.copy_(torch.from_numpy(rng.randn(c).astype(np.float32)))
        bn.running_var.copy_(torch.from_numpy(rng.rand(c).astype(np.float32) + 0.5))
    params = {
        "scale": jnp.asarray(bn.weight.detach().numpy()),
        "bias": jnp.asarray(bn.bias.detach().numpy()),
        "mean": jnp.asarray(bn.running_mean.numpy()),
        "var": jnp.asarray(bn.running_var.numpy()),
    }
    ref = bn(torch.from_numpy(x)).detach().numpy()
    got = to_nchw(ops.batch_norm(jnp.asarray(to_nhwc(x)), params, train=False))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

    ref_lr = torch.nn.LeakyReLU()(torch.from_numpy(ref)).numpy()
    got_lr = to_nchw(ops.batch_norm(jnp.asarray(to_nhwc(x)), params, train=False,
                                    activation="leaky_relu"))
    np.testing.assert_allclose(got_lr, ref_lr, atol=1e-5, rtol=1e-5)


def test_batch_norm_train_stats():
    rng = np.random.RandomState(5)
    c = 3
    x = rng.randn(4, c, 5, 6).astype(np.float32)
    bn = torch.nn.BatchNorm2d(c).train()
    ref = bn(torch.from_numpy(x)).detach().numpy()
    params = {
        "scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
        "mean": jnp.zeros((c,)), "var": jnp.ones((c,)),
    }
    got, new_stats = ops.batch_norm(jnp.asarray(to_nhwc(x)), params, train=True)
    np.testing.assert_allclose(to_nchw(got), ref, atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(new_stats["mean"]),
                               bn.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_stats["var"]),
                               bn.running_var.numpy(), atol=1e-5)


def test_layer_norm_2d():
    rng = np.random.RandomState(6)
    h, w = 13, 17
    x = rng.randn(2, 5, h, w).astype(np.float32)
    ln = torch.nn.LayerNorm([h, w])
    with torch.no_grad():
        ln.weight.copy_(torch.from_numpy(rng.rand(h, w).astype(np.float32) + 0.5))
        ln.bias.copy_(torch.from_numpy(rng.randn(h, w).astype(np.float32)))
    ref = ln(torch.from_numpy(x)).detach().numpy()
    params = {"scale": jnp.asarray(ln.weight.detach().numpy()),
              "bias": jnp.asarray(ln.bias.detach().numpy())}
    got = to_nchw(ops.layer_norm_2d(jnp.asarray(to_nhwc(x)), params))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("stride,padding,dilation", [(1, 0, 1), (2, 1, 1), (1, 2, 2), (1, 4, 4)])
def test_conv2d(stride, padding, dilation):
    rng = np.random.RandomState(7)
    x = rng.randn(2, 4, 17, 19).astype(np.float32)
    w = rng.randn(6, 4, 3, 3).astype(np.float32)  # OIHW
    b = rng.randn(6).astype(np.float32)
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
                   stride=stride, padding=padding, dilation=dilation).numpy()
    w_hwio = np.transpose(w, (2, 3, 1, 0))
    got = to_nchw(ops.conv2d(jnp.asarray(to_nhwc(x)), jnp.asarray(w_hwio),
                             jnp.asarray(b), stride=stride, padding=padding,
                             dilation=dilation))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_scaled_dot_attention():
    rng = np.random.RandomState(8)
    q = rng.randn(2, 50, 8).astype(np.float32)
    k = rng.randn(2, 20, 8).astype(np.float32)
    v = rng.randn(2, 20, 16).astype(np.float32)
    temp = np.sqrt(8.0)
    attn = torch.bmm(torch.from_numpy(q), torch.from_numpy(k).transpose(1, 2)) / temp
    attn = torch.softmax(attn, dim=2)
    ref = torch.bmm(attn, torch.from_numpy(v)).numpy()
    got = np.asarray(ops.scaled_dot_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), temperature=temp))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)


def test_conv2d_stem_oct_exact():
    """Octet im2col stem == direct stride-2 conv (same products, sum
    order only) for the 7x7 r18 stem and the 3x3 deep-base stem, on
    awkward odd geometries."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tdnet_tpu.ops.conv import conv2d, conv2d_stem_oct

    rng = np.random.RandomState(0)
    for (h, w_), k, pad, cout in [((97, 193), 7, 3, 64), ((65, 129), 3, 1, 64),
                                  ((96, 130), 7, 3, 32)]:
        x = jnp.asarray(rng.randn(2, h, w_, 3).astype(np.float32))
        w = jnp.asarray(rng.randn(k, k, 3, cout).astype(np.float32) * 0.1)
        want = conv2d(x, w, stride=2, padding=pad)
        got = conv2d_stem_oct(x, w, padding=pad)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)


def test_stream_step_stem_oct_matches_xla():
    """In-model equivalence of the oct stem: full streaming step output
    identical (f32, sum-order tolerance) with stem_impl oct vs xla."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tdnet_tpu.models.tdnet import (TDNetConfig, init_cache, init_tdnet,
                                        select_path, stream_step)
    from tdnet_tpu.nn.module import Ctx

    cfg = TDNetConfig(nclass=19, backbone="resnet18", path_num=4,
                      in_size=(97, 193), kv_stride=4, pool_before_proj=True,
                      aux=False)
    params = init_tdnet(jax.random.PRNGKey(3), cfg)
    pp = select_path(params["paths"], 0)
    ap = select_path(params["atn"], 0)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 97, 193, 3), jnp.float32)
    outs = {}
    for impl in ("xla", "oct"):
        out, _ = stream_step(pp, ap, init_cache(cfg, batch=1), x, cfg,
                             cfg.psp_pid(0), Ctx(train=False, stem_impl=impl))
        outs[impl] = np.asarray(out)
    np.testing.assert_allclose(outs["oct"], outs["xla"], atol=1e-4, rtol=1e-4)
