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


def test_conv2d_mm_wgrad_matches_autodiff():
    """conv2d_mm_wgrad: forward identical to conv2d; dx/dw match XLA's
    native conv gradients (f32, tight tolerance — same products, only
    the wgrad summation order differs)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tdnet_tpu.ops.conv import conv2d, conv2d_mm_wgrad

    for (ci, co, d, p) in [(16, 24, 2, 2), (8, 8, 1, 1), (8, 16, 4, 4)]:
        kx, kw, kdy = jax.random.split(jax.random.PRNGKey(ci + d), 3)
        x = jax.random.normal(kx, (2, 19, 23, ci), jnp.float32)
        w = jax.random.normal(kw, (3, 3, ci, co), jnp.float32) * 0.1

        y0 = conv2d(x, w, padding=p, dilation=d)
        y1 = conv2d_mm_wgrad(x, w, p, d)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   atol=1e-6, rtol=1e-6)

        dy = jax.random.normal(kdy, y0.shape, jnp.float32)
        g0 = jax.grad(lambda x_, w_: jnp.vdot(
            conv2d(x_, w_, padding=p, dilation=d), dy), argnums=(0, 1))(x, w)
        g1 = jax.grad(lambda x_, w_: jnp.vdot(
            conv2d_mm_wgrad(x_, w_, p, d), dy), argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g0[0]),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g0[1]),
                                   atol=1e-3, rtol=1e-4)


def test_conv3x3_mixed_policy_routes_by_width():
    """conv_wgrad='mixed': narrow (ci<=128) convs take the fully
    matmul form, wide ones the XLA fwd/dgrad + tap wgrad — and both
    match the native autodiff."""
    from tdnet_tpu.nn.module import Ctx
    from tdnet_tpu.nn.resnet import _conv3x3
    from tdnet_tpu.ops.conv import conv2d

    ctx = Ctx(train=True, conv_wgrad="mixed")
    for ci, d in [(64, 1), (512, 4)]:
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 17, 33, ci))
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, ci, ci)) * 0.05
        dy = jax.random.normal(jax.random.PRNGKey(2), (1, 17, 33, ci))

        def loss(fn):
            return jax.grad(lambda x_, w_: jnp.sum(
                fn(x_, w_) * dy), argnums=(0, 1))(x, w)

        y0 = conv2d(x, w, padding=d, dilation=d)
        y1 = _conv3x3(x, w, ctx, stride=1, padding=d, dilation=d)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   atol=1e-4, rtol=1e-4)
        g0 = loss(lambda a, b: conv2d(a, b, padding=d, dilation=d))
        g1 = loss(lambda a, b: _conv3x3(a, b, ctx, stride=1,
                                        padding=d, dilation=d))
        for a, b, tol in [(g1[0], g0[0], 1e-4), (g1[1], g0[1], 1e-3)]:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=tol, rtol=1e-4)


def test_conv2d_mm_matches_autodiff():
    """conv2d_mm (fully matmul-form conv): forward, dx and dw all match
    XLA's native conv and its autodiff gradients (f32, tight tol)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tdnet_tpu.ops.conv import conv2d, conv2d_mm

    for (ci, co, d, p) in [(16, 24, 2, 2), (8, 8, 1, 1), (8, 16, 4, 4)]:
        kx, kw, kdy = jax.random.split(jax.random.PRNGKey(3 * ci + d), 3)
        x = jax.random.normal(kx, (2, 19, 23, ci), jnp.float32)
        w = jax.random.normal(kw, (3, 3, ci, co), jnp.float32) * 0.1

        y0 = conv2d(x, w, padding=p, dilation=d)
        y1 = conv2d_mm(x, w, p, d)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   atol=2e-5, rtol=2e-5)

        dy = jax.random.normal(kdy, y0.shape, jnp.float32)
        g0 = jax.grad(lambda x_, w_: jnp.vdot(
            conv2d(x_, w_, padding=p, dilation=d), dy), argnums=(0, 1))(x, w)
        g1 = jax.grad(lambda x_, w_: jnp.vdot(
            conv2d_mm(x_, w_, p, d), dy), argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g0[0]),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g0[1]),
                                   atol=1e-3, rtol=1e-4)


def test_max_pool_backward_matches_torch_with_ties():
    """The (3,2,1) stem pool's gather-form backward routes each window's
    gradient to the FIRST maximum in row-major order — torch semantics —
    including tie-heavy post-ReLU inputs, odd/even geometry and the
    padding ring."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch
    from tdnet_tpu.ops.pool import max_pool

    rng = np.random.RandomState(7)
    for (h, w) in [(15, 21), (16, 22), (97, 193)]:
        x = np.round(rng.randn(2, h, w, 6) * 2) / 2   # force exact ties
        x[x < 0] = 0.0                                # post-ReLU zeros
        x = x.astype(np.float32)
        oh, ow = (h - 1) // 2 + 1, (w - 1) // 2 + 1
        dy = rng.randn(2, oh, ow, 6).astype(np.float32)

        y, vjp = jax.vjp(lambda a: max_pool(a, 3, 2, 1), jnp.asarray(x))
        dx, = vjp(jnp.asarray(dy))

        xt = torch.tensor(x.transpose(0, 3, 1, 2), requires_grad=True)
        yt = torch.nn.functional.max_pool2d(xt, 3, 2, 1)
        yt.backward(torch.tensor(dy.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(
            np.asarray(y), yt.detach().numpy().transpose(0, 2, 3, 1),
            atol=0, rtol=0)
        np.testing.assert_allclose(
            np.asarray(dx), xt.grad.numpy().transpose(0, 2, 3, 1),
            atol=1e-5, rtol=1e-5)


def test_batch_norm_fused_vjp_matches_autodiff():
    """Train-mode BN: the 2-pass custom-VJP path (fused=True, default)
    must match the naive autodiff formulation for y, running stats and
    all gradients — including the batch-stat chain terms in dx — for
    every activation, and under shard_map SyncBN (axis_name psums)."""
    import functools
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P
    from tdnet_tpu.ops.norm import batch_norm, init_batch_norm

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(4, 9, 11, 16).astype(np.float32))
    dy = jnp.asarray(rng.randn(4, 9, 11, 16).astype(np.float32))
    p = init_batch_norm(16)
    p = {**p, "scale": jnp.asarray(rng.rand(16).astype(np.float32) + 0.5),
         "bias": jnp.asarray(rng.randn(16).astype(np.float32) * 0.1)}

    for act in (None, "relu", "leaky_relu"):
        def grads(fused):
            def loss(x_, s_, b_):
                y, ns = batch_norm(x_, {**p, "scale": s_, "bias": b_},
                                   train=True, activation=act, fused=fused)
                return jnp.vdot(y, dy), (y, ns)
            return jax.grad(loss, argnums=(0, 1, 2), has_aux=True)(
                x, p["scale"], p["bias"])
        (dx0, ds0, db0), (y0, ns0) = grads(False)
        (dx1, ds1, db1), (y1, ns1) = grads(True)
        for a, b in [(y0, y1), (dx0, dx1), (ds0, ds1), (db0, db1),
                     (ns0["mean"], ns1["mean"]), (ns0["var"], ns1["var"])]:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5, rtol=2e-5)

    # SyncBN: batch sharded over 4 devices; fused-vjp grads must equal
    # the single-device full-batch result
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("d",))

    def sharded_loss(x_, s_):
        y, _ = batch_norm(x_, {**p, "scale": s_}, train=True,
                          activation="leaky_relu", axis_name="d")
        return jax.lax.psum(jnp.vdot(y, dy_local(x_)), "d")

    def dy_local(x_):  # slice dy to match the local shard by identity trick
        return dy[:x_.shape[0]]

    shd = jax.jit(jax.shard_map(
        lambda x_, s_: jax.grad(sharded_loss, argnums=(0, 1))(x_, s_),
        mesh=mesh, in_specs=(P("d"), P()), out_specs=(P("d"), P())))
    # note: dy_local above sees the LOCAL shard (shape 1) so compares
    # against a dy broadcast; build the reference the same way
    dxs, dss = shd(x, p["scale"])

    def ref_loss(x_, s_):
        y, _ = batch_norm(x_, {**p, "scale": s_}, train=True,
                          activation="leaky_relu", fused=False)
        return jnp.vdot(y, jnp.concatenate([dy[:1]] * 4))
    dxr, dsr = jax.grad(ref_loss, argnums=(0, 1))(x, p["scale"])
    np.testing.assert_allclose(np.asarray(dxs), np.asarray(dxr),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(dss), np.asarray(dsr),
                               atol=2e-5, rtol=2e-5)


def test_batch_norm_residual_fused_vjp():
    """bn(x) + residual -> act fused (the residual-block tail): outputs
    and all gradients (x, residual, scale, bias) match the unfused
    two-op composition."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tdnet_tpu.ops.norm import batch_norm, init_batch_norm

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 9, 11, 16).astype(np.float32))
    res = jnp.asarray(rng.randn(2, 9, 11, 16).astype(np.float32))
    dy = jnp.asarray(rng.randn(2, 9, 11, 16).astype(np.float32))
    p = init_batch_norm(16)
    p = {**p, "scale": jnp.asarray(rng.rand(16).astype(np.float32) + 0.5),
         "bias": jnp.asarray(rng.randn(16).astype(np.float32) * 0.1)}

    def loss_fused(x_, r_, s_):
        y, _ = batch_norm(x_, {**p, "scale": s_}, train=True,
                          activation="relu", residual=r_)
        return jnp.vdot(y, dy)

    def loss_ref(x_, r_, s_):
        y, _ = batch_norm(x_, {**p, "scale": s_}, train=True, fused=False)
        return jnp.vdot(jax.nn.relu(y + r_), dy)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, res, p["scale"])
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, res, p["scale"])
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)
    # eval mode: residual path must be bit-identical to the two-op form
    ye = batch_norm(x, p, train=False, activation="relu", residual=res)
    y2 = jax.nn.relu(batch_norm(x, p, train=False) + res)
    np.testing.assert_array_equal(np.asarray(ye), np.asarray(y2))


def test_layer_norm_2d_custom_vjp_matches_autodiff():
    """layer_norm_2d's hand-written 2-pass VJP vs XLA autodiff of the
    naive formulation (same math; reference td4_psp18.py:306-312)."""
    import numpy as np
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 9, 13, 7).astype(np.float32))
    s = jnp.asarray(1.0 + rng.randn(9, 13).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(9, 13).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.randn(2, 9, 13, 7).astype(np.float32))

    def naive(x, s, b, eps=1e-5):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + eps)
        return y * s[None, :, :, None] + b[None, :, :, None]

    from tdnet_tpu.ops.norm import layer_norm_2d
    got = layer_norm_2d(x, {"scale": s, "bias": b})
    np.testing.assert_allclose(np.asarray(got), np.asarray(naive(x, s, b)),
                               atol=1e-6)
    g1 = jax.grad(lambda *a: jnp.sum(layer_norm_2d(a[0], {"scale": a[1], "bias": a[2]}) * w), (0, 1, 2))(x, s, b)
    g2 = jax.grad(lambda *a: jnp.sum(naive(*a) * w), (0, 1, 2))(x, s, b)
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=5e-6, rtol=1e-5)
