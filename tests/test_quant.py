"""int8 PTQ inference path (ops/quant.py) — beyond-reference feature.

The reference is f32-only; the int8 path trades bounded quantization
error for the v5e int8 MXU's 2x bf16 peak. These tests pin the error
bounds and the integration contract: opt-in, inference-only, backbone
blocks only, training numerics untouched.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdnet_tpu.nn.module import Ctx
from tdnet_tpu.ops import conv2d, conv2d_int8, quantize_act, quantize_weight


def test_quantize_weight_per_channel_bounds():
    w = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 32, 16))
    # give channels very different ranges: per-tensor scales would fail
    w = w * (10.0 ** jnp.linspace(-2, 1, 16))
    q, s = quantize_weight(w)
    assert q.dtype == jnp.int8 and s.shape == (16,)
    assert int(jnp.max(jnp.abs(q.astype(jnp.int32)))) <= 127
    err = np.asarray(jnp.abs(q.astype(jnp.float32) * s - w))
    # rounding error is at most half a step, per channel
    assert (err <= np.asarray(s) / 2 + 1e-7).all()


def test_quantize_act_zero_guard():
    q, s = quantize_act(jnp.zeros((8, 8)))
    assert float(s) > 0 and not np.isnan(float(s))
    assert (np.asarray(q) == 0).all()


@pytest.mark.parametrize("stride,padding,dilation,bias",
                         [(1, 1, 1, False), (2, 3, 1, True), (1, 4, 4, False),
                          (1, 16, 16, False)])
def test_conv2d_int8_tracks_f32(stride, padding, dilation, bias):
    kx, kw, kb = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(kx, (1, 33, 65, 64))
    w = jax.random.normal(kw, (3, 3, 64, 32)) * 0.1
    b = jax.random.normal(kb, (32,)) if bias else None
    y_ref = conv2d(x, w, b, stride=stride, padding=padding, dilation=dilation)
    y_q = conv2d_int8(x, w, b, stride=stride, padding=padding,
                      dilation=dilation)
    assert y_q.dtype == y_ref.dtype
    rel = (np.linalg.norm(np.asarray(y_q - y_ref)) /
           np.linalg.norm(np.asarray(y_ref)))
    assert rel < 0.03, rel


def test_conv2d_int8_bf16_io():
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 17, 33, 128), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 128, 64), jnp.bfloat16)
    y = conv2d_int8(x, w)
    assert y.dtype == jnp.bfloat16
    a = np.asarray(conv2d(x, w).astype(jnp.float32))
    b = np.asarray(y.astype(jnp.float32))
    rel = np.linalg.norm(b - a) / np.linalg.norm(a)
    assert rel < 0.05, rel


def test_resnet_int8_close_and_train_untouched():
    from tdnet_tpu.nn.resnet import apply_resnet, init_resnet, resnet18

    cfg = resnet18()
    params = init_resnet(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 65, 129, 3))

    c3_f, c4_f, _ = apply_resnet(params, x, cfg, Ctx(train=False))
    c3_q, c4_q, _ = apply_resnet(params, x, cfg,
                                 Ctx(train=False, quant="int8"))
    # quant noise compounds over 8 blocks; demand high agreement, not parity
    for a, b in [(c3_f, c3_q), (c4_f, c4_q)]:
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 0.995, cos

    # train mode ignores quant entirely (bitwise-identical step)
    ctx_a = Ctx(train=True, rng=jax.random.PRNGKey(5))
    ctx_b = Ctx(train=True, rng=jax.random.PRNGKey(5), quant="int8")
    ya = apply_resnet(params, x, cfg, ctx_a)[1]
    yb = apply_resnet(params, x, cfg, ctx_b)[1]
    np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb))


@pytest.mark.slow
def test_streamer_int8_step_runs():
    from tdnet_tpu.models.tdnet import TDNetConfig, init_tdnet
    from tdnet_tpu.stream.runtime import Streamer

    cfg = TDNetConfig(nclass=19, backbone="resnet10", path_num=4,
                      in_size=(65, 129), kv_stride=3, aux=False)
    params = init_tdnet(jax.random.PRNGKey(0), cfg)
    frames = [jnp.asarray(np.random.RandomState(i).randn(
        1, *cfg.in_size, 3).astype(np.float32)) for i in range(5)]

    s_f = Streamer(params, cfg, donate_cache=False)
    s_q = Streamer(params, cfg, donate_cache=False, quant="int8")
    agree = []
    for f in frames:
        of = np.asarray(s_f.step(f, timed=False)[0].argmax(-1))
        oq = np.asarray(s_q.step(f, timed=False)[0].argmax(-1))
        assert oq.shape == of.shape
        agree.append((of == oq).mean())
    # random-weight logits are near-uniform (worst case for argmax
    # stability); real calibrated models agree far more tightly
    assert np.mean(agree) > 0.80, agree


def test_eval_step_quant_compiles_fast_lane():
    """Fast-lane guard: the int8 eval step (the path ``compiler_options_for``
    and the quantized Streamer share) compiles and runs at a tiny shape.
    Full float-vs-int8 agreement lives in the slow lane below."""
    from tdnet_tpu.models.tdnet import TDNetConfig, init_tdnet
    from tdnet_tpu.train.trainer import make_eval_step

    cfg = TDNetConfig(nclass=19, backbone="resnet10", path_num=2,
                      in_size=(33, 65), kv_stride=3, aux=False)
    params = init_tdnet(jax.random.PRNGKey(0), cfg)
    frames = jnp.asarray(np.random.RandomState(0).randn(
        1, 2, *cfg.in_size, 3).astype(np.float32))
    pq = np.asarray(make_eval_step(cfg, quant="int8")(
        params, frames, jnp.int32(0)))
    assert pq.shape == (2, *cfg.in_size) and np.isfinite(pq).all()


@pytest.mark.slow
def test_eval_step_quant_runs():
    """cli.validate --quant int8 path: the eval step compiles and its
    predictions broadly agree with the float eval step."""
    from tdnet_tpu.models.tdnet import TDNetConfig, init_tdnet
    from tdnet_tpu.train.trainer import make_eval_step

    cfg = TDNetConfig(nclass=19, backbone="resnet10", path_num=2,
                      in_size=(65, 129), kv_stride=3, aux=False)
    params = init_tdnet(jax.random.PRNGKey(0), cfg)
    frames = jnp.asarray(np.random.RandomState(0).randn(
        1, 2, *cfg.in_size, 3).astype(np.float32))
    pf = np.asarray(make_eval_step(cfg)(params, frames, jnp.int32(0)))
    pq = np.asarray(make_eval_step(cfg, quant="int8")(
        params, frames, jnp.int32(0)))
    assert pq.shape == pf.shape
    assert (pq == pf).mean() > 0.80


@pytest.mark.slow
def test_teacher_int8_kd_targets_close():
    """Frozen-teacher int8 mode: KD target logits stay close to the f32
    teacher and the full train step runs with kd > 0."""
    from tdnet_tpu.models.teacher import (TeacherConfig, apply_teacher,
                                          init_teacher)

    tcfg = TeacherConfig(nclass=19, backbone="resnet18", path_num=4)
    tp = init_teacher(jax.random.PRNGKey(0), tcfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 65, 129, 3))
    f_full, f_grp = apply_teacher(tp, x, tcfg, group_id=jnp.int32(1))
    q_full, q_grp = apply_teacher(tp, x, tcfg, group_id=jnp.int32(1),
                                  quant="int8")
    for a, b in [(f_full, q_full), (f_grp, q_grp)]:
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 0.99, cos

    from tdnet_tpu.models.tdnet import TDNetConfig
    from tdnet_tpu.train.trainer import make_train_state, make_train_step

    cfg = TDNetConfig(nclass=19, backbone="resnet10", path_num=4,
                      in_size=(65, 129), kv_stride=3, aux=False)
    state = make_train_state(jax.random.PRNGKey(2), cfg, max_iter=100)
    step = make_train_step(cfg, teacher_cfg=tcfg, max_iter=100,
                           teacher_quant="int8")
    frames = jax.random.normal(jax.random.PRNGKey(3), (4, 1, 65, 129, 3))
    labels = jnp.zeros((1, 65, 129), jnp.int32)
    _, metrics = step(state, frames, labels, jnp.int32(0), tp)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["kd"]) > 0


def test_fanet_block_int8_close():
    from tdnet_tpu.nn.fanet import (FANetResNetConfig, apply_fanet_resnet,
                                    init_fanet_resnet)

    cfg = FANetResNetConfig("basic", (2, 2, 2, 2))
    params = init_fanet_resnet(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 65, 129, 3))
    f_f, _ = apply_fanet_resnet(params, x, cfg, Ctx(train=False))
    f_q, _ = apply_fanet_resnet(params, x, cfg,
                                Ctx(train=False, quant="int8"))
    a, b = np.asarray(f_f[-1]).ravel(), np.asarray(f_q[-1]).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.995, cos
