"""Mixed-precision training mode (opt-in ``compute_dtype=bfloat16``).

The default training dataflow is the reference's full-f32 recipe
(Training/ptsemseg/models/td4_psp/td4_psp.py:367-374); bf16 mode casts
conv weights + activations for the forward/backward only. These tests
pin the contract: masters/grads/BN stats stay f32, the loss and the
post-step weights track the f32 run closely, and BN running stats match
to f32-moment precision (moments are computed in f32 in both modes).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdnet_tpu.models.tdnet import TDNetConfig
from tdnet_tpu.models.teacher import TeacherConfig
from tdnet_tpu.models import init_teacher
from tdnet_tpu.train.trainer import (make_train_state, make_train_step,
                                     _cast_wb, _graft_bn_stats)

IN_HW = (65, 129)


def _setup(teacher: bool):
    cfg = TDNetConfig(nclass=19, backbone="resnet18", path_num=4,
                      in_size=IN_HW, kv_stride=3, pool_before_proj=True,
                      aux=True)
    tcfg = TeacherConfig(nclass=19, backbone="resnet50",
                         path_num=4) if teacher else None
    t_params = init_teacher(jax.random.PRNGKey(5), tcfg) if teacher else None
    rng = np.random.RandomState(3)
    frames = jnp.asarray(rng.randn(4, 1, *IN_HW, 3).astype(np.float32) * 0.5)
    labels = jnp.asarray(rng.randint(0, 19, (1, *IN_HW)).astype(np.int32))
    return cfg, tcfg, t_params, frames, labels


def _leaves_with_key(tree, keys):
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        k = path[-1]
        if isinstance(k, jax.tree_util.DictKey) and k.key in keys:
            out.append((jax.tree_util.keystr(path), leaf))
    return out


@pytest.mark.slow
@pytest.mark.parametrize("teacher", [False, True])
def test_bf16_step_tracks_f32(teacher):
    cfg, tcfg, t_params, frames, labels = _setup(teacher)

    def one_step(compute_dtype):
        state = make_train_state(jax.random.PRNGKey(0), cfg, max_iter=100)
        step = make_train_step(cfg, teacher_cfg=tcfg, max_iter=100,
                               compute_dtype=compute_dtype, donate=False)
        return step(state, frames, labels, jnp.int32(1), t_params)

    s32, m32 = one_step(None)
    s16, m16 = one_step(jnp.bfloat16)

    # losses track (bf16 matmul rounding only)
    l32, l16 = float(m32["loss"]), float(m16["loss"])
    assert np.isfinite(l16)
    assert abs(l16 - l32) / abs(l32) < 0.05, (l32, l16)
    if teacher:
        assert float(m16["kd"]) > 0.0

    # every floating leaf of the new state is still f32 (masters intact)
    for path, leaf in jax.tree_util.tree_flatten_with_path(s16["params"])[0]:
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32, jax.tree_util.keystr(path)

    # post-step conv weights track the f32 step (SGD on bf16-rounded grads)
    w32 = dict(_leaves_with_key(s32["params"], ("w",)))
    w16 = dict(_leaves_with_key(s16["params"], ("w",)))
    assert w32.keys() == w16.keys()
    for k in w32:
        np.testing.assert_allclose(np.asarray(w16[k]), np.asarray(w32[k]),
                                   atol=2e-3, rtol=0.1, err_msg=k)

    # BN running stats: moments are f32 in both modes -> tight match
    st32 = dict(_leaves_with_key(s32["params"], ("mean", "var")))
    st16 = dict(_leaves_with_key(s16["params"], ("mean", "var")))
    for k in st32:
        np.testing.assert_allclose(np.asarray(st16[k]), np.asarray(st32[k]),
                                   atol=5e-2, rtol=5e-2, err_msg=k)
    # ... and actually moved from init
    init = make_train_state(jax.random.PRNGKey(0), cfg, max_iter=100)
    si = dict(_leaves_with_key(init["params"], ("mean", "var")))
    moved = sum(float(np.abs(np.asarray(st16[k]) - np.asarray(si[k])).max())
                for k in si)
    assert moved > 1e-3


def test_cast_and_graft_helpers():
    tree = {
        "conv": {"w": jnp.ones((3, 3, 4, 4), jnp.float32),
                 "b": jnp.zeros((4,), jnp.float32)},
        "bn": {"scale": jnp.ones((4,)), "bias": jnp.zeros((4,)),
               "mean": jnp.zeros((4,)), "var": jnp.ones((4,))},
        "it": jnp.zeros((), jnp.int32),
    }
    cast = _cast_wb(tree, jnp.bfloat16)
    assert cast["conv"]["w"].dtype == jnp.bfloat16
    assert cast["conv"]["b"].dtype == jnp.bfloat16
    assert cast["bn"]["mean"].dtype == jnp.float32
    assert cast["bn"]["scale"].dtype == jnp.float32
    assert cast["it"].dtype == jnp.int32

    upd = jax.tree.map(lambda x: x + 1, cast)
    merged = _graft_bn_stats(tree, upd)
    # stats taken from updated, everything else from master
    np.testing.assert_array_equal(np.asarray(merged["bn"]["mean"]),
                                  np.ones((4,), np.float32))
    np.testing.assert_array_equal(np.asarray(merged["bn"]["var"]),
                                  2 * np.ones((4,), np.float32))
    assert merged["conv"]["w"].dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(merged["conv"]["w"]),
                                  np.ones((3, 3, 4, 4), np.float32))
