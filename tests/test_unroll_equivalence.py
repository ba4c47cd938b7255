"""Unrolled vs vmapped clip forward equivalence.

``clip_forward(..., unroll=True)`` (default, fast single-chip form:
separate standard convs per path) must match ``unroll=False`` (one
vmapped feature-grouped launch, used when the mesh shards the path
axis) — same logits AND same BN running-stat updates, for every
rotation phase. The torch oracle (test_clip_parity) covers the default;
this test pins the two forms to each other in train mode.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdnet_tpu.models.fanet_td import FATDConfig, fa_clip_forward, init_fatd
from tdnet_tpu.models.tdnet import TDNetConfig, clip_forward, init_tdnet
from tdnet_tpu.nn.module import Ctx

IN_HW = (65, 129)


def _assert_trees_close(a, b, atol):
    fa = jax.tree_util.tree_flatten_with_path(a)[0]
    fb = jax.tree_util.tree_flatten_with_path(b)[0]
    assert len(fa) == len(fb)
    for (pa, la), (_, lb) in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=atol,
                                   rtol=1e-4,
                                   err_msg=jax.tree_util.keystr(pa))


@pytest.mark.parametrize("path_num,backbone,pool_before", [
    (4, "resnet18", True),
    (2, "resnet50", False),
])
@pytest.mark.slow
def test_tdnet_unroll_matches_vmap(path_num, backbone, pool_before):
    cfg = TDNetConfig(nclass=19, backbone=backbone, path_num=path_num,
                      in_size=IN_HW, kv_stride=3,
                      pool_before_proj=pool_before, aux=True)
    params = init_tdnet(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(9)
    frames = jnp.asarray(
        rng.randn(path_num, 1, *IN_HW, 3).astype(np.float32) * 0.5)

    for pos_id in range(path_num):
        ctx = lambda: Ctx(train=True, rng=jax.random.PRNGKey(1),
                          use_dropout=False)
        ru = clip_forward(params, frames, pos_id, cfg, ctx(), unroll=True)
        rv = clip_forward(params, frames, pos_id, cfg, ctx(), unroll=False)
        for k in ("out", "out_sub", "auxout", "out_lowres"):
            np.testing.assert_allclose(np.asarray(ru[k]), np.asarray(rv[k]),
                                       atol=2e-4, rtol=1e-4, err_msg=k)
        _assert_trees_close(ru["updated_params"], rv["updated_params"],
                            atol=1e-4)


@pytest.mark.slow
def test_fanet_unroll_matches_vmap():
    # 160x320, NOT smaller: FANet strides to /32, and train-mode BN
    # moments over a degenerate 2x4 deepest grid amplify float noise
    # chaotically (0.5 logit divergence at 64x128 with both forms
    # correct). 5x10 is the smallest grid where the comparison is stable.
    cfg = FATDConfig(nclass=19, backbone="resnet18", path_num=2,
                     in_size=(160, 320), kv_stride=3)
    params = init_fatd(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(11)
    frames = jnp.asarray(rng.randn(2, 1, 160, 320, 3).astype(np.float32) * 0.5)

    for pos_id in range(2):
        ctx = lambda: Ctx(train=True, rng=jax.random.PRNGKey(1),
                          use_dropout=False)
        ru = fa_clip_forward(params, frames, pos_id, cfg, ctx(),
                             unroll=True)
        rv = fa_clip_forward(params, frames, pos_id, cfg, ctx(),
                             unroll=False)
        for k in ("out", "out_sub", "out_lowres"):
            np.testing.assert_allclose(np.asarray(ru[k]), np.asarray(rv[k]),
                                       atol=2e-4, rtol=1e-4, err_msg=k)
        _assert_trees_close(ru["updated_params"], rv["updated_params"],
                            atol=1e-4)
