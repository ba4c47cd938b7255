"""Config-space robustness: odd geometries, other datasets' class
counts, kv-stride edges — streaming (both trunk paths) and training
forward all produce finite, correctly-shaped outputs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdnet_tpu.models.tdnet import (TDNetConfig, clip_forward, init_cache,
                                    init_tdnet, select_path, stream_step)
from tdnet_tpu.nn.module import Ctx


@pytest.mark.parametrize("case", [
    dict(nclass=11, backbone="resnet10", path_num=4, in_size=(101, 167),
         kv_stride=3),                       # CamVid classes, odd geometry
    dict(nclass=40, backbone="resnet10", path_num=2, in_size=(120, 160),
         kv_stride=1),                       # NYUDv2 classes, no subsample
    dict(nclass=19, backbone="resnet10", path_num=2, in_size=(97, 129),
         kv_stride=5),                       # unusual stride
])
@pytest.mark.slow
def test_streaming_and_training_across_configs(case):
    cfg = TDNetConfig(aux=True, **case)
    params = init_tdnet(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    cache = init_cache(cfg)
    for i in range(cfg.path_num + 1):
        p = i % cfg.path_num
        f = jnp.asarray(rng.randn(1, *cfg.in_size, 3).astype(np.float32))
        # alternate fused/standard trunks on the SAME stream: the cache
        # contents must be interchangeable between the two paths
        out, cache = stream_step(select_path(params["paths"], p),
                                 select_path(params["atn"], p), cache, f,
                                 cfg, cfg.psp_pid(p),
                                 Ctx(train=False, fused_trunk=(i % 2 == 0)))
        assert out.shape == (1, *cfg.in_size, cfg.nclass)
        assert bool(jnp.isfinite(out).all())

    frames = jnp.asarray(
        rng.randn(cfg.path_num, 1, *cfg.in_size, 3).astype(np.float32))
    res = clip_forward(params, frames, 1, cfg,
                       Ctx(train=True, rng=jax.random.PRNGKey(1)))
    assert res["out"].shape == (1, *cfg.in_size, cfg.nclass)
    assert bool(jnp.isfinite(res["out"]).all())
