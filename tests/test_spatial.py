"""Spatially-partitioned streaming equals the single-device step."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from tdnet_tpu.models.tdnet import (TDNetConfig, init_cache, init_tdnet,
                                    select_path, stream_step)
from tdnet_tpu.nn.module import Ctx
from tdnet_tpu.parallel.mesh import make_spatial_mesh
from tdnet_tpu.parallel.spatial import make_spatial_stream_step


@pytest.mark.slow
def test_spatial_streaming_matches_single_device():
    cfg = TDNetConfig(nclass=19, backbone="resnet10", path_num=4,
                      in_size=(64, 128), kv_stride=3, aux=False)
    params = init_tdnet(jax.random.PRNGKey(0), cfg)
    mesh = make_spatial_mesh(4)

    rng = np.random.RandomState(0)
    frames = [jnp.asarray(rng.randn(1, *cfg.in_size, 3).astype(np.float32))
              for _ in range(5)]

    # single-device reference
    cache = init_cache(cfg)
    ref_outs = []
    for i, f in enumerate(frames):
        p = i % 4
        out, cache = stream_step(select_path(params["paths"], p),
                                 select_path(params["atn"], p),
                                 cache, f, cfg, cfg.psp_pid(p),
                                 Ctx(train=False))
        ref_outs.append(np.asarray(out))

    # spatial-sharded over 4 devices
    steps = [make_spatial_stream_step(cfg, mesh, cfg.psp_pid(p),
                                      donate_cache=False)
             for p in range(4)]
    # probe: odd height is rejected with a clear message
    import pytest
    bad = TDNetConfig(nclass=19, backbone="resnet10", path_num=4,
                      in_size=(65, 129), kv_stride=3, aux=False)
    with pytest.raises(ValueError, match="divisible"):
        make_spatial_stream_step(bad, mesh, 0)
    cache = init_cache(cfg)
    for i, f in enumerate(frames):
        p = i % 4
        out, cache = steps[p](select_path(params["paths"], p),
                              select_path(params["atn"], p), cache, f)
        np.testing.assert_allclose(np.asarray(out), ref_outs[i],
                                   atol=2e-4, rtol=1e-4,
                                   err_msg=f"frame {i}")
