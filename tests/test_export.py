"""AOT export round trip: serialized streaming step == live step."""

import numpy as np

import jax
import jax.numpy as jnp

from tdnet_tpu.models.tdnet import (TDNetConfig, init_cache, init_tdnet,
                                    select_path, stream_step)
from tdnet_tpu.nn.module import Ctx
from tdnet_tpu.stream.export import ExportedStreamer, export_streaming_model


def test_export_roundtrip(tmp_path):
    cfg = TDNetConfig(nclass=19, backbone="resnet10", path_num=4,
                      in_size=(65, 129), kv_stride=3, aux=False)
    params = init_tdnet(jax.random.PRNGKey(0), cfg)
    art = str(tmp_path / "stream.tdnet")
    export_streaming_model(params, cfg, art, dtype=jnp.float32,
                           fused_trunk=False)

    es = ExportedStreamer(art)
    rng = np.random.RandomState(0)
    cache = init_cache(cfg)
    for i in range(5):
        f = jnp.asarray(rng.randn(1, 65, 129, 3).astype(np.float32))
        p = i % 4
        want, cache = stream_step(select_path(params["paths"], p),
                                  select_path(params["atn"], p), cache, f,
                                  cfg, cfg.psp_pid(p), Ctx(train=False))
        got = es.step(f)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5, err_msg=f"frame {i}")
