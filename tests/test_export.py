"""AOT export round trip: serialized streaming step == live step."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from tdnet_tpu.models.tdnet import (TDNetConfig, init_cache, init_tdnet,
                                    select_path, stream_step)
from tdnet_tpu.nn.module import Ctx
from tdnet_tpu.stream.export import ExportedStreamer, export_streaming_model


@pytest.mark.slow
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


def test_export_pallas_artifact_platform_pinning(tmp_path):
    """A Pallas-built artifact cross-lowers for TPU from any host but is
    platform-pinned: loading it on a non-TPU backend must fail loudly
    with the documented message (deployment behavior spec)."""
    import pytest

    cfg = TDNetConfig(nclass=19, backbone="resnet10", path_num=2,
                      in_size=(65, 129), kv_stride=3, aux=False)
    params = init_tdnet(jax.random.PRNGKey(1), cfg)
    art = str(tmp_path / "stream_pallas.tdnet")
    export_streaming_model(params, cfg, art, dtype=jnp.float32,
                           fused_trunk=False, attn_impl="pallas")

    import pickle
    with open(art, "rb") as f:
        meta = pickle.load(f)["meta"]
    assert meta["platforms"] == ("tpu",)
    assert meta["attn_impl"] == "pallas"

    assert jax.default_backend() == "cpu"  # conftest forces CPU
    with pytest.raises(RuntimeError, match="pin.*TPU|lowered for"):
        ExportedStreamer(art)


def test_export_xla_artifact_is_portable(tmp_path):
    """attn_impl='xla' artifacts are lowered for cpu AND tpu; they load
    and run on the CPU backend."""
    cfg = TDNetConfig(nclass=19, backbone="resnet10", path_num=2,
                      in_size=(65, 129), kv_stride=3, aux=False)
    params = init_tdnet(jax.random.PRNGKey(2), cfg)
    art = str(tmp_path / "stream_xla.tdnet")
    export_streaming_model(params, cfg, art, dtype=jnp.float32,
                           fused_trunk=False, attn_impl="xla")
    import pickle
    with open(art, "rb") as f:
        meta = pickle.load(f)["meta"]
    assert meta["platforms"] == ("cpu", "tpu")
    es = ExportedStreamer(art)
    out = es.step(jnp.zeros((1, 65, 129, 3), jnp.float32))
    assert out.shape == (1, 65, 129, 19)
