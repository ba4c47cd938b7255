"""Streaming runtime: pipelined mode equals step-by-step; meter; convert
CLI round trip."""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tdnet_tpu.models.tdnet import TDNetConfig, init_tdnet
from tdnet_tpu.stream.runtime import LatencyMeter, Streamer, hard_sync


def _tiny_cfg():
    return TDNetConfig(nclass=19, backbone="resnet10", path_num=4,
                       in_size=(65, 129), kv_stride=3, aux=False)


@pytest.mark.slow
def test_run_pipelined_equals_stepwise():
    cfg = _tiny_cfg()
    params = init_tdnet(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    frames = [jnp.asarray(rng.randn(1, *cfg.in_size, 3).astype(np.float32))
              for _ in range(6)]

    s1 = Streamer(params, cfg, donate_cache=False)
    outs = [np.asarray(s1.step(f, timed=False)[0]) for f in frames]

    s2 = Streamer(params, cfg, donate_cache=False)
    last, spf = s2.run_pipelined(frames, sync_every=3)
    assert spf > 0
    np.testing.assert_allclose(np.asarray(last), outs[-1], atol=1e-5)


def test_latency_meter_warmup_exclusion():
    m = LatencyMeter(warmup=6)
    for i in range(10):
        m.add(1.0 if i < 6 else 0.5)  # warmup frames are slower
    assert m.avg == 0.5
    assert m.fps == 2.0


def test_hard_sync_is_a_barrier():
    x = jnp.arange(8.0)
    hard_sync(x * 2)  # must not raise on any platform


@pytest.mark.skipif(not os.path.isdir("/root/reference/Testing"),
                    reason="reference repo not mounted")
def test_convert_cli_roundtrip(tmp_path):
    """torch checkpoint -> convert CLI -> native pickle -> validate-style
    load produces identical leaves."""
    import sys
    sys.path.insert(0, os.path.dirname("/root/reference/Testing/model/"))
    from tests.test_reference_parity import _load_ref_module, _randomize
    mod = _load_ref_module("td4_psp18")
    ref = mod.td4_psp18(nclass=19, path_num=4, model_path=None)
    _randomize(ref, seed=3)
    src = str(tmp_path / "td4.pkl")
    torch.save(ref.state_dict(), src)

    from tdnet_tpu.cli.convert import main as convert_main
    dst = str(tmp_path / "td4_native.pkl")
    convert_main(["--arch", "td4-psp18", "--src", src, "--dst", dst,
                  "--in_size", "97", "193", "--streaming"])

    from tdnet_tpu.models import tdnet_config
    from tdnet_tpu.utils.checkpoint import load_pytree
    from tdnet_tpu.utils.torch_import import tdnet_from_torch
    cfg = tdnet_config("td4-psp18", in_size=(97, 193), streaming=True)
    want = tdnet_from_torch(
        {k: np.asarray(v.numpy()) for k, v in ref.state_dict().items()}, cfg)
    got = load_pytree(dst)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=0), got, want)
