"""Product wrappers for multi-chip streaming == the serial Streamer.

stream/parallel_runtime.py exposes group / spatial streaming behind the
serial ``Streamer`` API (VERDICT r3 weak #6). These tests pin the
wrappers — buffering, partial-group flush, rotation, placement — against
the serial runtime frame for frame on the virtual 8-device CPU mesh
(the library steps underneath are already equivalence-tested in
test_group_stream.py / test_spatial.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from tdnet_tpu.models.tdnet import TDNetConfig, init_tdnet
from tdnet_tpu.stream.parallel_runtime import GroupStreamer, SpatialStreamer
from tdnet_tpu.stream.runtime import Streamer


def _serial_outputs(params, cfg, frames, **kw):
    s = Streamer(params, cfg, attn_impl="xla", stem_impl="xla",
                 fused_trunk=False, **kw)
    outs = []
    for t in range(frames.shape[0]):
        out, _ = s.step(frames[t], timed=False)
        outs.append(np.asarray(out))
    return outs


def test_group_streamer_matches_serial_with_flush():
    cfg = TDNetConfig(nclass=7, backbone="resnet10", path_num=4,
                      in_size=(65, 129), kv_stride=3, aux=False)
    params = init_tdnet(jax.random.PRNGKey(0), cfg)
    n_frames = 6   # one full group of 4 + a partial group of 2 (flush)
    frames = jax.random.normal(jax.random.PRNGKey(1),
                               (n_frames, 1, *cfg.in_size, 3), jnp.float32)
    ref = _serial_outputs(params, cfg, frames)

    gs = GroupStreamer(params, cfg, attn_impl="xla", stem_impl="xla",
                       fused_trunk=False, donate_cache=False)
    got = []
    for t in range(n_frames):
        got += [np.asarray(o) for o, _ in gs.submit(frames[t], timed=False)]
    assert len(got) == 4, "full group should emit exactly path_num frames"
    got += [np.asarray(o) for o, _ in gs.flush(timed=False)]
    assert len(got) == n_frames, "flush must emit the partial tail only"

    for t, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=2e-5,
                                   err_msg=f"frame {t}")


def test_spatial_streamer_matches_serial():
    cfg = TDNetConfig(nclass=7, backbone="resnet10", path_num=2,
                      in_size=(64, 96), kv_stride=3, aux=False)
    params = init_tdnet(jax.random.PRNGKey(2), cfg)
    n_frames = 4
    frames = jax.random.normal(jax.random.PRNGKey(3),
                               (n_frames, 1, *cfg.in_size, 3), jnp.float32)
    ref = _serial_outputs(params, cfg, frames)

    ss = SpatialStreamer(params, cfg, attn_impl="xla", donate_cache=False)
    assert ss.mesh.shape["spatial"] == 8
    for t in range(n_frames):
        out, _ = ss.step(frames[t], timed=False)
        np.testing.assert_allclose(ref[t], np.asarray(out),
                                   atol=2e-5, rtol=2e-5,
                                   err_msg=f"frame {t}")
