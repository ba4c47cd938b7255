"""Orbax checkpoint backend: sharded round-trip + async save.

The pickle backend gathers everything to one host; the Orbax backend
(utils/checkpoint.py) writes each device shard directly and can overlap
the write with training. These tests pin: (1) a mesh-sharded train state
round-trips bit-exactly WITH its shardings, (2) async save + wait
produces a loadable checkpoint, (3) repeated async saves to the same
path (the CLI's state_latest pattern) don't race.
"""

import os

import numpy as np
import pytest

pytest.importorskip("orbax.checkpoint")

import jax
import jax.numpy as jnp

from tdnet_tpu.models import TDNetConfig
from tdnet_tpu.parallel.mesh import make_mesh
from tdnet_tpu.train.trainer import make_train_state
from tdnet_tpu.utils import checkpoint as ckpt


@pytest.fixture(scope="module")
def sharded_state():
    cfg = TDNetConfig(nclass=19, backbone="resnet10", path_num=4,
                      in_size=(65, 129), kv_stride=3, aux=True)
    mesh = make_mesh(8, path_parallel=cfg.path_num)
    return make_train_state(jax.random.PRNGKey(0), cfg, mesh, max_iter=10)


def _trees_equal(a, b):
    fa, fb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(fa) == len(fb)
    for la, lb in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


@pytest.mark.slow
def test_sharded_roundtrip_preserves_shardings(sharded_state, tmp_path):
    path = str(tmp_path / "state.orbax")
    ckpt.save_pytree_orbax(path, sharded_state)
    restored = ckpt.load_pytree_orbax(path, like=sharded_state)
    _trees_equal(sharded_state, restored)
    # shardings restored leaf-for-leaf (not gathered to one device)
    orig = jax.tree.leaves(sharded_state)
    back = jax.tree.leaves(restored)
    for o, r in zip(orig, back):
        assert r.sharding.is_equivalent_to(o.sharding, o.ndim), (
            o.sharding, r.sharding)


def test_async_save_then_load(sharded_state, tmp_path):
    path = str(tmp_path / "state_async.orbax")
    ckpt.save_pytree_orbax(path, sharded_state, async_=True)
    ckpt.wait_pending_saves()
    restored = ckpt.load_pytree_orbax(path)  # numpy leaves without target
    _trees_equal(sharded_state, restored)


def test_repeated_async_saves_same_path(sharded_state, tmp_path):
    """The CLI's state_latest pattern: repeated async saves serialize
    (each joins + swaps in the previous) and the last write wins."""
    path = str(tmp_path / "state_latest.orbax")
    for i in range(3):
        bumped = {**sharded_state, "it": sharded_state["it"] + i}
        ckpt.save_pytree_orbax(path, bumped, async_=True)
    ckpt.wait_pending_saves()
    restored = ckpt.load_pytree_orbax(path)
    assert int(restored["it"]) == 2
    assert not os.path.exists(path + ".new")
    assert not os.path.exists(path + ".old")


def test_crash_windows_never_lose_a_checkpoint(sharded_state, tmp_path):
    """Every crash window of the write-new-then-swap protocol leaves a
    restorable checkpoint, and the resolver picks the newest complete
    one: ``path.new`` (orbax committed it before the swap ran) beats
    ``path``; ``path.old`` (displaced mid-swap) is the fallback."""
    base = str(tmp_path / "state_latest.orbax")
    v0 = {**sharded_state, "it": sharded_state["it"] + 0}
    v1 = {**sharded_state, "it": sharded_state["it"] + 1}

    # crash after orbax committed the new write, before the swap:
    ckpt.save_pytree_orbax(base, v0)
    ckpt.save_pytree_orbax(base + ".new", v1)  # simulate unswapped .new
    assert int(ckpt.load_pytree_orbax(base)["it"]) == 1

    # crash mid-swap: only the displaced old checkpoint remains
    import shutil
    shutil.rmtree(base + ".new")
    os.rename(base, base + ".old")
    assert int(ckpt.load_pytree_orbax(base)["it"]) == 0
