"""Ring-parallel hop chain == serial hop chain."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tdnet_tpu.nn import init_attention
from tdnet_tpu.ops import scaled_dot_attention
from tdnet_tpu.parallel.ring import _apply_fc, ring_hop_chain


def _serial_chain(atn_stacked, ks, vs, qs, q_cur, d_k):
    temperature = math.sqrt(d_k)
    acc = None
    w = ks.shape[0]
    for h in range(w):
        vin = vs[h] if acc is None else vs[h] + acc
        q = qs[h + 1] if h + 1 < w else q_cur
        out = scaled_dot_attention(q, ks[h], vin, temperature=temperature)
        acc = _apply_fc(jax.tree.map(lambda x: x[h], atn_stacked)["fc"], out)
    return acc


@pytest.mark.parametrize("window", [1, 3])
def test_ring_chain_matches_serial(window):
    d_k, d_v, l, lq, n = 16, 32, 24, 100, 1
    rng = np.random.RandomState(0)
    ks = jnp.asarray(rng.randn(window, n, l, d_k).astype(np.float32))
    vs = jnp.asarray(rng.randn(window, n, l, d_v).astype(np.float32))
    qs = jnp.asarray(rng.randn(window, n, l, d_k).astype(np.float32))
    q_cur = jnp.asarray(rng.randn(n, lq, d_k).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(0), window)
    atn = jax.tree.map(lambda *xs: jnp.stack(xs),
                       *[init_attention(k, d_v) for k in keys])

    want = _serial_chain(atn, ks, vs, qs, q_cur, d_k)

    mesh = Mesh(np.asarray(jax.devices()[:window]), ("ring",))
    got = ring_hop_chain(atn, ks, vs, qs, q_cur, d_k=d_k, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
