"""Pallas fused attention vs the XLA reference implementation.

Runs in interpreter mode on CPU (tests/conftest forces the CPU backend);
the compiled path is exercised on the real TPU by the streaming CLI with
--attn_impl pallas and by bench.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdnet_tpu.ops.attention import scaled_dot_attention


@pytest.mark.parametrize("lq,lk,dv", [(1000, 130, 256), (512, 128, 128),
                                      (700, 28, 64)])
def test_fused_attention_matches_xla(lq, lk, dv, monkeypatch):
    from tdnet_tpu.kernels import propagation_attention as pa
    # interpreter mode for CPU execution
    orig = pa.pl.pallas_call
    monkeypatch.setattr(pa.pl, "pallas_call",
                        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(1, lq, 64).astype(np.float32))
    k = jnp.asarray(rng.randn(1, lk, 64).astype(np.float32))
    v = jnp.asarray(rng.randn(1, lk, dv).astype(np.float32))
    ref = scaled_dot_attention(q, k, v, temperature=8.0, impl="xla")
    got = pa.fused_propagation_attention(q, k, v, temperature=8.0,
                                         block_q=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
