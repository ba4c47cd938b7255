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


@pytest.mark.parametrize("lq,lk,dv", [(700, 130, 256), (513, 28, 128)])
def test_fused_attention_fc_matches_xla(lq, lk, dv, monkeypatch):
    """The in-kernel per-token fc projection (reference Attention.fc,
    transformer.py:82-91) must equal attention followed by the einsum."""
    from tdnet_tpu.kernels import propagation_attention as pa
    orig = pa.pl.pallas_call
    monkeypatch.setattr(pa.pl, "pallas_call",
                        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(1, lq, 64).astype(np.float32))
    k = jnp.asarray(rng.randn(1, lk, 64).astype(np.float32))
    v = jnp.asarray(rng.randn(1, lk, dv).astype(np.float32))
    wfc = jnp.asarray(rng.randn(dv, dv).astype(np.float32) * 0.05)
    bfc = jnp.asarray(rng.randn(dv).astype(np.float32) * 0.1)
    ref = scaled_dot_attention(q, k, v, temperature=8.0, impl="xla")
    ref = jnp.einsum("nld,de->nle", ref, wfc) + bfc
    got = pa.fused_propagation_attention(q, k, v, temperature=8.0,
                                         fc_w=wfc, fc_b=bfc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-4, rtol=1e-3)
