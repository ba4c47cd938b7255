"""Dropout paths: Ctx routing contract (CPU) + TPU hardware-PRNG kernel.

The reference applies ``nn.Dropout(0.1)`` to the attention fc output
(Training/ptsemseg/models/td4_psp/transformer.py:82-91); RNG streams
are impl-defined (docs/PARITY.md), so these tests check the dropout
*contract* — Bernoulli(1-rate) keep mask, 1/(1-rate) rescale, and a
backward pass that applies the SAME mask — not bitwise mask parity.

``kernels/dropout.py`` (hardware-PRNG mask generated in VMEM, custom
VJP regenerates it from the seed) uses ``pltpu.prng_*`` primitives that
have no CPU/interpret lowering, so its semantics test is TPU-gated and
always skips in the CPU suite; the compiled path was validated on the
real chip (deterministic across calls, keep rate 0.9001 at rate=0.1 on
18721x512, grad == mask * cotangent exactly) and is exercised every
round by bench_train.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdnet_tpu.nn.module import Ctx


def test_ctx_dropout_xla_contract():
    """CPU/XLA path: keep rate, rescale, eval-mode identity."""
    ctx = Ctx(train=True, rng=jax.random.PRNGKey(0), attn_impl="xla")
    x = jnp.ones((4096, 64), jnp.float32)
    y = np.asarray(ctx.dropout(x, 0.25))
    keep = y != 0
    assert abs(keep.mean() - 0.75) < 0.02
    np.testing.assert_allclose(y[keep], 1.0 / 0.75, rtol=1e-6)

    ctx_eval = Ctx(train=False, attn_impl="xla")
    np.testing.assert_array_equal(np.asarray(ctx_eval.dropout(x, 0.25)),
                                  np.asarray(x))


def test_ctx_dropout_backward_applies_same_mask():
    """Dropout is linear with a fixed mask: grad of sum(dropout(x) * w)
    must equal mask * w / (1-rate) — mask identical fwd/bwd."""
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(jax.random.PRNGKey(1), (512, 32), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(2), (512, 32), jnp.float32)

    def f(x):
        ctx = Ctx(train=True, rng=rng, attn_impl="xla")
        return jnp.sum(ctx.dropout(x, 0.1) * w)

    ctx = Ctx(train=True, rng=rng, attn_impl="xla")
    keep = np.asarray(ctx.dropout(x, 0.1)) != 0
    g = np.asarray(jax.grad(f)(x))
    np.testing.assert_allclose(g, np.where(keep, np.asarray(w) / 0.9, 0.0),
                               rtol=1e-6)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="pltpu.prng_* has no CPU lowering; compiled "
                           "path validated on the real chip + bench_train")
def test_dropout_tpu_kernel_semantics():
    from tdnet_tpu.kernels.dropout import dropout_tpu

    rng = jax.random.PRNGKey(5)
    x = jax.random.normal(jax.random.PRNGKey(0), (18721, 512), jnp.float32)
    f = jax.jit(lambda x, r: dropout_tpu(x, r, 0.1))
    y1, y2 = f(x, rng), f(x, rng)
    assert bool(jnp.all(y1 == y2))                      # deterministic
    keep = np.asarray(y1) != 0
    assert abs(keep.mean() - 0.9) < 0.01
    np.testing.assert_allclose(np.asarray(y1)[keep],
                               (np.asarray(x) / 0.9)[keep], rtol=1e-6)

    w = jax.random.normal(jax.random.PRNGKey(1), x.shape, jnp.float32)
    g = jax.grad(lambda x: jnp.sum(dropout_tpu(x, rng, 0.1) * w))(x)
    np.testing.assert_allclose(np.asarray(g),
                               np.where(keep, np.asarray(w) / 0.9, 0.0),
                               rtol=1e-6)

    # rows not a multiple of the 1024 row block (padding path)
    x3 = jax.random.normal(jax.random.PRNGKey(2), (1000, 256), jnp.float32)
    y3 = np.asarray(jax.jit(lambda x, r: dropout_tpu(x, r, 0.5))(x3, rng))
    assert abs((y3 != 0).mean() - 0.5) < 0.03
