"""Functional-module conventions.

Modules are (init, apply) function pairs over plain dict pytrees. There
is no framework: ``init_*`` returns a params dict (including BatchNorm
running stats), ``apply_*`` takes ``(params, x, ctx)`` and returns
``(y, updated_params)`` where ``updated_params`` differs from ``params``
only in BN running stats and only when ``ctx.train``. This keeps every
transform (vmap over the path axis, grad, jit donation) trivial.

``Ctx`` carries the execution mode: train flag, dropout RNG stream,
optional named axis for explicit SyncBN under shard_map (under plain
``jit`` + sharded batch, GSPMD already reduces BN moments globally).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tdnet_tpu.ops import batch_norm


@dataclasses.dataclass
class Ctx:
    train: bool = False
    rng: jax.Array | None = None
    axis_name: str | None = None
    attn_impl: str = "xla"
    stem_impl: str = "xla"  # first-conv impl: xla | oct (im2col matmul) | s2d
    # stride-1 3x3 conv autodiff: "mm_wgrad" (XLA fwd/dgrad + per-tap
    # MXU-matmul wgrad — fastest measured) | "mm" (fully matmul-form,
    # slower: the 9 shifted-slice reshapes cost more than XLA's native
    # fwd/dgrad) | "xla" (native conv-wgrad, ~45 TFLOP/s on v5e)
    conv_wgrad: str = "mm_wgrad"
    fused_trunk: bool = False  # z-free grouped-PSP+QKV path (inference perf)
    # opt-in int8 PTQ for the backbone residual blocks (inference only;
    # dynamic per-tensor activations, per-channel weights — ops/quant.py)
    quant: str | None = None
    use_dropout: bool = True  # False: train-mode BN but no dropout (oracle tests)
    # Ablation switch (mechanism proof, scripts/mechanism_proof.py): skip
    # the propagation chain in stream_step so the output is exactly the
    # cold-cache head(LN(v_cur)) path for EVERY frame.
    ablate_prop: bool = False
    _n_rng: int = 0

    def next_rng(self):
        if self.rng is None:
            raise ValueError("Ctx.rng required for dropout in train mode")
        key = jax.random.fold_in(self.rng, self._n_rng)
        self._n_rng += 1
        return key

    def bn(self, x, p, activation=None, residual=None):
        """BatchNorm (optionally fused with ``+ residual`` and the
        activation); returns (y, possibly-updated bn params)."""
        if self.train:
            y, new = batch_norm(x, p, train=True, activation=activation,
                                axis_name=self.axis_name, residual=residual)
            return y, {**p, **new}
        return batch_norm(x, p, train=False, activation=activation,
                          residual=residual), p

    def dropout(self, x, rate: float):
        if not self.train or not self.use_dropout or rate <= 0.0:
            return x
        if self.attn_impl == "pallas" and x.shape[-1] % 128 == 0:
            # TPU fast path (rides the same knob as the fused attention
            # kernel): hardware-PRNG mask generated in VMEM, never
            # materialized — threefry bernoulli over the [Lq, d_v] token
            # field cost ~0.6 ms/hop. RNG streams are impl-defined
            # (docs/PARITY.md).
            from tdnet_tpu.kernels.dropout import dropout_tpu
            return dropout_tpu(x, self.next_rng(), rate)
        keep = jax.random.bernoulli(self.next_rng(), 1.0 - rate, x.shape)
        return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))

    def dropout2d(self, x, rate: float):
        """torch Dropout2d: drops whole channels (NHWC -> mask [n,1,1,c])."""
        if not self.train or not self.use_dropout or rate <= 0.0:
            return x
        keep = jax.random.bernoulli(self.next_rng(), 1.0 - rate,
                                    (x.shape[0], 1, 1, x.shape[-1]))
        return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


def eval_ctx() -> Ctx:
    return Ctx(train=False)
