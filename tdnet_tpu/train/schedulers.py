"""LR scheduler registry.

Reference parity note: Training/ptsemseg/schedulers/ is DEAD CODE in the
reference — ``get_scheduler`` is never called (AdaOptimizer embeds its
own warmup+poly schedule; SURVEY.md item 24). The components exist here
for API completeness, as optax-compatible schedule functions, and are
usable with any optimizer from ``tdnet_tpu.train.optim.get_optimizer``.
"""

from __future__ import annotations

import jax.numpy as jnp


def constant_lr(lr: float):
    return lambda it: jnp.asarray(lr, jnp.float32)


def polynomial_lr(lr: float, max_iter: int, decay_iter: int = 1,
                  power: float = 0.9):
    def schedule(it):
        it = jnp.asarray(it, jnp.float32)
        eff = jnp.floor(it / decay_iter) * decay_iter
        factor = jnp.power(1.0 - eff / max_iter, power)
        return lr * factor
    return schedule


def warmup_lr(base_schedule, warmup_iters: int = 500, mode: str = "linear",
              gamma: float = 0.2):
    """Wraps another schedule with a warmup phase (reference
    schedulers.py:27-52 semantics: 'linear' ramps gamma..1, 'constant'
    holds gamma)."""
    def schedule(it):
        it = jnp.asarray(it, jnp.float32)
        base = base_schedule(it)
        if mode == "linear":
            alpha = it / warmup_iters
            factor = gamma * (1.0 - alpha) + alpha
        elif mode == "constant":
            factor = jnp.asarray(gamma, jnp.float32)
        else:
            raise KeyError(f"WarmUp type {mode} not implemented")
        return jnp.where(it < warmup_iters, base * factor, base)
    return schedule


KEY2SCHEDULER = {
    "constant_lr": constant_lr,
    "poly_lr": polynomial_lr,
}


def get_scheduler(name: str | None, **kwargs):
    if name is None:
        return None
    return KEY2SCHEDULER[name](**kwargs)
