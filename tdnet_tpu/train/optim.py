"""AdaOptimizer as an optax chain.

Reference (Training/ptsemseg/optimizers/adaoptimizer.py): SGD with
momentum and weight decay over 4 param groups — {wd, no-wd} x {base,
lr_mul} — where the lr_mul multiplier is vestigially 1x (:54-57), so
only the wd split matters. Schedule: exponential warmup from
warmup_start_lr to lr0 over warmup_steps, then poly decay power 0.9
(:42-47). Weight decay applies to conv/linear weights only; biases and
all norm affines are excluded (td4_psp.py get_params + ...Encoding
get_params: weights -> wd, biases/norm params -> no wd).

In our pytrees that rule is purely structural: leaves named 'w' under a
conv dict get decay; 'b', 'scale', 'bias' do not; BN running stats
('mean', 'var') are not optimized at all (they update in the forward).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class AsgdState(NamedTuple):
    count: jnp.ndarray   # completed update calls
    ax: optax.Params     # Polyak-averaged iterate (torch's state['ax'])


def asgd(lr: float = 1e-2, lambd: float = 1e-4, alpha: float = 0.75,
         t0: float = 1e6, weight_decay: float = 0.0):
    """torch.optim.ASGD semantics (averaged SGD, Polyak & Juditsky).

    Mirrors torch's `_single_tensor_asgd`: at update call k (0-indexed),
      eta_k = lr / (1 + lambd*lr*k)^alpha
      p    <- p*(1 - lambd*eta_k) - eta_k*(g + wd*p)
      mu_k = 1 for k=0 else 1/max(1, k - t0)
      ax   <- ax + mu_k*(p - ax)
    The *returned updates* move the live params (as torch does — the
    averaged iterate is kept in state, not swapped in); read it with
    ``asgd_averaged_params(opt_state)``.
    """

    def init(params):
        return AsgdState(count=jnp.zeros((), jnp.int32),
                         ax=jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("asgd requires params")
        k = state.count.astype(jnp.float32)
        eta = lr / (1.0 + lambd * lr * k) ** alpha
        mu = jnp.where(state.count >= 1,
                       1.0 / jnp.maximum(1.0, k - t0), 1.0)

        def upd(g, p):
            g = g + weight_decay * p
            new_p = p * (1.0 - lambd * eta) - eta * g
            return new_p - p

        updates = jax.tree.map(upd, grads, params)
        new_ax = jax.tree.map(lambda a, p, u: a + mu * (p + u - a),
                              state.ax, params, updates)
        return updates, AsgdState(count=state.count + 1, ax=new_ax)

    return optax.GradientTransformation(init, update)


def asgd_averaged_params(opt_state: AsgdState):
    """The averaged iterate (torch exposes it as state['ax'])."""
    return opt_state.ax


def warmup_poly_schedule(lr0: float, warmup_start_lr: float,
                         warmup_steps: int, max_iter: int, power: float):
    """lr(it): start*(lr0/start)^(it/w) for it<=w, else poly decay."""
    factor = (lr0 / warmup_start_lr) ** (1.0 / warmup_steps)

    def schedule(it):
        it = jnp.asarray(it, jnp.float32)
        warm = warmup_start_lr * jnp.power(factor, it)
        t = jnp.clip((it - warmup_steps) / (max_iter - warmup_steps), 0.0, 1.0)
        poly = lr0 * jnp.power(1.0 - t, power)
        return jnp.where(it <= warmup_steps, warm, poly)

    return schedule


def _label_leaf(path) -> str:
    keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
    last = keys[-1]
    if last in ("mean", "var"):
        return "frozen"
    if last == "w":
        return "wd"
    return "nowd"


def param_labels(params) -> dict:
    return jax.tree_util.tree_map_with_path(lambda p, _: _label_leaf(p), params)


KEY2OPT = {
    # reference registry (Training/ptsemseg/optimizers/__init__.py:8-17);
    # torch-style SGD momentum == optax.sgd with trace accumulator
    "sgd": lambda lr=1e-2, momentum=0.0, weight_decay=0.0, **kw:
        optax.chain(optax.add_decayed_weights(weight_decay),
                    optax.sgd(lr, momentum=momentum or None)),
    "adam": lambda lr=1e-3, **kw: optax.adam(lr, **kw),
    "asgd": lambda lr=1e-2, **kw: asgd(lr, **kw),
    "adamax": lambda lr=2e-3, **kw: optax.adamax(lr, **kw),
    "adadelta": lambda lr=1.0, **kw: optax.adadelta(lr, **kw),
    "adagrad": lambda lr=1e-2, **kw: optax.adagrad(lr, **kw),
    "rmsprop": lambda lr=1e-2, **kw: optax.rmsprop(lr, **kw),
}


def get_optimizer(name: str, **kwargs) -> optax.GradientTransformation:
    """Generic registry for non-Ada optimizers (the reference exposes 7
    torch optimizers alongside AdaOptimizer; the TDNet recipes only ever
    use adaoptimizer — see ada_optimizer below)."""
    if name not in KEY2OPT:
        raise NotImplementedError(f"Optimizer {name} not implemented")
    return KEY2OPT[name](**kwargs)


def ada_optimizer(params, *, lr0: float = 1e-2, momentum: float = 0.9,
                  wd: float = 1e-4, warmup_steps: int = 1000,
                  warmup_start_lr: float = 1e-5, max_iter: int = 40000,
                  power: float = 0.9, frozen_extra=None):
    """Returns (optax GradientTransformation, schedule fn).

    ``frozen_extra``: optional pytree of bools (True = frozen) merged
    into the labels (e.g. to freeze whole subtrees).
    """
    schedule = warmup_poly_schedule(lr0, warmup_start_lr, warmup_steps,
                                    max_iter, power)
    labels = param_labels(params)
    if frozen_extra is not None:
        labels = jax.tree.map(
            lambda lab, frz: "frozen" if frz else lab, labels, frozen_extra)

    def sgd(decay):
        chain = []
        if decay:
            chain.append(optax.add_decayed_weights(wd))
        chain += [optax.trace(decay=momentum),
                  optax.scale_by_learning_rate(schedule)]
        return optax.chain(*chain)

    tx = optax.multi_transform(
        {"wd": sgd(True), "nowd": sgd(False), "frozen": optax.set_to_zero()},
        labels)
    return tx, schedule
