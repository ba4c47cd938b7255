"""Training-stack parity: losses / schedule / metrics vs the reference
(imported as oracle), plus SGD semantics vs torch.optim.SGD."""

import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

TRAIN_REF = "/root/reference/Training"
pytestmark = pytest.mark.skipif(not os.path.isdir(TRAIN_REF),
                                reason="reference repo not mounted")


def _ref_import(modname):
    sys.path.insert(0, TRAIN_REF)
    try:
        import importlib
        return importlib.import_module(modname)
    finally:
        sys.path.pop(0)


def test_cross_entropy_matches_torch():
    from tdnet_tpu.train.loss import cross_entropy
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 7, 9, 5).astype(np.float32)
    labels = rng.randint(0, 5, (2, 7, 9)).astype(np.int64)
    labels[0, :2] = 250  # ignored
    ref = torch.nn.CrossEntropyLoss(ignore_index=250)(
        torch.from_numpy(np.transpose(logits, (0, 3, 1, 2))),
        torch.from_numpy(labels)).item()
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels), 250))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


@pytest.mark.parametrize("case", ["above_thresh", "below_thresh"])
def test_ohem_matches_reference(case):
    ref_loss = _ref_import("ptsemseg.loss.loss")
    from tdnet_tpu.train.loss import ohem_cross_entropy
    rng = np.random.RandomState(1)
    h, w, c = 13, 17, 6
    scale = 5.0 if case == "above_thresh" else 0.05
    logits = (rng.randn(1, c, h, w) * scale).astype(np.float32)
    labels = rng.randint(0, c, (1, h, w)).astype(np.int64)
    labels[0, 0, :3] = 250
    n_min = h * w // 16
    ref = ref_loss.OhemCELoss2D(n_min=n_min, thresh=0.7, ignore_index=250)(
        torch.from_numpy(logits), torch.from_numpy(labels)).item()
    got = float(ohem_cross_entropy(
        jnp.asarray(np.transpose(logits, (0, 2, 3, 1))), jnp.asarray(labels),
        n_min=n_min, thresh=0.7, ignore_index=250))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_kl_matches_reference_formula():
    from tdnet_tpu.train.loss import kl_divergence
    rng = np.random.RandomState(2)
    q = rng.randn(2, 6, 5, 7).astype(np.float32)  # student NCHW
    p = rng.randn(2, 6, 5, 7).astype(np.float32)  # teacher NCHW
    # reference td4_psp.py:396-405
    P = torch.softmax(torch.from_numpy(p), dim=1) + 1e-8
    Q = torch.softmax(torch.from_numpy(q), dim=1) + 1e-8
    ref = (P * (P / Q).log()).sum(1).mean().item()
    got = float(kl_divergence(
        jnp.asarray(np.transpose(q, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(p, (0, 2, 3, 1)))))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_lr_schedule_matches_adaoptimizer():
    ada = _ref_import("ptsemseg.optimizers.adaoptimizer")
    from tdnet_tpu.train.optim import warmup_poly_schedule

    class TinyModel(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.lin = torch.nn.Linear(2, 2)

        def get_params(self):
            return [self.lin.weight], [self.lin.bias], [], []

    opt = ada.AdaOptimizer(TinyModel(), lr0=1e-2, momentum=0.9, wd=1e-4,
                           warmup_steps=10, warmup_start_lr=1e-5,
                           max_iter=100, power=0.9)
    sched = warmup_poly_schedule(1e-2, 1e-5, 10, 100, 0.9)
    for it in range(60):
        ref_lr = opt.get_lr()
        got_lr = float(sched(it))
        np.testing.assert_allclose(got_lr, ref_lr, rtol=1e-6,
                                   err_msg=f"it={it}")
        opt.it += 1


def test_sgd_semantics_match_torch():
    """optax chain (add_decayed_weights + trace + lr) == torch SGD
    (momentum, weight_decay) over several steps."""
    import optax
    from tdnet_tpu.train.optim import ada_optimizer
    rng = np.random.RandomState(3)
    w0 = rng.randn(4, 3).astype(np.float32)
    b0 = rng.randn(3).astype(np.float32)
    grads_seq = [(rng.randn(4, 3).astype(np.float32),
                  rng.randn(3).astype(np.float32)) for _ in range(5)]

    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    bt = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    opt = torch.optim.SGD([
        {"params": [wt]},
        {"params": [bt], "weight_decay": 0.0},
    ], lr=0.0, momentum=0.9, weight_decay=1e-2)

    params = {"conv": {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}}
    tx, sched = ada_optimizer(params, lr0=0.05, momentum=0.9, wd=1e-2,
                              warmup_steps=2, warmup_start_lr=0.01,
                              max_iter=10, power=0.9)
    opt_state = tx.init(params)

    for it, (gw, gb) in enumerate(grads_seq):
        lr = float(sched(it))
        for g in opt.param_groups:
            g["lr"] = lr
        wt.grad = torch.from_numpy(gw.copy())
        bt.grad = torch.from_numpy(gb.copy())
        opt.step()
        grads = {"conv": {"w": jnp.asarray(gw), "b": jnp.asarray(gb)}}
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["conv"]["w"]),
                               wt.detach().numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["conv"]["b"]),
                               bt.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_asgd_semantics_match_torch():
    """tdnet_tpu asgd == torch.optim.ASGD trajectories — live params AND
    the averaged iterate ax — including the mu<1 regime (t0 crossed).
    The reference registers asgd (Training/ptsemseg/optimizers/
    __init__.py:11) with torch's averaging semantics."""
    import optax
    from tdnet_tpu.train.optim import asgd, asgd_averaged_params
    rng = np.random.RandomState(7)
    w0 = rng.randn(4, 3).astype(np.float32)
    grads_seq = [rng.randn(4, 3).astype(np.float32) for _ in range(10)]

    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.ASGD([wt], lr=0.1, lambd=1e-2, alpha=0.75, t0=3,
                           weight_decay=1e-3)

    params = {"w": jnp.asarray(w0)}
    tx = asgd(lr=0.1, lambd=1e-2, alpha=0.75, t0=3, weight_decay=1e-3)
    opt_state = tx.init(params)

    for gw in grads_seq:
        wt.grad = torch.from_numpy(gw.copy())
        opt.step()
        updates, opt_state = tx.update({"w": jnp.asarray(gw)}, opt_state,
                                       params)
        params = optax.apply_updates(params, updates)
        np.testing.assert_allclose(np.asarray(params["w"]),
                                   wt.detach().numpy(), rtol=1e-5, atol=1e-6)

    ax_torch = opt.state[wt]["ax"].numpy()
    ax_ours = np.asarray(asgd_averaged_params(opt_state)["w"])
    # t0=3 over 10 steps: mu drops below 1, the averaging branch is live
    assert not np.allclose(ax_torch, wt.detach().numpy())
    np.testing.assert_allclose(ax_ours, ax_torch, rtol=1e-5, atol=1e-6)


def test_metrics_match_reference():
    ref_metrics = _ref_import("ptsemseg.metrics")
    from tdnet_tpu.train.metrics import RunningScore
    rng = np.random.RandomState(4)
    ref_rs = ref_metrics.runningScore(5)
    rs = RunningScore(5)
    for _ in range(3):
        gt = rng.randint(0, 7, (2, 11, 13))  # includes out-of-range (ignored)
        pred = rng.randint(0, 5, (2, 11, 13))
        ref_rs.update(gt, pred)
        rs.update(jnp.asarray(gt), jnp.asarray(pred))
    ref_score, ref_iu = ref_rs.get_scores()
    score, iu = rs.get_scores()
    for k in ref_score:
        np.testing.assert_allclose(score[k], ref_score[k], rtol=1e-6,
                                   err_msg=k)
    for k in ref_iu:
        np.testing.assert_allclose(iu[k], ref_iu[k], rtol=1e-6)
