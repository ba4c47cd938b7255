"""Streaming segmentation metrics.

Same scores as the reference (Training/ptsemseg/metrics.py:7-51) —
overall acc, mean class acc, frequency-weighted acc, mean IoU, per-class
IoU — but the confusion matrix accumulates ON DEVICE via a one-hot
scatter-add, so only the final n x n matrix crosses to host instead of
full-resolution label maps every batch (SURVEY.md 5.5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _hist_update(conf: jnp.ndarray, labels: jnp.ndarray, preds: jnp.ndarray):
    n = conf.shape[0]
    valid = (labels >= 0) & (labels < n)
    idx = jnp.where(valid, labels * n + preds, n * n)  # out-of-range -> dropped
    hist = jnp.zeros((n * n + 1,), jnp.int64 if conf.dtype == jnp.int64
                     else jnp.float32)
    hist = hist.at[idx.reshape(-1)].add(1.0)
    return conf + hist[:n * n].reshape(n, n).astype(conf.dtype)


class RunningScore:
    def __init__(self, n_classes: int):
        self.n_classes = n_classes
        self.reset()

    def reset(self):
        self.confusion = jnp.zeros((self.n_classes, self.n_classes),
                                   jnp.float32)

    def update(self, labels, preds):
        """labels/preds: int arrays of any matching shape (device-resident)."""
        self.confusion = _hist_update(self.confusion,
                                      jnp.asarray(labels), jnp.asarray(preds))

    def get_scores(self):
        hist = np.asarray(self.confusion)
        with np.errstate(divide="ignore", invalid="ignore"):
            acc = np.diag(hist).sum() / hist.sum()
            acc_cls = np.nanmean(np.diag(hist) / hist.sum(axis=1))
            iu = np.diag(hist) / (hist.sum(axis=1) + hist.sum(axis=0)
                                  - np.diag(hist))
            mean_iu = np.nanmean(iu)
            freq = hist.sum(axis=1) / hist.sum()
            fwavacc = (freq[freq > 0] * iu[freq > 0]).sum()
        cls_iu = dict(zip(range(self.n_classes), iu))
        return (
            {
                "Overall Acc: \t": acc,
                "Mean Acc : \t": acc_cls,
                "FreqW Acc : \t": fwavacc,
                "Mean IoU : \t": mean_iu,
            },
            cls_iu,
        )


class AverageMeter:
    """Reference averageMeter (metrics.py:54-70)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count
