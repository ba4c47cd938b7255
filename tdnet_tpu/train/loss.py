"""Segmentation losses with exact reference semantics, XLA-static shapes.

- ``cross_entropy``: torch ``nn.CrossEntropyLoss(ignore_index)`` (mean
  over non-ignored pixels).
- ``ohem_cross_entropy``: OhemCELoss2D (reference
  Training/ptsemseg/loss/loss.py:21-44): keep all losses above
  -log(thresh) if the n_min-th largest exceeds it, else the top n_min;
  mean over kept. The reference's dynamic boolean slice
  (``loss[loss > thresh]``) is rewritten as a sort + mask with identical
  value semantics (same multiset of kept losses).
- ``kl_divergence``: the reference's exact KD formula
  (td4_psp.py:396-405): softmax both sides, add 1e-8, sum_c P*log(P/Q),
  mean over pixels, temperature 1.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _per_pixel_ce(logits: jnp.ndarray, labels: jnp.ndarray,
                  ignore_index: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """NHWC logits, NHW int labels -> (per-pixel loss with 0 at ignored,
    valid mask). Matches torch reduction='none' + ignore_index.

    TPU note: the picked logit comes from a one-hot multiply-reduce over
    the minor (class) axis, not take_along_axis — minor-axis gathers on
    [pixels, C] cost milliseconds at segmentation sizes."""
    nclass = logits.shape[-1]
    valid = (labels != ignore_index) & (labels >= 0) & (labels < nclass)
    safe = jnp.where(valid, labels, 0)
    lg = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(lg, axis=-1)
    onehot = jax.nn.one_hot(safe, nclass, dtype=jnp.float32)
    picked = jnp.sum(lg * onehot, axis=-1)
    return jnp.where(valid, lse - picked, 0.0), valid


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  ignore_index: int = 250) -> jnp.ndarray:
    loss, valid = _per_pixel_ce(logits, labels, ignore_index)
    return jnp.sum(loss) / jnp.maximum(jnp.sum(valid), 1)


def _kth_largest(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Exact k-th largest (1-indexed) of a NON-NEGATIVE f32 vector via
    bit-level bisection — O(32) count-reductions instead of a full sort
    (TPU sorts of ~1M-pixel loss maps cost milliseconds; this is ~20x
    cheaper). For non-negative IEEE floats the int32 bit pattern is
    order-isomorphic, so bisecting integer bits finds the exact value.

    Returns t such that count(x > t) < k <= count(x >= t). ``x`` may be
    any shape (reductions run over all elements — do NOT flatten first;
    a 1-D reshape forces a slow T(1024) relayout on TPU).
    """
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)

    def body(_, lohi):
        lo, hi = lohi  # invariant: count(> hi) < k <= count(> lo) + ...
        mid = lo + (hi - lo) // 2
        c = jnp.sum(bits > mid)
        return jnp.where(c >= k, mid, lo), jnp.where(c >= k, hi, mid)

    lo = jnp.int32(-1)
    hi = jnp.int32(0x7F800000)  # +inf bits; CE losses are finite & >= 0
    lo, hi = jax.lax.fori_loop(0, 32, body, (lo, hi))
    return jax.lax.bitcast_convert_type(hi, jnp.float32)


def ohem_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray, *,
                       n_min: int, thresh: float = 0.7,
                       ignore_index: int = 250) -> jnp.ndarray:
    """Value-identical to the reference's sort-based OHEM
    (loss.py:37-44): keep all losses above -log(thresh) if the
    (n_min+1)-th largest exceeds it, else the top n_min; mean over kept.
    Sort-free: `sorted_desc[n_min] > t` == `count(loss > t) > n_min`,
    and the top-n_min sum is reconstructed from the exact n_min-th
    largest value with tie adjustment."""
    loss, _ = _per_pixel_ce(logits, labels, ignore_index)
    log_thresh = jnp.float32(-math.log(thresh))

    count_th = jnp.sum(loss > log_thresh)
    sum_th = jnp.sum(jnp.where(loss > log_thresh, loss, 0.0))
    use_thresh = count_th > n_min

    tau = _kth_largest(loss, n_min)
    count_gt = jnp.sum(loss > tau)
    sum_gt = jnp.sum(jnp.where(loss > tau, loss, 0.0))
    topk_sum = sum_gt + tau * (n_min - count_gt)  # ties at tau fill to k

    return jnp.where(use_thresh,
                     sum_th / jnp.maximum(count_th, 1),
                     topk_sum / n_min)


def kl_divergence(q_logits: jnp.ndarray, p_logits: jnp.ndarray,
                  temperature: float = 1.0) -> jnp.ndarray:
    """KL(P || Q) per the reference: P is the teacher, Q the student.
    Channel axis is last (NHWC logits)."""
    p = jax.nn.softmax(p_logits.astype(jnp.float32) / temperature, axis=-1) + 1e-8
    q = jax.nn.softmax(q_logits.astype(jnp.float32) / temperature, axis=-1) + 1e-8
    kld = jnp.sum(p * jnp.log(p / q), axis=-1) * (temperature ** 2)
    return jnp.mean(kld)


def make_loss_fn(name: str, cfg_training: dict):
    """Loss factory mirroring the reference registry
    (Training/ptsemseg/loss/__init__.py:19-34): n_min for OHEM is
    imgs_per_device * crop_h * crop_w / 16."""
    params = {k: v for k, v in cfg_training.get("loss", {}).items()
              if k != "name"}
    ignore_index = params.get("ignore_index", 250)
    if name == "SegmentationLosses":
        return lambda lg, lb: cross_entropy(lg, lb, ignore_index)
    if name == "OhemCELoss2D":
        thresh = params.get("thresh", 0.7)
        n_imgs = max(1, int(cfg_training["batch_size"]) //
                     max(1, int(cfg_training.get("n_devices", 1))))
        crop = cfg_training["crop_size"]
        n_min = n_imgs * crop[0] * crop[1] // 16
        if n_imgs == 1:
            # Reference 8-GPU setup: one image per device, OHEM over each
            # image independently, scalar losses averaged
            # (train.py:93-94). vmap keeps the sort shard-local under a
            # batch-sharded mesh — no cross-device top-k.
            def loss_fn(lg, lb):
                per = jax.vmap(lambda l, y: ohem_cross_entropy(
                    l[None], y[None], n_min=n_min, thresh=thresh,
                    ignore_index=ignore_index))(lg, lb)
                return jnp.mean(per)
            return loss_fn
        return lambda lg, lb: ohem_cross_entropy(
            lg, lb, n_min=n_min, thresh=thresh, ignore_index=ignore_index)
    raise NotImplementedError(f"Loss {name} not implemented")
