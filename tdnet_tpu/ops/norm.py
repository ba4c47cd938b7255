"""Normalization layers (functional, NHWC).

- ``batch_norm``: torch ``BatchNorm2d`` semantics (eps 1e-5, momentum 0.1,
  unbiased running var) with the reference's optional fused leaky-ReLU
  activation (reference: Testing/model/pspnet/td4_psp18.py:11-24).
  SyncBatchNorm (reference: Training/ptsemseg/models/__init__.py:26-28,
  torch-encoding CUDA/NCCL) is obtained for free on TPU: under ``jit``
  with the batch axis sharded over the mesh, the GSPMD partitioner turns
  the batch-moment reductions into ICI all-reduces. Under ``shard_map``
  pass ``axis_name`` to reduce explicitly.
- ``layer_norm_2d``: torch ``nn.LayerNorm([H, W])`` over the spatial
  plane of each (n, c) slice, with learned per-pixel affine (reference:
  Testing/model/pspnet/td4_psp18.py:306-312 — shape-locked to the
  configured input resolution, which we reproduce but derive from config).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _bn_act_train(x, scale, bias, nhw_stats, eps, activation, axis_name):
    """Normalize + affine + activation with a hand-written 2-pass VJP.

    ``nhw_stats`` = (mean, inv) f32 per-channel batch statistics (already
    cross-device reduced when ``axis_name`` is set). XLA's autodiff of
    the naive formulation runs ~6 reduction/elementwise passes over the
    activation per BN in backward, each with an f32 materialization of
    the bf16 input (15+ ms of the bf16 TD4 train step on v5e); this VJP
    is exactly 2 fused passes each way and keeps x in its storage dtype.
    """
    mean, inv = nhw_stats
    cdt = jnp.promote_types(x.dtype, jnp.float32)
    y = ((x.astype(cdt) - mean) * (inv * scale.astype(cdt))
         + bias.astype(cdt)).astype(x.dtype)
    return _apply_act(y, activation)


def _apply_act(y, activation):
    if activation == "leaky_relu":
        return jax.nn.leaky_relu(y, negative_slope=0.01)
    if activation == "relu":
        return jax.nn.relu(y)
    if activation is None:
        return y
    raise ValueError(f"unknown activation {activation}")


def _bn_act_train_fwd(x, scale, bias, nhw_stats, eps, activation, axis_name):
    y = _bn_act_train(x, scale, bias, nhw_stats, eps, activation, axis_name)
    return y, (x, scale, nhw_stats, y)


def _bn_act_train_bwd(eps, activation, axis_name, res, dy):
    x, scale, (mean, inv), y = res
    cdt = jnp.promote_types(x.dtype, jnp.float32)
    # intermediates stay in the STORAGE dtype (bf16 traffic is half of
    # f32; the reductions below still accumulate in f32) — f32 inputs
    # keep full-precision math
    if activation == "leaky_relu":
        # y and pre-activation share sign; slope 1 on the >= 0 branch
        dpre = jnp.where(y >= 0, dy, dy * jnp.asarray(0.01, dy.dtype))
    elif activation == "relu":
        dpre = jnp.where(y > 0, dy, jnp.zeros((), dy.dtype))
    else:
        dpre = dy
    xhat = ((x.astype(cdt) - mean) * inv).astype(x.dtype)
    red = tuple(range(x.ndim - 1))
    db = jnp.sum(dpre, axis=red, dtype=cdt)
    ds = jnp.sum((dpre * xhat), axis=red, dtype=cdt)
    n = x.size // x.shape[-1]
    if axis_name is not None:
        db = jax.lax.psum(db, axis_name)
        ds = jax.lax.psum(ds, axis_name)
        n = n * jax.lax.psum(1, axis_name)
    # the dx combine runs in the STORAGE dtype with per-channel f32
    # coefficients pre-cast once ([C] vectors): upcasting the [N,H,W,C]
    # dpre/xhat tensors to f32 materialized standalone convert+relayout
    # copies (~7.6 ms of the bf16 TD4 train step) because bf16 and f32
    # tile differently on TPU. For f32 inputs storage == compute dtype
    # and the math is unchanged.
    dx = ((scale.astype(cdt) * inv).astype(x.dtype)
          * (dpre - (db / n).astype(x.dtype)
             - xhat * (ds / n).astype(x.dtype)))
    # nhw_stats entered through a stop_gradient boundary (torch: batch
    # stats are constants w.r.t. the parameters being optimized is NOT
    # true — the db/n and ds/n terms above ARE the mean/var chain terms,
    # folded into dx analytically)
    return dx, ds.astype(scale.dtype), db.astype(scale.dtype), (None, None)


_bn_act_train.defvjp(_bn_act_train_fwd, _bn_act_train_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _bn_add_act_train(x, resid, scale, bias, nhw_stats, eps, activation,
                      axis_name):
    """act(bn(x) + resid) — the residual-block tail (reference
    BasicBlock/Bottleneck: bn -> += identity -> relu) as ONE fused op
    with the same 2-pass VJP as ``_bn_act_train``. Folding the add+relu
    in removes a separate activation backward pass (select + layout
    copy) per block over the c4-grid activations."""
    mean, inv = nhw_stats
    cdt = jnp.promote_types(x.dtype, jnp.float32)
    y = ((x.astype(cdt) - mean) * (inv * scale.astype(cdt))
         + bias.astype(cdt) + resid.astype(cdt)).astype(x.dtype)
    return _apply_act(y, activation)


def _bn_add_act_train_fwd(x, resid, scale, bias, nhw_stats, eps, activation,
                          axis_name):
    y = _bn_add_act_train(x, resid, scale, bias, nhw_stats, eps, activation,
                          axis_name)
    return y, (x, scale, nhw_stats, y)


def _bn_add_act_train_bwd(eps, activation, axis_name, res, dy):
    x, scale, (mean, inv), y = res
    cdt = jnp.promote_types(x.dtype, jnp.float32)
    if activation == "leaky_relu":
        dpre = jnp.where(y >= 0, dy, dy * jnp.asarray(0.01, dy.dtype))
    elif activation == "relu":
        dpre = jnp.where(y > 0, dy, jnp.zeros((), dy.dtype))
    else:
        dpre = dy
    xhat = ((x.astype(cdt) - mean) * inv).astype(x.dtype)
    red = tuple(range(x.ndim - 1))
    db = jnp.sum(dpre, axis=red, dtype=cdt)
    ds = jnp.sum((dpre * xhat), axis=red, dtype=cdt)
    n = x.size // x.shape[-1]
    if axis_name is not None:
        db = jax.lax.psum(db, axis_name)
        ds = jax.lax.psum(ds, axis_name)
        n = n * jax.lax.psum(1, axis_name)
    # storage-dtype dx combine — see _bn_act_train_bwd
    dx = ((scale.astype(cdt) * inv).astype(x.dtype)
          * (dpre - (db / n).astype(x.dtype)
             - xhat * (ds / n).astype(x.dtype)))
    return (dx, dpre, ds.astype(scale.dtype), db.astype(scale.dtype),
            (None, None))


_bn_add_act_train.defvjp(_bn_add_act_train_fwd, _bn_add_act_train_bwd)


def init_batch_norm(c: int, dtype=jnp.float32):
    return {
        "scale": jnp.ones((c,), dtype),
        "bias": jnp.zeros((c,), dtype),
        "mean": jnp.zeros((c,), dtype),
        "var": jnp.ones((c,), dtype),
    }


def batch_norm(x: jnp.ndarray, params: dict, *, train: bool = False,
               eps: float = 1e-5, momentum: float = 0.1,
               activation: str | None = None, axis_name: str | None = None,
               fused: bool = True, residual: jnp.ndarray | None = None):
    """NHWC batch norm. Returns ``y`` in eval mode, ``(y, new_stats)`` in train.

    ``new_stats`` is a dict with updated ``mean``/``var`` running buffers
    (unbiased variance, matching torch). In train mode the normalize +
    activation (and its full backward, batch-stat chain terms included)
    run through the 2-pass custom-VJP ``_bn_act_train`` when ``fused``;
    ``fused=False`` keeps the naive autodiff formulation (reference
    dataflow for A/B tests — same math, float-sum order apart).
    """
    cdt = jnp.promote_types(x.dtype, jnp.float32)
    if train:
        xf = x.astype(cdt)
        red = tuple(range(x.ndim - 1))
        mean = jnp.mean(xf, axis=red)
        mean_sq = jnp.mean(jnp.square(xf), axis=red)
        if axis_name is not None:
            mean = jax.lax.pmean(mean, axis_name)
            mean_sq = jax.lax.pmean(mean_sq, axis_name)
        var = mean_sq - jnp.square(mean)
        n = x.size // x.shape[-1]
        if axis_name is not None:
            n = n * jax.lax.psum(1, axis_name)
        unbiased = var * (n / max(n - 1, 1))
        new_stats = {
            "mean": (1 - momentum) * params["mean"]
                    + momentum * jax.lax.stop_gradient(mean).astype(params["mean"].dtype),
            "var": (1 - momentum) * params["var"]
                   + momentum * jax.lax.stop_gradient(unbiased).astype(params["var"].dtype),
        }
        if fused:
            # the VJP folds the mean/var chain terms into dx analytically,
            # so the stats enter through a stop_gradient boundary
            stats = (jax.lax.stop_gradient(mean),
                     jax.lax.stop_gradient(jax.lax.rsqrt(var + eps)))
            if residual is None:
                y = _bn_act_train(x, params["scale"], params["bias"], stats,
                                  eps, activation, axis_name)
            else:
                y = _bn_add_act_train(x, residual, params["scale"],
                                      params["bias"], stats, eps, activation,
                                      axis_name)
            return y, new_stats
        inv = jax.lax.rsqrt(var + eps) * params["scale"].astype(cdt)
        y = ((x.astype(cdt) - mean) * inv
             + params["bias"].astype(cdt)).astype(x.dtype)
        if residual is not None:
            # add AFTER the storage-dtype cast: identical rounding to the
            # unfused two-op form (bn then out + res)
            y = y + residual
        return _apply_act(y, activation), new_stats

    if "fscale" in params:
        # pre-folded eval affine (fold_bn_eval): the per-frame
        # rsqrt(var+eps)*scale / bias-mean*inv [C]-vector chains are
        # computed ONCE at streamer construction instead of inside every
        # jitted frame step. Same f32 affine math, distributed over the
        # subtraction (x*a + (b - m*a) vs (x - m)*a + b — float-order
        # class difference only).
        y = (x.astype(cdt) * params["fscale"] + params["fbias"]).astype(x.dtype)
        if residual is not None:
            y = y + residual
        return _apply_act(y, activation)
    mean = params["mean"].astype(cdt)
    var = params["var"].astype(cdt)
    inv = jax.lax.rsqrt(var + eps) * params["scale"].astype(cdt)
    y = ((x.astype(cdt) - mean) * inv + params["bias"].astype(cdt)).astype(x.dtype)
    if residual is not None:
        y = y + residual
    return _apply_act(y, activation)


def fold_bn_eval(tree, eps: float = 1e-5):
    """Pre-fold every BatchNorm in a params pytree for eval-mode use.

    Any dict carrying exactly the BN keys {scale, bias, mean, var} with
    equal shapes (LayerNorm2d carries only scale/bias and never matches;
    a stacked-path tree's [P, C] leaves fold elementwise) is replaced by
    {fscale, fbias} f32 with
    ``fscale = scale * rsqrt(var + eps)`` and
    ``fbias = bias - mean * fscale``, exactly the coefficients the eval
    branch of ``batch_norm`` derives per call. Inference-only: a folded
    tree has no running stats, so ``train=True`` paths must never see it
    (``batch_norm`` would KeyError on "mean" — loudly, by design).
    """
    bn_keys = {"scale", "bias", "mean", "var"}

    def walk(node):
        if isinstance(node, dict):
            if (set(node.keys()) == bn_keys
                    and all(hasattr(v, "shape") for v in node.values())
                    and len({v.shape for v in node.values()}) == 1):
                fscale = (node["scale"].astype(jnp.float32)
                          * jax.lax.rsqrt(node["var"].astype(jnp.float32)
                                          + eps))
                fbias = (node["bias"].astype(jnp.float32)
                         - node["mean"].astype(jnp.float32) * fscale)
                return {"fscale": fscale, "fbias": fbias}
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(tree)


def init_layer_norm_2d(h: int, w: int, dtype=jnp.float32):
    return {"scale": jnp.ones((h, w), dtype), "bias": jnp.zeros((h, w), dtype)}


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ln2d(x, scale, bias, eps):
    """LayerNorm([H, W]) with a hand-written 2-pass VJP.

    XLA's autodiff of the naive formulation materialized an f32 copy of
    the [N,H,W,C] activation (the shared ``xf``; ~1.9 ms/step each in the
    bf16 TD4 train profile) and ran ~6 passes backward; this is 2 fused
    passes each way with storage-dtype intermediates, like
    ``_bn_act_train``."""
    cdt = jnp.promote_types(x.dtype, jnp.float32)
    mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=cdt)
    var = jnp.mean(jnp.square(x.astype(cdt) - mean), axis=(1, 2),
                   keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    y = ((x.astype(cdt) - mean) * inv * scale.astype(cdt)[None, :, :, None]
         + bias.astype(cdt)[None, :, :, None])
    return y.astype(x.dtype)


def _ln2d_fwd(x, scale, bias, eps):
    cdt = jnp.promote_types(x.dtype, jnp.float32)
    mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=cdt)
    var = jnp.mean(jnp.square(x.astype(cdt) - mean), axis=(1, 2),
                   keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhatf = (x.astype(cdt) - mean) * inv
    # y keeps the full f32 chain (identical rounding to the primal);
    # only the SAVED xhat rounds to the storage dtype
    y = (xhatf * scale.astype(cdt)[None, :, :, None]
         + bias.astype(cdt)[None, :, :, None]).astype(x.dtype)
    return y, (xhatf.astype(x.dtype), inv, scale)


def _ln2d_bwd(eps, res, dy):
    xhat, inv, scale = res
    cdt = jnp.promote_types(dy.dtype, jnp.float32)
    sdt = dy.dtype
    dxh = dy * scale.astype(sdt)[None, :, :, None]
    n = xhat.shape[1] * xhat.shape[2]
    m1 = jnp.sum(dxh, axis=(1, 2), keepdims=True, dtype=cdt) / n
    m2 = jnp.sum(dxh * xhat, axis=(1, 2), keepdims=True, dtype=cdt) / n
    dx = ((inv.astype(sdt))
          * (dxh - m1.astype(sdt) - xhat * m2.astype(sdt)))
    dscale = jnp.sum((dy * xhat).astype(cdt), axis=(0, 3))
    dbias = jnp.sum(dy.astype(cdt), axis=(0, 3))
    return dx, dscale.astype(scale.dtype), dbias.astype(scale.dtype)


_ln2d.defvjp(_ln2d_fwd, _ln2d_bwd)


def layer_norm_2d(x: jnp.ndarray, params: dict, eps: float = 1e-5) -> jnp.ndarray:
    """torch nn.LayerNorm([H, W]) applied to NHWC input.

    Normalizes each (n, c) spatial plane over H*W then applies the learned
    per-pixel [H, W] affine (broadcast over channels). Forward math and
    float-order match the pre-VJP formulation (mean via f32-accumulated
    reduce; E[(x-mean)^2] variance); the backward is the 2-pass ``_ln2d``
    custom VJP."""
    return _ln2d(x, params["scale"], params["bias"], eps)
