"""Training step and state (the reference train loop's inner body).

The reference computes the full loss INSIDE model.forward so that
DataParallel scatters frames/labels and gathers scalar losses
(Training/train.py:91-94, SURVEY.md 1). Under GSPMD there is nothing to
scatter or gather: the step below is one jitted function over a
``(data, path)`` mesh — batch sharded over ``data``, the stacked
sub-network axis sharded over ``path`` — and XLA inserts every
collective (SyncBN moment reductions, gradient all-reduce, the hop-chain
activation exchange between path shards).

Loss recipe (td4_psp.py:367-374):
  loss = CE(out) + 0.5*CE(out_sub) + 0.1*CE(auxout) + 1.0*KD
  KD   = KL(out||T_full) + 0.5*KL(out_sub||T_group_p)     at the c4 grid
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from tdnet_tpu.models import init_model, model_clip_forward
from tdnet_tpu.models.tdnet import TDNetConfig
from tdnet_tpu.models.teacher import TeacherConfig, apply_teacher
from tdnet_tpu.nn.module import Ctx
from tdnet_tpu.parallel.mesh import shard_params
from tdnet_tpu.train.loss import cross_entropy, kl_divergence
from tdnet_tpu.train.optim import ada_optimizer

DEFAULT_OPT = dict(lr0=1e-2, momentum=0.9, wd=1e-4, warmup_steps=1000,
                   warmup_start_lr=1e-5, power=0.9)


def _cast_wb(tree, dtype):
    """Cast conv/linear weights (leaf keys ``w``/``b``) to ``dtype``.

    Norm affines and BN running stats (``scale``/``bias``/``mean``/``var``)
    stay f32: ``batch_norm`` computes its moments and affine in f32 even
    for low-precision activations, so statistics never round through bf16.
    """
    def cast(path, leaf):
        k = path[-1]
        if (isinstance(k, jax.tree_util.DictKey) and k.key in ("w", "b")
                and jnp.issubdtype(leaf.dtype, jnp.floating)):
            return leaf.astype(dtype)
        return leaf
    return jax.tree_util.tree_map_with_path(cast, tree)


def _graft_bn_stats(master, updated):
    """Graft BN running stats (``mean``/``var``) from a forward pass over a
    low-precision weight cast back onto the f32 master tree. Every other
    leaf keeps the master value — the forward only mutates BN stats, and
    applying optimizer updates to cast weights would round the masters."""
    upd = {jax.tree_util.keystr(p): l
           for p, l in jax.tree_util.tree_flatten_with_path(updated)[0]}

    def pick(path, m):
        k = path[-1]
        if isinstance(k, jax.tree_util.DictKey) and k.key in ("mean", "var"):
            return upd[jax.tree_util.keystr(path)].astype(m.dtype)
        return m
    return jax.tree_util.tree_map_with_path(pick, master)


def _mesh_unroll(mesh) -> bool:
    """Unrolled per-path convs on an unsharded path axis (fast
    single-chip form); the vmapped/stacked form when the mesh partitions
    "path" — static indexing of a path-sharded axis would gather every
    sub-network's params to all devices."""
    return mesh is None or dict(zip(mesh.axis_names, mesh.devices.shape)
                                ).get("path", 1) == 1


def make_train_state(key, cfg: TDNetConfig, mesh=None, *, max_iter: int = 40000,
                     teacher: bool = False, opt_kwargs: dict | None = None,
                     params: dict | None = None) -> dict:
    opt_kwargs = {**DEFAULT_OPT, **(opt_kwargs or {}), "max_iter": max_iter}
    if params is None:
        params = init_model(key, cfg)
    if mesh is not None:
        params = shard_params(params, mesh)
    tx, _ = ada_optimizer(params, **opt_kwargs)
    return {
        "params": params,
        "opt_state": tx.init(params),
        "it": jnp.zeros((), jnp.int32),
        "rng": key,
    }


def make_loss_of(cfg: TDNetConfig, *,
                 teacher_cfg: TeacherConfig | None = None,
                 loss_fn=None, axis_name=None, use_dropout: bool = True,
                 compute_dtype=None, unroll: bool = True,
                 stem_impl: str = "oct", conv_wgrad: str | None = None,
                 attn_impl: str | None = None,
                 teacher_quant: str | None = None):
    """The assembled training loss (reference td4_psp.py:367-374):
    ``CE(out) + 0.5*CE(out_sub) [+ 0.1*CE(auxout)] + 1.0*KD`` where
    ``KD = KL(out||T_full) + 0.5*KL(out_sub||T_group_p)`` at the c4 grid.

    Returns ``loss_of(params, frames, labels, pos_id, rng, teacher_params)
    -> (loss, {"updated_params", "kd"})``. ``use_dropout=False`` keeps
    train-mode BN but disables dropout (deterministic oracle testing).

    ``compute_dtype=jnp.bfloat16`` enables mixed-precision: conv weights
    and activations are cast to bf16 for the forward/backward (4x MXU
    rate on TPU), while master params, gradients, BN moments/running
    stats and every loss term stay f32. OFF by default — the default
    dataflow is the reference's full-f32 recipe.

    ``stem_impl="oct"`` (default) runs channel-starved 7x7/s2 stems as
    one dense im2col matmul (ops/conv.py:conv2d_stem_oct) — same
    multiset of products as the direct conv (float-sum order only), and
    its weight gradient becomes a dense matmul too: XLA's conv-wgrad at
    C_in=3 runs at ~1 TFLOP/s (22.7 of 255 ms/step across the 4 paths;
    measured 255 -> 202 ms/step). The full-recipe loss oracle runs
    against this default.
    """
    if loss_fn is None:
        loss_fn = lambda lg, lb: cross_entropy(lg, lb, 250)
    if conv_wgrad is None:
        # measured per-dtype on v5e (TD4-PSP18 full recipe): bf16 is
        # fastest with XLA fwd/dgrad + matmul wgrad (140.6 ms/step;
        # "mm" 149.7 was slower), while f32 is fastest fully matmul-form
        # ("mm" 164.7 vs "mm_wgrad" 181.1 — f32 direct convs pay more
        # than the mm slices cost). The Pallas dilated-conv kernel wins
        # per-conv in isolation but regresses the full step (179.5) —
        # the pallas_call boundary blocks fusion; opt-in only.
        conv_wgrad = "mm" if compute_dtype is None else "mm_wgrad"
    if attn_impl is None:
        # the differentiable fused attention kernel (custom VJP, in-kernel
        # dropout) is Mosaic/TPU-only; CPU meshes (tests, the multichip
        # dryrun) keep the XLA formulation. Same math, float-sum order
        # apart; dropout RNG streams are impl-defined (docs/PARITY.md).
        attn_impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    # the frozen teacher runs in eval mode; "xla" measured fastest for its
    # deep-base stem (the Pallas fused tail was tried and rejected — 2.4x
    # slower than XLA's fusions plus a Mosaic compile-time blowup at
    # deployment widths; docs/PERF.md rejected table).
    teacher_stem = "xla"

    fwd = model_clip_forward(cfg)

    def loss_of(params, frames, labels, pos_id, rng, teacher_params):
        ctx = Ctx(train=True, rng=rng, axis_name=axis_name,
                  use_dropout=use_dropout, stem_impl=stem_impl,
                  conv_wgrad=conv_wgrad, attn_impl=attn_impl)
        fparams, fframes = params, frames
        if compute_dtype is not None:
            fparams = _cast_wb(params, compute_dtype)
            fframes = frames.astype(compute_dtype)
        res = fwd(fparams, fframes, pos_id, cfg, ctx, unroll=unroll)
        loss = (loss_fn(res["out"], labels)
                + 0.5 * loss_fn(res["out_sub"], labels))
        if cfg.aux:
            loss = loss + 0.1 * loss_fn(res["auxout"], labels)
        kd = jnp.zeros((), jnp.float32)
        if teacher_cfg is not None and teacher_params is not None:
            tparams = (teacher_params if compute_dtype is None
                       else _cast_wb(teacher_params, compute_dtype))
            t_full, t_grp = apply_teacher(tparams, fframes[-1], teacher_cfg,
                                          group_id=pos_id,
                                          quant=teacher_quant,
                                          stem_impl=teacher_stem)
            kd = (kl_divergence(res["out_lowres"], t_full)
                  + 0.5 * kl_divergence(res["out_sub_lowres"], t_grp))
            loss = loss + kd
        updated = res["updated_params"]
        if compute_dtype is not None:
            updated = _graft_bn_stats(params, updated)
        aux = {"updated_params": updated, "kd": kd}
        return loss, aux

    return loss_of


def make_train_step(cfg: TDNetConfig, mesh=None, *,
                    teacher_cfg: TeacherConfig | None = None,
                    max_iter: int = 40000, loss_fn=None,
                    opt_kwargs: dict | None = None, axis_name=None,
                    donate: bool = True, compute_dtype=None,
                    conv_wgrad: str | None = None,
                    attn_impl: str | None = None,
                    teacher_quant: str | None = None):
    """Returns jitted ``step(state, frames, labels, pos_id[, teacher_params])``.

    frames: [P, N, H, W, 3] float32 (f1..fP, oldest..current);
    labels: [N, H, W] int (current frame's ground truth).
    ``compute_dtype=jnp.bfloat16`` opts into mixed-precision (see
    ``make_loss_of``); default None is the reference f32 recipe.
    """
    opt_kwargs = {**DEFAULT_OPT, **(opt_kwargs or {}), "max_iter": max_iter}
    loss_of = make_loss_of(cfg, teacher_cfg=teacher_cfg, loss_fn=loss_fn,
                           axis_name=axis_name, compute_dtype=compute_dtype,
                           unroll=_mesh_unroll(mesh), conv_wgrad=conv_wgrad,
                           attn_impl=attn_impl, teacher_quant=teacher_quant)

    def step(state, frames, labels, pos_id, teacher_params=None):
        tx, schedule = ada_optimizer(state["params"], **opt_kwargs)
        rng = jax.random.fold_in(state["rng"], state["it"])
        (loss, aux), grads = jax.value_and_grad(loss_of, has_aux=True)(
            state["params"], frames, labels, pos_id, rng, teacher_params)
        updates, opt_state = tx.update(grads, state["opt_state"],
                                       state["params"])
        params = optax.apply_updates(aux["updated_params"], updates)
        new_state = {"params": params, "opt_state": opt_state,
                     "it": state["it"] + 1, "rng": state["rng"]}
        metrics = {"loss": loss, "kd": aux["kd"],
                   "lr": schedule(state["it"])}
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(cfg: TDNetConfig, mesh=None, *, unroll: bool | None = None,
                   quant: str | None = None):
    """Validation forward (training twin, eval mode): logits for fP.
    ``unroll`` follows the mesh like make_train_step unless forced.
    ``quant='int8'`` evaluates the int8 PTQ backbone (ops/quant.py) so
    its mIoU cost is measurable with the same CLI."""
    if unroll is None:
        unroll = _mesh_unroll(mesh)
    fwd = model_clip_forward(cfg)

    def eval_step(params, frames, pos_id):
        res = fwd(params, frames, pos_id, cfg,
                  Ctx(train=False, stem_impl="oct", quant=quant),
                  unroll=unroll)
        return jnp.argmax(res["out"], axis=-1)

    from tdnet_tpu.ops.quant import compiler_options_for
    return jax.jit(eval_step, compiler_options=compiler_options_for(quant))
