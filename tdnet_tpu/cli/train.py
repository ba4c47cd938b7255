"""Training CLI — reference-compatible.

``python -m tdnet_tpu.cli.train --config configs/td4_psp18_cityscapes.yml``
mirrors Training/train.py: seeded iteration-driven loop, loss computed
in-graph, periodic validation with best-mIoU checkpointing, run dir
``runs/<cfg>/<id>`` with a config copy and file logger.

TPU replacements: GSPMD jit over a (data, path) mesh instead of
DataParallel; SyncBN via sharded-batch moments; teacher + student
bootstrapped from the same torch checkpoints via channel surgery.
"""

from __future__ import annotations

import argparse
import random
import time

import numpy as np

import jax
import jax.numpy as jnp


def train(cfg: dict, logger, logdir: str, *, max_steps: int | None = None,
          path_parallel: int | None = None, resume_state: str | None = None):
    from tdnet_tpu.data.augment import get_composed_augmentations
    from tdnet_tpu.data.cityscapes import ClipBatcher
    from tdnet_tpu.data import get_loader
    from tdnet_tpu.models import FATDConfig, init_model, init_teacher
    from tdnet_tpu.parallel.mesh import make_mesh, train_shardings
    from tdnet_tpu.train.metrics import AverageMeter, RunningScore
    from tdnet_tpu.train.trainer import (make_eval_step, make_train_state,
                                         make_train_step)
    from tdnet_tpu.utils import checkpoint as ckpt
    from tdnet_tpu.utils.config import (loss_fn_from_yaml,
                                        model_config_from_yaml,
                                        opt_kwargs_from_yaml,
                                        teacher_config_from_yaml)
    from tdnet_tpu.utils.surgery import (student_bootstrap_from_psp_checkpoint,
                                         teacher_from_psp_checkpoint)
    from tdnet_tpu.utils.torch_import import (fanet_bootstrap_from_checkpoint,
                                              load_torch_state)
    import os

    seed = 11733  # reference train.py:35
    np.random.seed(seed)
    random.seed(seed)

    path_n = cfg["model"]["path_num"]
    t_aug = get_composed_augmentations(
        cfg["training"].get("train_augmentations"), seed=seed)
    v_aug = get_composed_augmentations(
        cfg["validating"].get("val_augmentations"), seed=seed)

    loader_cls = get_loader(cfg["data"]["dataset"])
    data_path = cfg["data"]["path"]
    t_ds = loader_cls(data_path, split=cfg["data"]["train_split"],
                      augmentations=t_aug, path_num=path_n, seed=seed)
    v_ds = loader_cls(data_path, split=cfg["data"]["val_split"],
                      augmentations=v_aug, path_num=path_n, seed=seed)
    batcher = ClipBatcher(t_ds, cfg["training"]["batch_size"], shuffle=True,
                          drop_last=True,
                          num_workers=cfg["training"]["n_workers"],
                          seed=seed, infinite=True)
    v_batcher = ClipBatcher(v_ds, cfg["validating"]["batch_size"],
                            shuffle=False, drop_last=False,
                            num_workers=cfg["validating"]["n_workers"])

    import math
    n_dev = jax.device_count()
    pp = path_parallel or 1
    # data axis must divide the global batch; use as many devices as that
    # allows (a 2-image batch on an 8-chip mesh -> data=2)
    usable = max(1, n_dev // pp)
    data_size = math.gcd(int(cfg["training"]["batch_size"]), usable)
    mesh = make_mesh(n_devices=data_size * pp, path_parallel=pp)
    logger.info(f"mesh: {dict(mesh.shape)} over {n_dev} devices")

    mcfg = model_config_from_yaml(cfg, nclass=t_ds.n_classes, streaming=False)
    tcfg = teacher_config_from_yaml(cfg, nclass=t_ds.n_classes)
    loss_fn = loss_fn_from_yaml(cfg, n_devices=n_dev)
    opt_kwargs = opt_kwargs_from_yaml(cfg)
    max_iter = int(cfg["training"]["train_iters"])

    params = init_model(jax.random.PRNGKey(seed), mcfg)
    resume = cfg["training"].get("resume")
    if resume and os.path.isfile(resume):
        logger.info(f"Initializing sub networks with pretrained '{resume}'")
        bootstrap = (fanet_bootstrap_from_checkpoint
                     if isinstance(mcfg, FATDConfig)
                     else student_bootstrap_from_psp_checkpoint)
        params = bootstrap(load_torch_state(resume), mcfg, params)
    else:
        logger.info(f"No pretrained found at '{resume}'")
        # reference students build their backbones with pretrained=True
        # (ImageNet); use a locally cached checkpoint when available
        if not isinstance(mcfg, FATDConfig):
            from tdnet_tpu.utils.model_store import load_imagenet_backbone
            bb = load_imagenet_backbone(cfg["model"]["backbone"],
                                        mcfg.backbone_cfg)
            if bb is not None:
                P = mcfg.path_num
                paths = dict(params["paths"])
                paths["backbone"] = jax.tree.map(
                    lambda x: jnp.stack([x] * P), bb)
                params = {"paths": paths, "atn": params["atn"]}
                logger.info("initialized backbones from cached ImageNet "
                            "checkpoint")

    teacher_params = None
    if tcfg is not None:
        tpath = cfg["teacher"].get("teacher_model")
        if tpath and os.path.isfile(tpath):
            logger.info(f"Initializing Teacher with pretrained '{tpath}'")
            teacher_params = teacher_from_psp_checkpoint(
                load_torch_state(tpath), tcfg)
        else:
            logger.info(f"No teacher pretrained found at '{tpath}' — "
                        "using random frozen teacher")
            teacher_params = init_teacher(jax.random.PRNGKey(seed + 1), tcfg)

    state = make_train_state(jax.random.PRNGKey(seed), mcfg, mesh,
                             max_iter=max_iter, opt_kwargs=opt_kwargs,
                             params=params)
    # orbax: per-shard directory checkpoints, async (overlaps the write
    # with training); pickle (default): one portable host file
    orbax = cfg["training"].get("ckpt_backend") == "orbax"

    def save_state_latest(final: bool = False):
        if orbax:
            # async except at exit: the write overlaps the next steps,
            # and the crash-safe swap keeps the previous checkpoint
            # restorable throughout (utils/checkpoint.py)
            ckpt.save_pytree_orbax(
                os.path.join(logdir, "state_latest.orbax"), state,
                async_=not final)
        else:
            ckpt.save_pytree(os.path.join(logdir, "state_latest.pkl"),
                             state)

    start_iter = 0
    resume_dir = ckpt.resolve_ckpt_dir(resume_state) if resume_state else None
    if resume_state and (os.path.isdir(resume_dir)
                         or os.path.isfile(resume_state)):
        # resume-from-step (preemption recovery; exceeds the reference's
        # best-only checkpointing, SURVEY.md 5.3). Directory = orbax.
        # orbax needs the template to restore tuple/NamedTuple structure
        # (optax states) rather than plain lists
        saved = (ckpt.load_pytree_orbax(resume_dir, like=state)
                 if os.path.isdir(resume_dir)
                 else ckpt.load_pytree(resume_state))
        # re-place each leaf on its mesh sharding (scalars/rng replicated):
        # a bare jnp.asarray would commit everything to one device and
        # clash with the sharded opt_state inside the jitted step
        from jax.sharding import NamedSharding, PartitionSpec
        rep = NamedSharding(mesh, PartitionSpec())
        state = jax.tree.map(
            lambda tpl, x: jax.device_put(
                jnp.asarray(x),
                tpl.sharding if isinstance(getattr(tpl, "sharding", None),
                                           NamedSharding) else rep),
            state, saved)
        start_iter = int(state["it"])
        logger.info(f"resumed training state from '{resume_state}' "
                    f"at iter {start_iter}")
    # opt-in mixed precision (TPU bf16 matmuls, f32 masters/stats/losses);
    # absent from the reference schema, so the default stays full f32
    compute_dtype = (jnp.bfloat16
                     if cfg["training"].get("mixed_precision") else None)
    if compute_dtype is not None:
        logger.info("mixed-precision training: bf16 compute, f32 masters")
    step = make_train_step(mcfg, mesh, teacher_cfg=tcfg, max_iter=max_iter,
                           loss_fn=loss_fn, opt_kwargs=opt_kwargs,
                           compute_dtype=compute_dtype)
    eval_step = make_eval_step(mcfg, mesh)
    sh = train_shardings(mesh)

    running = RunningScore(t_ds.n_classes)
    time_meter = AverageMeter()
    best_iou = 0.0
    cnt_iter = start_iter
    stop_at = min(max_iter, (start_iter + max_steps) if max_steps else max_iter)
    ckpt_interval = int(cfg["training"].get("ckpt_interval", 0) or 0)

    for frames, labels in batcher:
        cnt_iter += 1
        frames = jax.device_put(jnp.asarray(frames), sh.frames)
        labels = jax.device_put(jnp.asarray(labels), sh.labels)
        t0 = time.time()
        state, metrics = step(state, frames, labels,
                              jnp.int32(cnt_iter % path_n), teacher_params)
        jax.block_until_ready(metrics["loss"])
        time_meter.update(time.time() - t0)

        if (cnt_iter + 1) % cfg["training"]["print_interval"] == 0:
            loss_val = float(metrics["loss"])
            if not np.isfinite(loss_val):
                # failure detection (SURVEY.md 5.3): halt on divergence
                # with a state dump so the run is inspectable/resumable
                # rather than silently training on NaNs. Checked at log
                # cadence — the loss is already fetched here, and a
                # per-step device->host read would serialize the loop.
                dump = os.path.join(logdir, "state_nan_abort.pkl")
                ckpt.save_pytree(dump, state)
                logger.error(f"non-finite loss at iter {cnt_iter} "
                             f"(loss={loss_val}); state dumped to {dump}")
                raise FloatingPointError(
                    f"non-finite training loss at iter {cnt_iter} "
                    f"(state dumped to {dump})")
            msg = ("Iter [{:d}/{:d}]  Loss: {:.4f}  Time/Image: {:.4f}"
                   .format(cnt_iter + 1, max_iter, loss_val,
                           time_meter.avg / cfg["training"]["batch_size"]))
            print(msg)
            logger.info(msg)
            time_meter.reset()

        if ((cnt_iter + 1) % cfg["training"]["val_interval"] == 0
                or (cnt_iter + 1) == max_iter or cnt_iter >= stop_at):
            for i_val, (vf, vl) in enumerate(v_batcher):
                pred = eval_step(state["params"], jnp.asarray(vf),
                                 jnp.int32(i_val % path_n))
                running.update(jnp.asarray(vl), pred)
            score, class_iou = running.get_scores()
            for k, v in score.items():
                print(k, v)
                logger.info(f"{k}: {v}")
            for k, v in class_iou.items():
                logger.info(f"{k}: {v}")
            running.reset()
            if score["Mean IoU : \t"] >= best_iou:
                best_iou = score["Mean IoU : \t"]
                path = ckpt.save_best(
                    logdir, cfg["model"]["arch"], cfg["data"]["dataset"],
                    step=cnt_iter, params=state["params"], best_iou=best_iou)
                logger.info(f"saved best checkpoint to {path}")

        if ckpt_interval and cnt_iter % ckpt_interval == 0:
            save_state_latest()
            logger.info(f"periodic train-state checkpoint at iter {cnt_iter}")

        if cnt_iter >= stop_at:
            save_state_latest(final=True)
            break
    return state, best_iou


def main(argv=None):
    from tdnet_tpu.utils.checkpoint import get_logger, make_run_dir
    from tdnet_tpu.utils.config import load_config

    parser = argparse.ArgumentParser(description="config")
    parser.add_argument("--config", nargs="?", type=str,
                        help="Configuration file to use")
    parser.add_argument("--max_steps", type=int, default=None,
                        help="stop early after N steps (smoke runs)")
    parser.add_argument("--path_parallel", type=int, default=None,
                        help="shard the subnet axis over this many devices")
    parser.add_argument("--resume_state", type=str, default=None,
                        help="resume full train state (params+opt+iter) "
                             "from a state_latest.pkl")
    parser.add_argument("--debug_nans", action="store_true",
                        help="enable jax_debug_nans (fail fast on NaN)")
    args = parser.parse_args(argv)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    cfg = load_config(args.config)
    logdir = make_run_dir(args.config)
    print(f"RUNDIR: {logdir}")
    logger = get_logger(logdir)
    logger.info("Let the games begin")
    train(cfg, logger, logdir, max_steps=args.max_steps,
          path_parallel=args.path_parallel, resume_state=args.resume_state)


if __name__ == "__main__":
    main()
