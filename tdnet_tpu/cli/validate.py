"""Validation CLI — reference-compatible.

``python -m tdnet_tpu.cli.validate --config ... [--measure_time]``
mirrors Training/validate.py: mIoU + per-class IoU + fps over the val
split using the training-side model in eval mode, round-robin
``pos_id = i % path_n`` (validate.py:66).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

import jax
import jax.numpy as jnp


def validate(cfg: dict, args):
    from tdnet_tpu.data import get_loader
    from tdnet_tpu.data.augment import get_composed_augmentations
    from tdnet_tpu.data.cityscapes import ClipBatcher
    from tdnet_tpu.models import FATDConfig, init_model
    from tdnet_tpu.train.metrics import RunningScore
    from tdnet_tpu.train.trainer import make_eval_step
    from tdnet_tpu.utils.checkpoint import load_pytree
    from tdnet_tpu.utils.config import model_config_from_yaml
    from tdnet_tpu.utils.torch_import import (fatd_from_torch,
                                              load_torch_state,
                                              tdnet_from_torch)

    path_n = cfg["model"]["path_num"]
    v_aug = get_composed_augmentations(
        cfg["validating"].get("val_augmentations"))
    loader_cls = get_loader(cfg["data"]["dataset"])
    v_ds = loader_cls(cfg["data"]["path"], split=cfg["data"]["val_split"],
                      augmentations=v_aug, path_num=path_n)
    scale = cfg["validating"].get("val_augmentations", {}).get("scale")
    in_size = tuple(scale) if scale else (769, 1537)
    mcfg = model_config_from_yaml(cfg, nclass=v_ds.n_classes,
                                  in_size=in_size, streaming=False)

    params = init_model(jax.random.PRNGKey(0), mcfg)
    from_torch = (fatd_from_torch if isinstance(mcfg, FATDConfig)
                  else tdnet_from_torch)
    resume = cfg["validating"].get("resume")
    if resume and os.path.isfile(resume):
        print(f"Loading '{resume}'")
        if resume.endswith(".pkl") and not args.native:
            try:
                params = from_torch(load_torch_state(resume), mcfg)
            except Exception:
                state = load_pytree(resume)
                params = state.get("model_state", state)
        else:
            state = load_pytree(resume)
            params = state.get("model_state", state)
    else:
        print(f"No checkpoint at '{resume}' — random weights")

    batcher = ClipBatcher(v_ds, cfg["validating"]["batch_size"],
                          shuffle=False, drop_last=False,
                          num_workers=cfg["validating"]["n_workers"])
    eval_step = make_eval_step(mcfg, quant=getattr(args, "quant", None))
    running = RunningScore(v_ds.n_classes)

    for i, (frames, labels) in enumerate(batcher):
        frames = jnp.asarray(frames)
        jax.block_until_ready(frames)
        t0 = time.perf_counter()
        pred = eval_step(params, frames, jnp.int32(i % path_n))
        pred.block_until_ready()
        dt = time.perf_counter() - t0
        running.update(jnp.asarray(labels), pred)
        if args.measure_time:
            print("Inference time (iter {0:5d}): {1:3.5f} fps"
                  .format(i + 1, labels.shape[0] / dt))
        if args.max_batches and i + 1 >= args.max_batches:
            break

    score, class_iou = running.get_scores()
    for k, v in score.items():
        print(k, v)
    for i in range(v_ds.n_classes):
        print(i, class_iou[i])
    return score, class_iou


def main(argv=None):
    from tdnet_tpu.utils.config import load_config
    parser = argparse.ArgumentParser(description="Hyperparams")
    parser.add_argument("--config", nargs="?", type=str,
                        default="configs/fcn8s_pascal.yml")
    parser.add_argument("--gpu", nargs="?", type=str, default="0",
                        help="accepted for reference compatibility (unused)")
    parser.add_argument("--eval_flip", dest="eval_flip", action="store_true")
    parser.add_argument("--no-eval_flip", dest="eval_flip",
                        action="store_false")
    parser.add_argument("--measure_time", dest="measure_time",
                        action="store_true")
    parser.add_argument("--no-measure_time", dest="measure_time",
                        action="store_false")
    parser.add_argument("--native", action="store_true",
                        help="checkpoint is a native pytree pickle")
    parser.add_argument("--max_batches", type=int, default=None)
    parser.add_argument("--quant", type=str, default=None, choices=["int8"],
                        help="validate the int8 PTQ backbone (ops/quant.py)")
    parser.set_defaults(measure_time=True)
    args = parser.parse_args(argv)
    validate(load_config(args.config), args)


if __name__ == "__main__":
    main()
