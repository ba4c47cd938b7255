"""YAML config system — reference-schema compatible.

Reference configs (Training/configs/*.yml) have the fixed top-level
schema {model, teacher, data, training, validating}; augmentation
pipeline order is the YAML key order (Training/ptsemseg/augmentations/
__init__.py:39-41 — pyyaml>=5 on py3.7+ preserves it). Reference config
files port unchanged.
"""

from __future__ import annotations

import yaml


def load_config(path: str) -> dict:
    with open(path) as fp:
        return yaml.safe_load(fp)


def model_config_from_yaml(cfg: dict, nclass: int = 19,
                           in_size=None, streaming: bool = False):
    """cfg['model'] (+ train crop) -> TDNetConfig."""
    from tdnet_tpu.models import tdnet_config
    m = cfg["model"]
    if in_size is None:
        crop = cfg["training"]["train_augmentations"].get("rcrop", [769, 1537])
        in_size = tuple(crop)
    return tdnet_config(m["arch"], nclass=nclass, in_size=tuple(in_size),
                        streaming=streaming, backbone=m["backbone"],
                        path_num=m["path_num"])


def teacher_config_from_yaml(cfg: dict, nclass: int = 19):
    from tdnet_tpu.models import TeacherConfig
    t = cfg.get("teacher")
    if not t:
        return None
    return TeacherConfig(nclass=nclass, backbone=t.get("backbone", "resnet101"),
                         path_num=t["path_num"])


def loss_fn_from_yaml(cfg: dict, n_devices: int = 1):
    from tdnet_tpu.train.loss import make_loss_fn
    tr = cfg["training"]
    crop = tr["train_augmentations"].get("rcrop", [769, 1537])
    ctx = {"batch_size": tr["batch_size"], "n_devices": n_devices,
           "crop_size": crop, "loss": tr["loss"]}
    return make_loss_fn(tr["loss"]["name"], ctx)


def opt_kwargs_from_yaml(cfg: dict) -> dict:
    o = dict(cfg["training"]["optimizer"])
    name = o.pop("name", "adaoptimizer")
    if name != "adaoptimizer":
        raise NotImplementedError(
            f"optimizer {name!r}: only adaoptimizer is wired into the "
            "reference-compatible trainer")
    o.setdefault("warmup_steps", 1000)
    o.setdefault("warmup_start_lr", 1e-5)
    return {k: (float(v) if k != "warmup_steps" else int(v))
            for k, v in o.items() if k != "max_iter"} | {
                "max_iter": int(o.get("max_iter", cfg["training"]["train_iters"]))}
