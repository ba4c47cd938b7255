"""Model registry — reference-compatible names.

Training-side arches (Training/ptsemseg/models/__init__.py:34-44):
  td4_psp, td2_psp, pspnet_4p (teacher), pspnet_2p (teacher), td2_fa.
Testing-side model ids (Testing/test.py:22-38):
  td4-psp18, td2-psp50, psp101.
"""

from __future__ import annotations

from tdnet_tpu.models.tdnet import (TDNetConfig, backbone_feat_hw,
                                    clip_forward, init_cache, init_tdnet,
                                    select_path, stream_step)
from tdnet_tpu.models.fanet_td import (FATDConfig, fa_clip_forward,
                                       fa_stream_step, init_fa_cache,
                                       init_fatd)
from tdnet_tpu.models.pspnet import PSPNetConfig, apply_pspnet, init_pspnet
from tdnet_tpu.models.teacher import TeacherConfig, apply_teacher, init_teacher


def init_model(key, cfg, dtype=None):
    """Dispatch on config type (TDNetConfig vs FATDConfig)."""
    import jax.numpy as jnp
    dtype = dtype or jnp.float32
    if isinstance(cfg, FATDConfig):
        return init_fatd(key, cfg, dtype)
    return init_tdnet(key, cfg, dtype)


def model_clip_forward(cfg):
    return fa_clip_forward if isinstance(cfg, FATDConfig) else clip_forward


def model_stream_step(cfg):
    return fa_stream_step if isinstance(cfg, FATDConfig) else stream_step


def model_init_cache(cfg):
    return init_fa_cache if isinstance(cfg, FATDConfig) else init_cache


def tdnet_config(arch: str, nclass: int = 19,
                 in_size: tuple[int, int] = (769, 1537),
                 streaming: bool = True, **kw) -> TDNetConfig:
    """Build a TDNetConfig from a reference model name.

    ``streaming`` selects the Testing-twin KV settings (stride 4,
    pool-before-projection); training uses stride 3, and td2 projects
    before pooling (reference transformer.py variants, SURVEY.md 2.10.5).
    """
    arch = arch.replace("-", "_")
    if arch == "td2_fa":
        kw.setdefault("backbone", "resnet18")
        kw.pop("path_num", None)
        return FATDConfig(nclass=nclass, in_size=tuple(in_size), path_num=2,
                          **kw)
    presets = {
        "td4_psp18": dict(backbone="resnet18", path_num=4),
        "td4_psp": dict(backbone="resnet18", path_num=4),
        "td2_psp50": dict(backbone="resnet50", path_num=2),
        "td2_psp": dict(backbone="resnet50", path_num=2),
    }
    if arch not in presets:
        raise KeyError(f"unknown TDNet arch {arch!r}")
    base = presets[arch]
    base.update(kw)
    if streaming:
        base.setdefault("kv_stride", 4)
        base.setdefault("pool_before_proj", True)
        base.setdefault("aux", False)
    else:
        base.setdefault("kv_stride", 3)
        base.setdefault("pool_before_proj", base["path_num"] == 4)
        base.setdefault("aux", True)
    return TDNetConfig(nclass=nclass, in_size=tuple(in_size), **base)


__all__ = [
    "TDNetConfig", "init_tdnet", "init_cache", "stream_step", "clip_forward",
    "select_path", "backbone_feat_hw", "tdnet_config",
    "PSPNetConfig", "init_pspnet", "apply_pspnet",
    "TeacherConfig", "init_teacher", "apply_teacher",
]
