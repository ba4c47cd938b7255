"""Data loaders — reference registry (Training/ptsemseg/loader/__init__.py)
plus the CamVid / NYUDv2 loaders the reference README references but
never shipped (SURVEY.md section 6)."""

from tdnet_tpu.data.streaming import (CAMVID_COLORS, CITYSCAPES_COLORS,
                                      FrameSource, decode_segmap,
                                      normalize_frame)
from tdnet_tpu.data.cityscapes import CityscapesClips, ClipBatcher


def get_loader(name: str):
    from tdnet_tpu.data.camvid import CamVidClips
    from tdnet_tpu.data.nyudv2 import NYUDv2Clips
    return {
        "cityscapes": CityscapesClips,
        "camvid": CamVidClips,
        "nyud2": NYUDv2Clips,
        "nyudv2": NYUDv2Clips,
    }[name]
