"""Pretrained backbone store: SHA1-verified local cache + importers.

Reference (Training/ptsemseg/models/td4_psp/utils/{model_store,files}.py):
ImageNet backbone weights come from torchvision URLs (resnet18/34) or
the SHA1-pinned encoding model zoo (resnet50s/101s/152s with deep
stems), cached under ~/.encoding/models. This environment has no
egress, so this module resolves weights from local caches only —
~/.encoding/models, $TORCH_HOME/hub/checkpoints, or an explicit path —
verifies the SHA1 prefix when known, and converts the torch state dict
into our backbone pytree.

torchvision checkpoints use the same layer naming as the reference's
resnets (conv1/bn1/layerX.Y.{convZ,bnZ,downsample}) so
``resnet_from_torch`` applies with an empty prefix; fc weights are
ignored.
"""

from __future__ import annotations

import hashlib
import os

# SHA1 prefixes from the reference zoo (model_store.py short_hash table)
# and the torchvision download URLs.
KNOWN_SHA1 = {
    "resnet18": "5c106cde",
    "resnet34": "333f7ec4",
    "resnet50": "19c8e357",
    "resnet101": "5d3b4d8f",
    "resnet152": "b121ed2d",
    # encoding-zoo deep-stem variants
    "resnet50s": "ebb6acbb",
    "resnet101s": "2a57e44d",
    "resnet152s": "0d43d698",
}


def _candidate_dirs(root: str | None):
    dirs = []
    if root:
        dirs.append(os.path.expanduser(root))
    dirs.append(os.path.expanduser("~/.encoding/models"))
    torch_home = os.environ.get("TORCH_HOME",
                                os.path.expanduser("~/.cache/torch"))
    dirs.append(os.path.join(torch_home, "hub", "checkpoints"))
    return dirs


def check_sha1(filename: str, sha1_prefix: str) -> bool:
    """reference files.py:86-102: compare against a hash prefix."""
    sha1 = hashlib.sha1()
    with open(filename, "rb") as f:
        while True:
            data = f.read(1048576)
            if not data:
                break
            sha1.update(data)
    digest = sha1.hexdigest()
    l = min(len(digest), len(sha1_prefix))
    return digest[:l] == sha1_prefix[:l]


def get_model_file(name: str, root: str | None = None,
                   verify: bool = True) -> str | None:
    """Locate a cached pretrained checkpoint for ``name``; None if absent.

    (The reference downloads on miss — model_store.py:35-83; with no
    egress we surface a clear miss instead.)
    """
    sha = KNOWN_SHA1.get(name)
    for d in _candidate_dirs(root):
        if not os.path.isdir(d):
            continue
        for fn in sorted(os.listdir(d)):
            stem = fn.split(".")[0]
            base = stem.split("-")[0]
            if base != name:
                continue
            path = os.path.join(d, fn)
            if verify and sha and "-" in stem:
                if not check_sha1(path, stem.split("-")[1]):
                    continue
            return path
    return None


def load_imagenet_backbone(name: str, cfg, root: str | None = None):
    """Load + convert an ImageNet-pretrained backbone if cached locally.

    cfg: tdnet_tpu.nn.resnet.ResNetConfig. Returns a backbone pytree or
    None when no cached checkpoint exists.
    """
    path = get_model_file(name, root)
    if path is None:
        return None
    from tdnet_tpu.utils.torch_import import load_torch_state, resnet_from_torch
    sd = load_torch_state(path)
    sd = {k: v for k, v in sd.items() if not k.startswith("fc.")}
    return resnet_from_torch(sd, cfg, prefix="")
