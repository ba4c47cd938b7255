"""AOT export of the streaming step (StableHLO serialization).

Production serving should not require the Python model code: this
serializes each path's jitted streaming step with ``jax.export`` so a
deployment host deserializes bytes and calls, with the K/V/Q cache
threaded as a plain array pytree. Weights are baked into the exported
computation as constants (single-artifact deployment) or kept as
arguments (``bake_params=False``) for weight hot-swap.

The reference has no deployment story beyond the Python CLI
(Testing/test.py); this is TPU-era serving hygiene on top of parity.
"""

from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp
from jax import export as jax_export

from tdnet_tpu.models import model_init_cache, model_stream_step
from tdnet_tpu.models.tdnet import select_path
from tdnet_tpu.nn.module import Ctx


def export_streaming_model(params: dict, cfg, path: str, *, batch: int = 1,
                           dtype=jnp.bfloat16, attn_impl: str = "xla",
                           fused_trunk: bool = True,
                           bake_params: bool = True) -> None:
    """Serialize all path variants of the streaming step to ``path``.

    Platform pinning: ``attn_impl='xla'`` artifacts are lowered for BOTH
    cpu and tpu (portable); ``attn_impl='pallas'`` emits a Mosaic custom
    call and is pinned to tpu — it still exports fine from a CPU host
    (cross-lowering), but ``ExportedStreamer`` will refuse to load it on
    a non-TPU backend with a clear error.
    """
    platforms = ("tpu",) if attn_impl == "pallas" else ("cpu", "tpu")
    stream_step_fn = model_stream_step(cfg)
    init_cache = model_init_cache(cfg)
    if dtype != jnp.float32:
        params = jax.tree.map(
            lambda x: x.astype(dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    cache = init_cache(cfg, batch, dtype)
    img = jnp.zeros((batch, *cfg.in_size, 3), dtype)

    blobs = []
    for p in range(cfg.path_num):
        pp = select_path(params["paths"], p)
        ap = select_path(params["atn"], p)
        ctx_kw = dict(train=False, attn_impl=attn_impl,
                      fused_trunk=fused_trunk)

        if bake_params:
            def fn(cache, img, pp=pp, ap=ap, pid=cfg.psp_pid(p)):
                return stream_step_fn(pp, ap, cache, img, cfg, pid,
                                      Ctx(**ctx_kw))
            args = (cache, img)
        else:
            def fn(pp, ap, cache, img, pid=cfg.psp_pid(p)):
                return stream_step_fn(pp, ap, cache, img, cfg, pid,
                                      Ctx(**ctx_kw))
            args = (pp, ap, cache, img)

        exported = jax_export.export(jax.jit(fn),
                                     platforms=list(platforms))(*args)
        blobs.append(exported.serialize())

    meta = {
        "path_num": cfg.path_num,
        "in_size": tuple(cfg.in_size),
        "nclass": cfg.nclass,
        "batch": batch,
        "dtype": str(jnp.dtype(dtype)),
        "bake_params": bake_params,
        "attn_impl": attn_impl,
        "platforms": platforms,
        "cache_spec": jax.tree.map(
            lambda x: (tuple(x.shape), str(x.dtype)), cache),
    }
    with open(path, "wb") as f:
        pickle.dump({"meta": meta, "steps": blobs}, f, protocol=4)


class ExportedStreamer:
    """Deserialize and drive an exported streaming model — no model
    code or weights needed beyond the artifact."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            blob = pickle.load(f)
        self.meta = blob["meta"]
        assert self.meta["bake_params"], (
            "ExportedStreamer drives baked-params artifacts; for "
            "weight-swap artifacts call the deserialized steps directly")
        platforms = tuple(self.meta.get("platforms", ("cpu", "tpu")))
        backend = jax.default_backend()
        if backend not in platforms:
            raise RuntimeError(
                f"artifact was lowered for {platforms} "
                f"(attn_impl={self.meta.get('attn_impl', '?')!r}) but the "
                f"current backend is {backend!r}; Pallas custom calls pin "
                "the artifact to TPU — re-export with attn_impl='xla' for "
                "a portable artifact")
        self._steps = [jax_export.deserialize(b).call
                       for b in blob["steps"]]
        shapes = self.meta["cache_spec"]
        self.cache = jax.tree.map(
            lambda sd: jnp.zeros(sd[0], jnp.dtype(sd[1])), shapes,
            is_leaf=lambda x: isinstance(x, tuple) and len(x) == 2
            and isinstance(x[0], tuple))
        self.frame_idx = 0

    def step(self, img):
        p = self.frame_idx % self.meta["path_num"]
        out, self.cache = self._steps[p](self.cache, img)
        self.frame_idx += 1
        return out
