"""Spatial partitioning: one frame sharded over many chips.

The reference has no model/tensor parallelism (SURVEY.md 2.11); the
TPU-native way to cut single-frame latency below one chip's time is to
shard the image H dimension over a ``spatial`` mesh axis and let the
GSPMD partitioner insert conv halo exchanges over ICI. Params and the
(small) K/V/Q cache stay replicated; every conv/pool/resize is
partitioned automatically.

Use ``make_spatial_stream_step`` for multi-chip streaming; validated
against the single-device step on the virtual CPU mesh
(tests/test_spatial.py) and exercised by __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tdnet_tpu.nn.module import Ctx


def make_spatial_stream_step(cfg, mesh: Mesh, pid: int, *,
                             stream_step_fn=None, attn_impl: str = "xla",
                             stem_impl: str = "xla",
                             fused_trunk: bool = False,
                             quant: str | None = None,
                             donate_cache: bool = True):
    """jit a per-frame streaming step with the image H axis sharded over
    the mesh's ``spatial`` axis. Returns step(path_params, atn_p, cache,
    img) with img/logits sharded [n, H/spatial, W, c] and everything else
    replicated."""
    if stream_step_fn is None:
        from tdnet_tpu.models import model_stream_step
        stream_step_fn = model_stream_step(cfg)

    n_sp = mesh.shape["spatial"]
    if cfg.in_size[0] % n_sp:
        raise ValueError(
            f"spatial partitioning over {n_sp} chips needs the input height "
            f"to be divisible by {n_sp}; got {cfg.in_size[0]}. Use an even "
            f"geometry (e.g. 1024x2048 instead of the reference's 1025x2049 "
            f"— the LayerNorm grid derives from in_size, so any size works).")

    rep = NamedSharding(mesh, P())
    img_sh = NamedSharding(mesh, P(None, "spatial", None, None))

    def step(path_params, atn_p, cache, img):
        ctx = Ctx(train=False, attn_impl=attn_impl, stem_impl=stem_impl,
                  fused_trunk=fused_trunk, quant=quant)
        out, new_cache = stream_step_fn(path_params, atn_p, cache, img,
                                        cfg, pid, ctx)
        return out, new_cache

    from tdnet_tpu.ops.quant import compiler_options_for
    return jax.jit(
        step,
        in_shardings=(rep, rep, rep, img_sh),
        out_shardings=(img_sh, rep),
        donate_argnums=(2,) if donate_cache else (),
        compiler_options=compiler_options_for(quant),
    )
