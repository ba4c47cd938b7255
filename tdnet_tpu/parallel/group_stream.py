"""Path-parallel group streaming: P chips, P frames per super-step.

The serial streaming runtime (stream/runtime.py) rotates one chip
through the P sub-networks frame by frame. But TDNet's design makes the
heavy work of CONSECUTIVE frames independent: frame t's backbone + PSP +
QKV encodings depend only on frame t; only the cheap propagation chain
consumes the previous W frames' (q, k, v) token fields (reference
streaming rotation: Testing/model/pspnet/td4_psp18.py:118-151). The
TPU-native scale-out is therefore a GROUP step over a ``path`` mesh
axis of P devices:

- sub-network p's parameters live on device p permanently (the stacked
  path axis sharded over the mesh — no weight motion, ever);
- a group of P consecutive frames is scattered one-per-device; every
  device runs its backbone/PSP/encoding concurrently (the ~95% of the
  FLOPs, embarrassingly parallel) — through the SAME fast path as the
  serial runtime (oct stem, fused grouped-PSP+QKV trunk, Pallas
  attention) when configured with the same options;
- the per-frame cached token fields — [L_kv, d_k + d_k + d_v], a few MB
  in bf16 — are all-gathered over ICI; device p then slices its frame's
  W-frame window out of (carry ++ group) and runs the propagation
  chain + head on its own frame;
- the replicated carry advances by P frames per step.

Per-frame results are numerically equivalent to the serial runtime run
with the same Ctx options (same ops; XLA may reorder float sums, and
the per-device pid enters through a dynamic channel slice instead of a
static one). Equivalence vs the serial step is tested for both the
plain and the fused/oct deployment configuration
(tests/test_group_stream.py); exercised multi-device by
__graft_entry__.dryrun_multichip.

The reference has no analog — its multi-GPU story is training-only
DataParallel (Training/train.py:77); streaming is single-GPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from tdnet_tpu.models.tdnet import TDNetConfig, _hop_chain, _subnet_trunk
from tdnet_tpu.nn import apply_encoding_cached, apply_encoding_full, \
    apply_fcn_head, apply_resnet
from tdnet_tpu.nn.module import Ctx
from tdnet_tpu.ops import layer_norm_2d, resize_bilinear


def make_path_mesh(path_num: int, devices=None) -> Mesh:
    """A 1-D ``path`` mesh of exactly path_num devices."""
    import numpy as np
    if devices is None:
        devices = jax.devices()
    if len(devices) < path_num:
        raise ValueError(f"group streaming needs {path_num} devices; "
                         f"have {len(devices)}")
    return Mesh(np.asarray(devices[:path_num]), ("path",))


def make_group_stream_step(cfg: TDNetConfig, mesh: Mesh, *,
                           attn_impl: str = "xla",
                           stem_impl: str = "oct",
                           fused_trunk: bool = True,
                           quant: str | None = None,
                           donate_cache: bool = True):
    """Build the jitted group step.

    Returns ``step(paths, atn, cache, frames)`` where ``paths``/``atn``
    are the full stacked param trees (leading axis P, sharded over the
    mesh's ``path`` axis), ``cache`` is the replicated
    models.tdnet.init_cache pytree, and ``frames`` is [P, n, H, W, 3]
    (frame t0+p at index p, t0 a multiple of P, oldest group first).
    Returns (logits [P, n, H, W, nclass], new_cache).

    ``attn_impl``/``stem_impl``/``fused_trunk`` mirror the serial
    runtime's Ctx options (stream/runtime.py Streamer defaults) so the
    group step shares the deployed fast path.
    """
    if not isinstance(cfg, TDNetConfig):
        raise TypeError(
            "group streaming drives the grouped-PSP TDNet trunk; got "
            f"{type(cfg).__name__}. The FANet student (FATDConfig) has a "
            "different trunk — add a dedicated group step before using it.")
    P_ = mesh.shape["path"]
    if P_ != cfg.path_num:
        raise ValueError(f"mesh path axis ({P_}) must equal cfg.path_num "
                         f"({cfg.path_num})")
    W = cfg.window
    pids = jnp.asarray([cfg.psp_pid(p) for p in range(P_)], jnp.int32)
    use_fused = fused_trunk and cfg.pool_before_proj

    def group_step(paths_l, atn_l, pids_l, cache, frames_l):
        p = lax.axis_index("path")
        sp = jax.tree.map(lambda x: x[0], paths_l)
        atn_p = jax.tree.map(lambda x: x[0], atn_l)      # [W, ...]
        img = frames_l[0]
        ctx = Ctx(train=False, attn_impl=attn_impl, stem_impl=stem_impl,
                  fused_trunk=fused_trunk, quant=quant)
        pid = pids_l[0]                                   # cfg.psp_pid(p)

        # heavy, frame-local work — concurrent on all P devices, same
        # dataflow as the serial stream_step fast path
        if use_fused:
            from tdnet_tpu.nn.fused_trunk import fused_psp_encoding
            _, c4, _ = apply_resnet(sp["backbone"], img, cfg.backbone_cfg,
                                    ctx)
            q_cur, v_cur, q_c, k_c, v_c = fused_psp_encoding(
                sp["psp"], sp["enc"], c4, ctx, pid=pid,
                groups=cfg.psp_groups, kv_stride=cfg.kv_stride)
        else:
            _, z, _ = _subnet_trunk(sp, img, cfg, ctx, pid)
            q_cur, v_cur, _ = apply_encoding_full(sp["enc"], z, ctx)
            q_c, k_c, v_c, _ = apply_encoding_cached(
                sp["enc"], z, ctx, kv_stride=cfg.kv_stride,
                pool_before_proj=cfg.pool_before_proj)

        # the only cross-device traffic: this group's token fields
        hist = {
            "q": jnp.concatenate([cache["q"], lax.all_gather(q_c, "path")]),
            "k": jnp.concatenate([cache["k"], lax.all_gather(k_c, "path")]),
            "v": jnp.concatenate([cache["v"], lax.all_gather(v_c, "path")]),
        }                                                 # [W + P, n, L, d]

        # frame t0+p's window = hist[p : p + W] (oldest first)
        win = {k_: lax.dynamic_slice_in_dim(v_, p, W, axis=0)
               for k_, v_ in hist.items()}
        v_prop = _hop_chain(atn_p,
                            [win["k"][h] for h in range(W)],
                            [win["v"][h] for h in range(W)],
                            [win["q"][h] for h in range(W)],
                            q_cur, cfg, ctx)

        warm = cache["count"] + p >= W
        feat = v_cur + jnp.where(warm, v_prop, jnp.zeros_like(v_prop))
        feat = layer_norm_2d(feat, sp["ln"])
        out, _ = apply_fcn_head(sp["head"], feat, ctx)
        out = resize_bilinear(out, cfg.in_size)

        new_cache = {
            "q": hist["q"][P_:],                          # last W frames
            "k": hist["k"][P_:],
            "v": hist["v"][P_:],
            "count": jnp.minimum(cache["count"] + P_, jnp.int32(1 << 30)),
        }
        return out[None], new_cache

    # check_vma=False: the new cache IS replicated (it is a static slice
    # of an all_gather result plus replicated-count arithmetic), but the
    # varying-mesh-axes checker tracks all_gather outputs as
    # device-varying and cannot statically prove it.
    shd = jax.shard_map(
        group_step, mesh=mesh,
        in_specs=(P("path"), P("path"), P("path"), P(), P("path")),
        out_specs=(P("path"), P()),
        check_vma=False,
    )

    def step(paths, atn, cache, frames):
        return shd(paths, atn, pids, cache, frames)

    from tdnet_tpu.ops.quant import compiler_options_for
    return jax.jit(step, donate_argnums=(2,) if donate_cache else (),
                   compiler_options=compiler_options_for(quant))
