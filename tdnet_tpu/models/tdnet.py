"""Generic TDNet: N temporally-distributed sub-networks + attention
propagation, as one TPU-native model family.

Instantiates the reference's td4_psp(18) and td2_psp(50) — both the
*streaming* twins (Testing/model/pspnet/td4_psp18.py, td2_psp50.py) and
the *clip* twins used for training/validation
(Training/ptsemseg/models/td4_psp/td4_psp.py, td2_psp/td2_psp.py) — from
a single configuration.

TPU-first design decisions (vs. the reference's per-path nn.Modules and
Python-list CUDA caches):

- All P sub-network parameter trees are stacked on a leading ``path``
  axis. The clip forward vmaps the heavy backbone+PSP+cached-encoding
  over that axis (one fused launch; shardable over a mesh ``path`` axis
  for branch parallelism), and gathers per-path heads with a traced
  ``pos_id`` so a single compiled graph serves all P phases.
- The streaming feature cache is an explicit fixed-shape pytree
  (window-length FIFO on axis 0) carried through ``jit`` and donated,
  never leaving HBM — replacing the reference's Python-list buffer
  (td4_psp18.py:118-134).
- Warm-up (< window frames) is a counter + ``jnp.where`` gate instead of
  Python branching (td4_psp18.py:142), keeping one static graph.

Path rotation facts mirrored from the reference:
- streaming hop h of path p uses attention instance atn{p+1}_{s+1} with
  s = (p + h + 1) mod P (td4_psp18.py:145-147,166-168,185-187,204-206);
  params are stored pre-rotated as ``atn[p][h]``.
- clip routing: sub-network s processes frame (s - p - 1) mod P, where
  frame P-1 is the current one (td4_psp.py:147-150,201-204,256-259,311-314).
- grouped-PSP pids: P=4 -> groups of 2 with pids (0,1,0,1)
  (td4_psp18.py:80-83); P=2 -> pids (0,1) (td2_psp50.py:76-77).
- d_v: P=4 -> C; P=2 -> C/4. head chn_down: 4 / 2 (td4_psp18.py:85,112;
  td2_psp50.py:79,88).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tdnet_tpu.nn import (BACKBONES, Ctx, apply_attention,
                          apply_encoding_cached, apply_encoding_full,
                          apply_fcn_head, apply_pyramid_pooling, apply_resnet,
                          init_attention, init_encoding, init_fcn_head,
                          init_pyramid_pooling, init_resnet)
from tdnet_tpu.ops import init_layer_norm_2d, layer_norm_2d, resize_bilinear


def backbone_feat_hw(in_hw: tuple[int, int]) -> tuple[int, int]:
    """Spatial size of the stride-8 c4 grid for a given input size."""
    def s2(x):  # one stride-2 stage (conv k7 p3 / k3 p1 or maxpool k3 p1)
        return (x - 1) // 2 + 1
    h, w = in_hw
    for _ in range(3):
        h, w = s2(h), s2(w)
    return h, w


@dataclasses.dataclass(frozen=True)
class TDNetConfig:
    nclass: int = 19
    backbone: str = "resnet18"
    path_num: int = 4
    in_size: tuple[int, int] = (769, 1537)
    d_k: int = 64
    kv_stride: int = 4          # 4 at test, 3 at train in the reference
    pool_before_proj: bool = True  # False only for td2 training parity
    aux: bool = True

    @property
    def expansion(self) -> int:
        return 4 if self.backbone in ("resnet50", "resnet101", "resnet152") else 1

    @property
    def channels(self) -> int:
        return 512 * self.expansion

    @property
    def d_v(self) -> int:
        return self.channels if self.path_num == 4 else self.channels // 4

    @property
    def head_chn_down(self) -> int:
        return 4 if self.path_num == 4 else 2

    @property
    def psp_groups(self) -> int:
        return 2  # P=4 -> path_num//2; P=2 -> path_num. Both equal 2.

    def psp_pid(self, p: int) -> int:
        return p % 2

    @property
    def window(self) -> int:
        return self.path_num - 1

    @property
    def feat_hw(self) -> tuple[int, int]:
        return backbone_feat_hw(self.in_size)

    @property
    def kv_hw(self) -> tuple[int, int]:
        h, w = self.feat_hw
        s = self.kv_stride
        return (h + s - 1) // s, (w + s - 1) // s

    @property
    def kv_tokens(self) -> int:
        h, w = self.kv_hw
        return h * w

    @property
    def backbone_cfg(self):
        return BACKBONES[self.backbone]()


def init_subnet(key, cfg: TDNetConfig, dtype=jnp.float32) -> dict:
    kb, kp, ke, kh, ka, kx = jax.random.split(key, 6)
    hf, wf = cfg.feat_hw
    p = {
        "backbone": init_resnet(kb, cfg.backbone_cfg, dtype),
        "psp": init_pyramid_pooling(kp, cfg.channels, dtype),
        "enc": init_encoding(ke, cfg.channels, cfg.d_k, cfg.d_v, dtype),
        "ln": init_layer_norm_2d(hf, wf, dtype),
        "head": init_fcn_head(kh, cfg.d_v if cfg.path_num == 2 else cfg.channels,
                              cfg.nclass, chn_down=cfg.head_chn_down, dtype=dtype),
    }
    if cfg.aux:
        p["aux"] = init_fcn_head(ka, 256 * cfg.expansion, cfg.nclass,
                                 chn_down=4, dtype=dtype)
    return p


def init_tdnet(key, cfg: TDNetConfig, dtype=jnp.float32) -> dict:
    """Full model: per-path subnets stacked on axis 0; atn as [P][W] lists."""
    keys = jax.random.split(key, cfg.path_num + 1)
    subnets = [init_subnet(keys[p], cfg, dtype) for p in range(cfg.path_num)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *subnets)
    akeys = jax.random.split(keys[-1], cfg.path_num * cfg.window)
    atn = [[init_attention(akeys[p * cfg.window + h], cfg.d_v, dtype)
            for h in range(cfg.window)] for p in range(cfg.path_num)]
    atn_stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                               *[jax.tree.map(lambda *ys: jnp.stack(ys), *row)
                                 for row in atn])
    return {"paths": stacked, "atn": atn_stacked}


def select_path(params: dict, p) -> dict:
    """Select one path's parameter tree (static int or traced index)."""
    return jax.tree.map(lambda x: x[p], params)


def _subnet_trunk(sp: dict, img: jnp.ndarray, cfg: TDNetConfig, ctx: Ctx,
                  pid) -> tuple:
    """backbone + grouped PSP. Returns (c3, z, updated_subnet_params)."""
    nsp = dict(sp)
    c3, c4, nsp["backbone"] = apply_resnet(sp["backbone"], img,
                                           cfg.backbone_cfg, ctx)
    z, nsp["psp"] = apply_pyramid_pooling(sp["psp"], c4, ctx,
                                          path_num=cfg.psp_groups, pid=pid)
    return c3, z, nsp


def _hop_chain(atn_p, ks, vs, qs, q_cur, cfg: TDNetConfig, ctx: Ctx):
    """The propagation chain (reference td4_psp18.py:145-151).

    ks/vs/qs: per-hop token tensors, oldest first, each [n, L, d];
    ``atn_p`` is the per-path list/stack of W attention param trees.
    Returns the final NHWC map aligned with the current frame.
    """
    w = cfg.window
    acc = None
    for h in range(w):
        a = jax.tree.map(lambda x: x[h], atn_p) if not isinstance(atn_p, list) else atn_p[h]
        vin = vs[h] if acc is None else vs[h] + acc
        q = qs[h + 1] if h + 1 < w else q_cur
        acc = apply_attention(a, ks[h], vin, q, ctx, d_k=cfg.d_k,
                              fea_hw=cfg.feat_hw if h == w - 1 else None)
    return acc


# ---------------------------------------------------------------------------
# Streaming (stateful) inference — the Testing/ twin.
# ---------------------------------------------------------------------------

def init_cache(cfg: TDNetConfig, batch: int = 1, dtype=jnp.float32) -> dict:
    l = cfg.kv_tokens
    w = cfg.window
    return {
        "q": jnp.zeros((w, batch, l, cfg.d_k), dtype),
        "k": jnp.zeros((w, batch, l, cfg.d_k), dtype),
        "v": jnp.zeros((w, batch, l, cfg.d_v), dtype),
        "count": jnp.zeros((), jnp.int32),
    }


def stream_step(path_params: dict, atn_p, cache: dict, img: jnp.ndarray,
                cfg: TDNetConfig, pid, ctx: Ctx | None = None):
    """One streaming frame through one sub-network.

    ``path_params``: the selected path's subnet tree; ``atn_p``: that
    path's W attention trees (stacked or list); ``pid``: its PSP group id.
    Returns (logits upsampled to input size, new_cache).
    """
    ctx = ctx or Ctx(train=False)
    use_fused = (ctx.fused_trunk and not ctx.train and cfg.pool_before_proj
                 and isinstance(pid, int))
    if use_fused:
        # z-free fast path: grouped PSP + QKV projections fused
        # (nn/fused_trunk.py) — exact, skips materializing the 2C/G-wide
        # pyramid feature
        from tdnet_tpu.nn.fused_trunk import fused_psp_encoding
        _, c4, _ = apply_resnet(path_params["backbone"], img,
                                cfg.backbone_cfg, ctx)
        q_cur, v_cur, q_c, k_c, v_c = fused_psp_encoding(
            path_params["psp"], path_params["enc"], c4, ctx, pid=pid,
            groups=cfg.psp_groups, kv_stride=cfg.kv_stride)
    else:
        _, z, _ = _subnet_trunk(path_params, img, cfg, ctx, pid)
        q_cur, v_cur, _ = apply_encoding_full(path_params["enc"], z, ctx)

    if ctx.ablate_prop:
        # mechanism-proof ablation: the cold-cache output path (the same
        # dataflow every frame < window gets) for EVERY frame
        feat = v_cur
    else:
        ks = [cache["k"][h] for h in range(cfg.window)]
        vs = [cache["v"][h] for h in range(cfg.window)]
        qs = [cache["q"][h] for h in range(cfg.window)]
        v_prop = _hop_chain(atn_p, ks, vs, qs, q_cur, cfg, ctx)

        warm = cache["count"] >= cfg.window
        feat = v_cur + jnp.where(warm, v_prop, jnp.zeros_like(v_prop))
    feat = layer_norm_2d(feat, path_params["ln"])
    out, _ = apply_fcn_head(path_params["head"], feat, ctx)
    out = resize_bilinear(out, cfg.in_size)

    if not use_fused:
        q_c, k_c, v_c = apply_encoding_cached(
            path_params["enc"], z, ctx, kv_stride=cfg.kv_stride,
            pool_before_proj=cfg.pool_before_proj)[:3]
    new_cache = {
        "q": jnp.concatenate([cache["q"][1:], q_c[None]], axis=0),
        "k": jnp.concatenate([cache["k"][1:], k_c[None]], axis=0),
        "v": jnp.concatenate([cache["v"][1:], v_c[None]], axis=0),
        "count": jnp.minimum(cache["count"] + 1, jnp.int32(1 << 30)),
    }
    return out, new_cache


# ---------------------------------------------------------------------------
# Clip (stateless) forward — the Training/ twin.
# ---------------------------------------------------------------------------

def clip_forward(params: dict, frames: jnp.ndarray, pos_id, cfg: TDNetConfig,
                 ctx: Ctx, *, unroll: bool = True):
    """Process a clip of P frames (axis 0: oldest..current) in one step.

    Mirrors td4_psp.forward_path{1..4} / td2_psp (training twins): every
    sub-network runs on one frame, the chain recomposes the current
    frame's features, the current path's head produces (out, out_sub) and
    the aux head reads c3 of the current sub-network.

    Returns dict(out, out_sub, auxout, updated_params) — logits at input
    resolution (out/out_sub/auxout) for the loss; ``out_lowres``/
    ``out_sub_lowres`` (pre-upsample) for KD, matching the reference
    which distills at the 97x193 logit grid (td4_psp.py:183).

    ``unroll=True`` (default) runs the P sub-network trunks as separate
    standard convolutions; ``False`` vmaps them into one launch. Same
    math either way (each path's convs see only its own frame), but the
    vmapped form lowers per-path-weight convs to feature-GROUPED convs,
    which the TPU executes at a fraction of peak (each 64-channel group
    pads to the 128-lane register width, and every BN-backward reduction
    relayouts the path axis): measured 375 -> 255 ms/step for the
    TD4-PSP18 training recipe (185 with bf16 compute). ``False`` remains
    for the path-sharded mesh, where the stacked axis is what gets
    partitioned.
    """
    P = cfg.path_num
    pos_id = jnp.asarray(pos_id, jnp.int32)
    sub_ids = jnp.arange(P, dtype=jnp.int32)
    frame_for_sub = (sub_ids - pos_id - 1) % P          # routing table
    routed = jnp.take(frames, frame_for_sub, axis=0)    # [P, n, h, w, 3]
    pids = jnp.asarray([cfg.psp_pid(p) for p in range(P)], jnp.int32)

    if unroll:
        n_rng_before = ctx._n_rng
        c3_l, z_l, nsp_l, enc_l = [], [], [], []
        for s in range(P):
            sp = select_path(params["paths"], s)
            c3, z, nsp = _subnet_trunk(sp, routed[s], cfg, ctx,
                                       cfg.psp_pid(s))
            q, k, v, nep = apply_encoding_cached(
                sp["enc"], z, ctx, kv_stride=cfg.kv_stride,
                pool_before_proj=cfg.pool_before_proj)
            c3_l.append(c3); z_l.append(z); nsp_l.append(nsp)
            enc_l.append((q, k, v, nep))
        # the per-path region must stay RNG-free: unrolled calls would
        # advance ctx._n_rng P times where the vmapped form advances it
        # once, silently desynchronizing dropout between the two forms
        assert ctx._n_rng == n_rng_before, \
            "dropout/rng op inside the per-path trunk breaks unroll/vmap parity"
        c3_all = jnp.stack(c3_l)
        z_all = jnp.stack(z_l)
        npaths = jax.tree.map(lambda *xs: jnp.stack(xs), *nsp_l)
        q_all = jnp.stack([e[0] for e in enc_l])
        k_all = jnp.stack([e[1] for e in enc_l])
        v_all = jnp.stack([e[2] for e in enc_l])
        nenc = jax.tree.map(lambda *xs: jnp.stack(xs),
                            *[e[3] for e in enc_l])
    else:
        def trunk_one(sp, img, pid):
            c3, z, nsp = _subnet_trunk(sp, img, cfg, ctx, pid)
            return c3, z, nsp

        c3_all, z_all, npaths = jax.vmap(trunk_one)(params["paths"], routed,
                                                    pids)

        def enc_cached_one(ep, z):
            q, k, v, nep = apply_encoding_cached(
                ep, z, ctx, kv_stride=cfg.kv_stride,
                pool_before_proj=cfg.pool_before_proj)
            return q, k, v, nep

        q_all, k_all, v_all, nenc = jax.vmap(enc_cached_one)(
            params["paths"]["enc"], z_all)

    # current path: full-res encoding on its own z
    sel = select_path(params["paths"], pos_id)
    z_cur = z_all[pos_id]
    q_cur, v_cur, nenc_cur = apply_encoding_full(sel["enc"], z_cur, ctx)

    # chain over cached subnets sigma(j) = (pos_id + 1 + j) % P
    sigma = (pos_id + 1 + jnp.arange(cfg.window, dtype=jnp.int32)) % P
    ks = [k_all[sigma[j]] for j in range(cfg.window)]
    vs = [v_all[sigma[j]] for j in range(cfg.window)]
    qs = [q_all[sigma[j]] for j in range(cfg.window)]
    atn_p = select_path(params["atn"], pos_id)
    v_prop = _hop_chain(atn_p, ks, vs, qs, q_cur, cfg, ctx)

    feat = layer_norm_2d(v_prop + v_cur, sel["ln"])
    feat_sub = layer_norm_2d(v_cur, sel["ln"])
    # The reference runs the SAME head twice per step — out then out_sub
    # (td4_psp.py:167-171) — so its BN running stats absorb two updates;
    # chain the second call off the first call's updated stats to match.
    # (Train-mode outputs normalize with batch stats, so this only
    # affects the running buffers, never activations or gradients.)
    out_lr, nhead1 = apply_fcn_head(sel["head"], feat, ctx)
    out_sub_lr, nhead = apply_fcn_head(nhead1, feat_sub, ctx)

    out = resize_bilinear(out_lr, cfg.in_size)
    out_sub = resize_bilinear(out_sub_lr, cfg.in_size)

    res = {"out": out, "out_sub": out_sub,
           "out_lowres": out_lr, "out_sub_lowres": out_sub_lr}

    if cfg.aux and ctx.train:
        auxout_lr, naux = apply_fcn_head(sel["aux"], c3_all[pos_id], ctx)
        res["auxout"] = resize_bilinear(auxout_lr, cfg.in_size)

    if ctx.train:
        # Merge BN running-stat updates back into the stacked tree. The
        # current path's encoding stats come ONLY from the full-res
        # (pre=False) pass, as in the reference (its w_ks/cached-pass BNs
        # never run for the current frame in train mode).
        paths = dict(npaths)
        paths["enc"] = jax.tree.map(
            lambda full, cur: full.at[pos_id].set(cur), nenc, nenc_cur)
        # The sub-network processing the OLDEST frame never runs w_qs in
        # the reference — td4 passes start=True there (no q returned,
        # td4_psp/transformer.py:45-50) and td2's pre=True computes only
        # (k, v) (td2_psp/transformer.py:35-44) — so its w_qs BN running
        # stats must not update. (Its q output is unused in the hop chain
        # either way; this only affects eval-mode statistics.)
        enc = dict(paths["enc"])
        enc["w_qs"] = jax.tree.map(
            lambda merged, orig: merged.at[sigma[0]].set(orig[sigma[0]]),
            enc["w_qs"], params["paths"]["enc"]["w_qs"])
        paths["enc"] = enc
        upd = {"head": nhead, "ln": sel["ln"]}
        if cfg.aux:
            upd["aux"] = naux
        for k_, v_ in upd.items():
            paths[k_] = jax.tree.map(
                lambda full, cur: full.at[pos_id].set(cur), paths[k_], v_)
        res["updated_params"] = {"paths": paths, "atn": params["atn"]}
    return res
