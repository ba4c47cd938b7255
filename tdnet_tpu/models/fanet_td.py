"""TD2-FANet: two FANet-18 sub-networks with attention propagation.

Implements the architecture of the reference's unfinished td2_fa
(Training/ptsemseg/models/td2_fanet/td2_fa.py — live pdb trap at :80)
without the trap, as both a stateless clip forward (training twin) and a
stateful streaming step (the streaming twin the reference never built).

Structure per subnet: 4-scale FANet ResNet -> FAModule chain
(32->16->8->4 with lateral fast-attention at every scale) ->
z = cat(upsample(smooth16), smooth4) at 1/4 scale, 256 ch -> QKV
encoding (d_model=256, d_k=64, d_v=256, project-then-pool stride 3) ->
single-hop attention -> LayerNorm(1/4 grid) -> FPNOutput head.
Loss: CE + 0.5 CE_sub + KD (no aux term; td2_fa.py:205-211).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tdnet_tpu.nn import (Ctx, apply_encoding_cached, apply_encoding_full,
                          init_encoding, init_attention)
from tdnet_tpu.nn.fanet import (FANET_BACKBONES, apply_fa_module,
                                apply_fanet_resnet, apply_fpn_output,
                                init_fa_module, init_fanet_resnet,
                                init_fpn_output)
from tdnet_tpu.models.tdnet import _hop_chain, select_path
from tdnet_tpu.ops import init_layer_norm_2d, layer_norm_2d, resize_bilinear


@dataclasses.dataclass(frozen=True)
class FATDConfig:
    nclass: int = 19
    backbone: str = "resnet18"
    path_num: int = 2
    in_size: tuple[int, int] = (768, 1536)
    d_k: int = 64
    d_model: int = 256
    kv_stride: int = 3
    pool_before_proj: bool = False
    aux: bool = False  # td2_fa has head_aux params but no aux loss

    @property
    def expansion(self):
        return FANET_BACKBONES[self.backbone]().expansion

    @property
    def d_v(self):
        return self.d_model

    @property
    def window(self):
        return self.path_num - 1

    @property
    def feat_hw(self):
        # stem s2 + maxpool s2 + layer1 s2 (FANet strides are [2,2,2,2],
        # see FANetResNetConfig) -> the z grid is 1/8 of the input.
        def s2(x):
            return (x - 1) // 2 + 1
        h, w = self.in_size
        return s2(s2(s2(h))), s2(s2(s2(w)))

    @property
    def kv_hw(self):
        h, w = self.feat_hw
        s = self.kv_stride
        return (h + s - 1) // s, (w + s - 1) // s

    @property
    def kv_tokens(self):
        h, w = self.kv_hw
        return h * w

    def psp_pid(self, p):  # API parity with TDNetConfig (unused here)
        return p

    @property
    def backbone_cfg(self):
        return FANET_BACKBONES[self.backbone]()


def init_fa_subnet(key, cfg: FATDConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 9)
    e = cfg.expansion
    hf, wf = cfg.feat_hw
    p = {
        "backbone": init_fanet_resnet(ks[0], cfg.backbone_cfg, dtype),
        "ffm_32": init_fa_module(ks[1], 512 * e, 128, dtype),
        "ffm_16": init_fa_module(ks[2], 256 * e, 128, dtype),
        "ffm_8": init_fa_module(ks[3], 128 * e, 128, dtype),
        "ffm_4": init_fa_module(ks[4], 64 * e, 128, dtype),
        "enc": init_encoding(ks[5], cfg.d_model, cfg.d_k, cfg.d_v, dtype),
        "ln": init_layer_norm_2d(hf, wf, dtype),
        "head": init_fpn_output(ks[6], cfg.d_model, 256, cfg.nclass, dtype),
        "head_aux": init_fpn_output(ks[7], 128, 64, cfg.nclass, dtype),
    }
    return p


def init_fatd(key, cfg: FATDConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, cfg.path_num + 1)
    subnets = [init_fa_subnet(keys[p], cfg, dtype) for p in range(cfg.path_num)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *subnets)
    akeys = jax.random.split(keys[-1], cfg.path_num * cfg.window)
    atn = [[init_attention(akeys[p * cfg.window + h], cfg.d_v, dtype)
            for h in range(cfg.window)] for p in range(cfg.path_num)]
    atn_stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[jax.tree.map(lambda *ys: jnp.stack(ys), *row) for row in atn])
    return {"paths": stacked, "atn": atn_stacked}


def _fa_trunk(sp: dict, img: jnp.ndarray, cfg: FATDConfig, ctx: Ctx):
    """backbone + FAModule FPN chain -> z [n, H/4, W/4, 256]."""
    nsp = dict(sp)
    feats, nsp["backbone"] = apply_fanet_resnet(sp["backbone"], img,
                                                cfg.backbone_cfg, ctx)
    f4, f8, f16, f32 = feats
    up32, nsp["ffm_32"] = apply_fa_module(sp["ffm_32"], f32, None, ctx,
                                          up_flag=True, smf_flag=True)
    up16, sm16, nsp["ffm_16"] = apply_fa_module(sp["ffm_16"], f16, up32, ctx,
                                                up_flag=True, smf_flag=True)
    up8, nsp["ffm_8"] = apply_fa_module(sp["ffm_8"], f8, up16, ctx,
                                        up_flag=True, smf_flag=False)
    sm4, nsp["ffm_4"] = apply_fa_module(sp["ffm_4"], f4, up8, ctx,
                                        up_flag=False, smf_flag=True)
    z = jnp.concatenate([resize_bilinear(sm16, sm4.shape[1:3]), sm4], axis=-1)
    return z, nsp


def init_fa_cache(cfg: FATDConfig, batch: int = 1, dtype=jnp.float32) -> dict:
    l, w = cfg.kv_tokens, cfg.window
    return {
        "q": jnp.zeros((w, batch, l, cfg.d_k), dtype),
        "k": jnp.zeros((w, batch, l, cfg.d_k), dtype),
        "v": jnp.zeros((w, batch, l, cfg.d_v), dtype),
        "count": jnp.zeros((), jnp.int32),
    }


def fa_stream_step(path_params, atn_p, cache, img, cfg: FATDConfig, pid=None,
                   ctx: Ctx | None = None):
    ctx = ctx or Ctx(train=False)
    z, _ = _fa_trunk(path_params, img, cfg, ctx)
    q_cur, v_cur, _ = apply_encoding_full(path_params["enc"], z, ctx)
    ks = [cache["k"][h] for h in range(cfg.window)]
    vs = [cache["v"][h] for h in range(cfg.window)]
    qs = [cache["q"][h] for h in range(cfg.window)]
    v_prop = _hop_chain(atn_p, ks, vs, qs, q_cur, cfg, ctx)
    warm = cache["count"] >= cfg.window
    feat = v_cur + jnp.where(warm, v_prop, jnp.zeros_like(v_prop))
    feat = layer_norm_2d(feat, path_params["ln"])
    out, _ = apply_fpn_output(path_params["head"], feat, ctx)
    out = resize_bilinear(out, cfg.in_size)
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


def fa_clip_forward(params: dict, frames: jnp.ndarray, pos_id,
                    cfg: FATDConfig, ctx: Ctx, *, unroll: bool = True):
    """Training twin (td2_fa.forward_path{1,2}); returns the same dict
    shape as tdnet.clip_forward (no auxout). ``unroll`` as in
    tdnet.clip_forward: separate per-path convs (default, fast on one
    chip) vs one vmapped feature-grouped launch (path-sharded mesh)."""
    P = cfg.path_num
    pos_id = jnp.asarray(pos_id, jnp.int32)
    sub_ids = jnp.arange(P, dtype=jnp.int32)
    routed = jnp.take(frames, (sub_ids - pos_id - 1) % P, axis=0)

    if unroll:
        n_rng_before = ctx._n_rng
        z_l, nsp_l, enc_l = [], [], []
        for s in range(P):
            sp = select_path(params["paths"], s)
            z, nsp = _fa_trunk(sp, routed[s], cfg, ctx)
            enc_l.append(apply_encoding_cached(
                sp["enc"], z, ctx, kv_stride=cfg.kv_stride,
                pool_before_proj=cfg.pool_before_proj))
            z_l.append(z); nsp_l.append(nsp)
        # per-path region must stay RNG-free (see tdnet.clip_forward)
        assert ctx._n_rng == n_rng_before, \
            "dropout/rng op inside the per-path trunk breaks unroll/vmap parity"
        z_all = jnp.stack(z_l)
        npaths = jax.tree.map(lambda *xs: jnp.stack(xs), *nsp_l)
        q_all = jnp.stack([e[0] for e in enc_l])
        k_all = jnp.stack([e[1] for e in enc_l])
        v_all = jnp.stack([e[2] for e in enc_l])
        nenc = jax.tree.map(lambda *xs: jnp.stack(xs),
                            *[e[3] for e in enc_l])
    else:
        def trunk_one(sp, img):
            return _fa_trunk(sp, img, cfg, ctx)

        z_all, npaths = jax.vmap(trunk_one)(params["paths"], routed)

        def enc_cached_one(ep, z):
            return apply_encoding_cached(ep, z, ctx, kv_stride=cfg.kv_stride,
                                         pool_before_proj=cfg.pool_before_proj)

        q_all, k_all, v_all, nenc = jax.vmap(enc_cached_one)(
            params["paths"]["enc"], z_all)

    sel = select_path(params["paths"], pos_id)
    q_cur, v_cur, nenc_cur = apply_encoding_full(sel["enc"], z_all[pos_id], ctx)

    sigma = (pos_id + 1 + jnp.arange(cfg.window, dtype=jnp.int32)) % P
    ks = [k_all[sigma[j]] for j in range(cfg.window)]
    vs = [v_all[sigma[j]] for j in range(cfg.window)]
    qs = [q_all[sigma[j]] for j in range(cfg.window)]
    atn_p = select_path(params["atn"], pos_id)
    v_prop = _hop_chain(atn_p, ks, vs, qs, q_cur, cfg, ctx)

    feat = layer_norm_2d(v_prop + v_cur, sel["ln"])
    feat_sub = layer_norm_2d(v_cur, sel["ln"])
    out_lr, nhead = apply_fpn_output(sel["head"], feat, ctx)
    out_sub_lr, _ = apply_fpn_output(sel["head"], feat_sub, ctx)

    res = {"out": resize_bilinear(out_lr, cfg.in_size),
           "out_sub": resize_bilinear(out_sub_lr, cfg.in_size),
           "out_lowres": out_lr, "out_sub_lowres": out_sub_lr}
    if ctx.train:
        paths = dict(npaths)
        paths["enc"] = jax.tree.map(
            lambda full, cur: full.at[pos_id].set(cur), nenc, nenc_cur)
        paths["head"] = jax.tree.map(
            lambda full, cur: full.at[pos_id].set(cur), paths["head"], nhead)
        res["updated_params"] = {"paths": paths, "atn": params["atn"]}
    return res
