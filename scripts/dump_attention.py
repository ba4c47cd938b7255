"""Diagnostic: where do dark-billboard queries attend in the window?

If the mechanism proof (scripts/mechanism_proof.py) fails its margin,
this pins WHERE retrieval dies (VERDICT r4 next #1b): for each eval
frame t whose billboards are dark, it takes the cached query tokens of
frame t that sit on a dark billboard and computes their attention
distribution over each cached key frame in the propagation window
(softmax(q k^T / sqrt(d_k)) — exactly the hop arithmetic of
models/tdnet.py:_hop_chain, using the cached stride-subsampled tokens).

Reported per hop: the mean attention mass those queries put on the SAME
billboard-footprint tokens of the key frame, vs the footprint's area
fraction (the mass a uniform/diffuse attention would put there). Mass
well above the area fraction means the attention DOES look at the
billboard and the failure is downstream (value content or the head);
mass at the area fraction means the query-key matching itself never
learned to localize.

Run: python scripts/dump_attention.py [--params /tmp/mech_params.pkl]
     [--out ATTENTION_PROBE.json]
"""

from __future__ import annotations

import argparse
import json
import pickle
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from scripts.mechanism_proof import (_norm_clip, _render_clip, EVAL_SEEDS,
                                     HW, N_CLASSES)


def probe(params, n_frames: int = 16, seed: int | None = None):
    import jax
    import jax.numpy as jnp
    from tdnet_tpu.models import tdnet_config
    from tdnet_tpu.models.tdnet import init_cache, select_path, stream_step
    from tdnet_tpu.nn.module import Ctx

    cfg = tdnet_config("td4-psp18", nclass=N_CLASSES, in_size=HW,
                       streaming=True)
    seed = EVAL_SEEDS[0] if seed is None else seed
    imgs, lbls, dark = _render_clip(0, n_frames, HW, seed)
    norm = _norm_clip(imgs)

    kh, kw = cfg.kv_hw
    fh, fw = cfg.feat_hw

    def tok_mask(px_mask):
        """pixel mask -> kv-grid token mask (>=30% coverage)."""
        m = px_mask.astype(np.float32)
        # feat grid: stride-8 sampling of the image, then kv_stride
        ys = (np.arange(fh) * (HW[0] - 1) / max(fh - 1, 1)).round().astype(int)
        xs = (np.arange(fw) * (HW[1] - 1) / max(fw - 1, 1)).round().astype(int)
        f = m[np.ix_(ys, xs)]
        s = cfg.kv_stride
        f = f[::s, :][:, ::s]
        return (f[:kh, :kw] > 0.3).ravel()

    cache = init_cache(cfg)
    per_hop = {h: [] for h in range(cfg.window)}
    diffuse = []
    ctx = Ctx(train=False)
    qs, ks = [], []     # cached per-frame token arrays (numpy)
    for t in range(n_frames):
        p = t % cfg.path_num
        pp = select_path(params["paths"], p)
        ap = select_path(params["atn"], p)
        _, cache = stream_step(pp, ap, cache, jnp.asarray(norm[t][None]),
                               cfg, cfg.psp_pid(p), ctx)
        qs.append(np.asarray(cache["q"][-1][0]))
        ks.append(np.asarray(cache["k"][-1][0]))
        if t < cfg.window or not dark[t].any():
            continue
        qmask = tok_mask(dark[t])
        if not qmask.any():
            continue
        # billboard footprint (any billboard class) in the key frames
        for h in range(cfg.window):
            t_key = t - (cfg.window - h)      # hop h keys = frame t_key
            kmask = tok_mask(lbls[t_key] >= 6)
            if not kmask.any():
                continue
            q = qs[t][qmask]                          # [nq, d_k]
            k = ks[t_key]                             # [L, d_k]
            logits = q @ k.T / np.sqrt(cfg.d_k)
            w = np.exp(logits - logits.max(axis=1, keepdims=True))
            w /= w.sum(axis=1, keepdims=True)
            per_hop[h].append(float(w[:, kmask].sum(axis=1).mean()))
            if h == cfg.window - 1:
                diffuse.append(float(kmask.mean()))
    return {
        "seed": seed,
        "kv_grid": [kh, kw],
        "frames_probed": len(per_hop[cfg.window - 1]),
        "billboard_token_area_fraction_mean": float(np.mean(diffuse))
        if diffuse else None,
        "attention_mass_on_billboard_tokens_per_hop": {
            f"hop{h}_keys_t-{cfg.window - h}": float(np.mean(v))
            if v else None
            for h, v in per_hop.items()},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default="/tmp/mech_params.pkl")
    ap.add_argument("--out", default="ATTENTION_PROBE.json")
    ap.add_argument("--frames", type=int, default=16)
    args = ap.parse_args()
    with open(args.params, "rb") as f:
        params = pickle.load(f)
    res = probe(params, n_frames=args.frames)

    # baseline: random-init params — what diffuse attention looks like
    import jax
    from tdnet_tpu.models import init_tdnet, tdnet_config
    cfg = tdnet_config("td4-psp18", nclass=N_CLASSES, in_size=HW,
                       streaming=True)
    res_rand = probe(init_tdnet(jax.random.PRNGKey(0), cfg),
                     n_frames=args.frames)
    out = {"trained": res, "random_init": res_rand}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
