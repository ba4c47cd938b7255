"""Mechanism proof: attention propagation must WIN end-to-end.

The reference's reason to exist is that recomposing features propagated
from the other sub-networks' frames approximates the full deep model
(/root/reference/README.md:9). Numerical parity (the oracle suite) and
trainability (the learning-sanity run) don't pin that: a per-pixel task
is solvable by the cold-cache path alone (VERDICT r3, missing #1).

Task history (each variant documented so nobody retries it):
  v1 scene-only: spatially inpaintable, single-frame path loses nothing.
  v2 occluded billboards: recovering content UNDER an occluder needs
     content-based retrieval the query cannot express (it encodes the
     occluder, not the scene); 700 CE steps never learn it.
  v3 heavy i.i.d. sensor noise: the conv stack averages pixel noise
     away long before the stride-8 features — no information gap
     survives at the feature level (delta -0.0001).
  v4 flashing GRATING billboards at 193x385: TIED at noise level
     (+0.0005) — and the warm arm's billboard IoU was 0.00-0.16 even on
     LIT frames, i.e. the model couldn't classify billboards from a
     fully visible frame, so the dark-frame comparison never measured
     retrieval (VERDICT r4 missing #1). Root causes: gratings alias
     against the stride-8 x kv_stride-4 feature grid, and at 193x385
     the KV cache is 7x13 = 91 tokens with a billboard spanning ~1-2.

v5: flashing COLOR billboards at 385x769 — fixed solvability (lit
IoU 0.40 vs v4's 0.0-0.16) but warm and ablated stayed IDENTICAL
(0.4223 vs 0.4222): on the training scenes (scene, position) -> color
is deterministic and the scene is identifiable from any single frame,
so MEMORIZATION explained the whole training loss and SGD had no
incentive to use the propagation path (it learned to ignore the cache).

v6 (this file): v5 + COLOR VARIANTS. Each billboard
shows a solid per-instance color (the only evidence of its label class)
one frame in every FLASH_PERIOD and a neutral gray interior otherwise;
labels never change. Each training scene is
pre-rendered in N_COLOR_VARIANTS variants that differ ONLY in the
per-instance billboard colors (data/synthetic.py color_seed): on a dark
frame every variant is pixel-identical, so (scene, position) gives a
uniform prior over the variants' colors and the dark-pixel CE is
irreducible without reading the window cache — memorization cannot
substitute for retrieval. Fixes v4's two failures directly:
  - solvable when visible: a flat color survives any downsampling, so
    lit-frame classification reduces to color -> class (gated below at
    lit-frame billboard IoU >= 0.6 before the dark-frame comparison is
    allowed to count);
  - enough tokens: at 385x769 the stride-4 KV cache is 13x25 = 325
    tokens and a scaled billboard (BILLBOARD_SCALE) spans ~10-40.
On dark frames the class is structurally unobservable from the current
frame — the billboard itself stays plainly visible (gray panel + bright
border), so the query encodes WHERE to look and retrieval reduces to
matching the shared surrounding context against the window's keys. With
FLASH_PERIOD == path_num the last lit frame always sits inside the
propagation window.

Streaming mIoU is measured two ways over held-out videos:

  warm    — the real streaming path (cache warmed, propagation active)
  ablated — Ctx.ablate_prop: the cold-cache head(LN(v_cur)) output
            every frame (models/tdnet.py stream_step ablation branch)

and written to MECHANISM.json. The proof passes iff BOTH (VERDICT r4
weak #1 — a bare `>` let a +0.0005 noise-level tie ship as a pass):
  - warm lit-frame billboard IoU >= LIT_IOU_GATE (the task is actually
    solved when the evidence is visible), and
  - warm temporal-only mIoU >= ablated temporal-only mIoU + MARGIN.

Run: python scripts/mechanism_proof.py [--steps 4000] [--out MECHANISM.json]
     --overfit runs the expressivity check first (train and eval on ONE
     clip — if warm cannot beat ablated while memorizing, the bug is in
     the information path, not SGD).
(TPU: ~25 min. The CPU-mesh test lane runs a tiny wiring check instead —
tests/test_mechanism.py.)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

HW = (385, 769)
N_CLASSES = 6 + 8
BILLBOARDS = 5
BILLBOARD_STYLE = "color"
BILLBOARD_SCALE = 1.8
FLASH_PERIOD = 4
NOISE_SIGMA = None
TRAIN_SEEDS = list(range(1, 9))      # seed 0 = the demo clip; keep held out
N_COLOR_VARIANTS = 4                 # color_seed 1..4 per training scene
EVAL_SEEDS = [100, 101, 102]
EVAL_FRAMES = 36
CLIP_T_MAX = 16
MARGIN = 0.05          # temporal-only mIoU margin the pass flag demands
LIT_IOU_GATE = 0.6     # lit-frame billboard IoU before retrieval counts

# int8 PTQ accuracy side artifact (VERDICT r4 next #6): measured at the
# deployment geometry the compile fix was needed for, not the toy one
INT8_HW = (769, 1537)
INT8_FRAMES = 12


def _norm_clip(imgs):
    from tdnet_tpu.data.streaming import normalize_frame
    return np.stack([normalize_frame(im) for im in imgs])


def _render_clip(t0, n, hw, seed, noise_seed=0, color_seed=0):
    from tdnet_tpu.data.synthetic import labeled_clip
    return labeled_clip(t0, n, hw, seed=seed, billboards=BILLBOARDS,
                        noise_sigma=NOISE_SIGMA, noise_seed=noise_seed,
                        flash_period=FLASH_PERIOD, return_occ=True,
                        billboard_style=BILLBOARD_STYLE,
                        billboard_scale=BILLBOARD_SCALE,
                        color_seed=color_seed)


def prepare_train_arrays(seeds, path_num, variants=None):
    """Pre-render every training clip ONCE (uint8, host) and return
    (frames_u8 [S*V,T,H,W,3], labels [S*V,T,H,W]) ready for device
    upload — one entry per (scene seed, color variant).

    The host has one CPU core (CLAUDE.md) — v4 re-rendered + re-normalized
    frames inside the training loop, which is why 700 steps was the
    budget. Here normalization happens on-device in the batch gather.
    """
    variants = variants or [0]
    T = CLIP_T_MAX + path_num
    fs, ls = [], []
    for seed in seeds:
        for cs in variants:
            imgs, lbls, _ = _render_clip(0, T, HW, seed, color_seed=cs)
            fs.append(imgs)
            ls.append(lbls)
    return np.stack(fs), np.stack(ls).astype(np.int32)


def make_device_batcher(frames_u8, labels, path_num):
    """Device-side batch assembly: uint8 frames live in HBM; a jitted
    gather slices [P] consecutive frames per clip and normalizes them
    (ImageNet mean/std — data/streaming.py:normalize_frame) on-chip.
    Host-side per-step work drops to drawing a few random ints."""
    import jax
    import jax.numpy as jnp
    from tdnet_tpu.data.streaming import IMAGENET_MEAN, IMAGENET_STD

    P = path_num
    f_dev = jax.device_put(frames_u8)
    l_dev = jax.device_put(labels)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)

    # the frame store must be a jit ARGUMENT: a closed-over constant is
    # embedded in the compile payload, which the axon tunnel's remote
    # compile endpoint rejects at 128 MB (HTTP 413)
    @jax.jit
    def _gather(f, l, seed_ids, t0s):
        def one(sid, t0):
            clip = jax.lax.dynamic_slice(
                f, (sid, t0, 0, 0, 0), (1, P, *f.shape[2:]))[0]
            lbl = jax.lax.dynamic_slice(
                l, (sid, t0 + P - 1, 0, 0), (1, 1, *l.shape[2:]))[0, 0]
            return clip, lbl
        clips, lbls = jax.vmap(one)(seed_ids, t0s)     # [N,P,H,W,3] u8
        x = (clips.astype(jnp.float32) / 255.0 - mean) / std
        return jnp.transpose(x, (1, 0, 2, 3, 4)), lbls  # [P,N,H,W,3]

    return lambda sids, t0s: _gather(f_dev, l_dev, sids, t0s)


def train(steps: int, batch: int = 4, seeds=None):
    import jax
    import jax.numpy as jnp
    from tdnet_tpu.models import tdnet_config
    from tdnet_tpu.train.trainer import make_train_state, make_train_step

    seeds = TRAIN_SEEDS if seeds is None else seeds
    cfg = tdnet_config("td4-psp18", nclass=N_CLASSES, in_size=HW,
                       streaming=False)
    key = jax.random.PRNGKey(0)
    state = make_train_state(key, cfg, max_iter=steps,
                             opt_kwargs=dict(lr0=1e-2, warmup_steps=100))
    step = make_train_step(cfg, max_iter=steps,
                           opt_kwargs=dict(lr0=1e-2, warmup_steps=100))

    variants = list(range(1, N_COLOR_VARIANTS + 1))
    n_clips = len(seeds) * len(variants)
    print(f"pre-rendering {n_clips} clips x {CLIP_T_MAX + cfg.path_num} "
          f"frames at {HW} ...", flush=True)
    t0 = time.time()
    frames_u8, labels = prepare_train_arrays(seeds, cfg.path_num, variants)
    gather = make_device_batcher(frames_u8, labels, cfg.path_num)
    print(f"  done ({time.time()-t0:.0f}s, "
          f"{frames_u8.nbytes/1e6:.0f} MB uint8 on device)", flush=True)

    rng = np.random.RandomState(7)
    t0 = time.time()
    for it in range(steps):
        sids = jnp.asarray(rng.randint(n_clips, size=batch), jnp.int32)
        t0s = jnp.asarray(rng.randint(CLIP_T_MAX, size=batch), jnp.int32)
        frames, lbls = gather(sids, t0s)
        state, m = step(state, frames, lbls, jnp.int32(it % cfg.path_num))
        if it % 200 == 0 or it == steps - 1:
            print(f"it {it:5d}  loss {float(m['loss']):.4f}  "
                  f"lr {float(m['lr']):.5f}  ({time.time()-t0:.0f}s)",
                  flush=True)
    return jax.device_get(state["params"]), cfg


def eval_stream(params, ablate: bool, quant: str | None = None,
                eval_seeds=None, hw=None, eval_frames=None):
    """Streaming mIoU over the held-out videos; frames >= window only.

    Reports, besides overall mIoU: ``temporal_only`` (dark-billboard
    pixels — class unobservable this frame) and ``lit_billboard_iou``
    (billboard pixels whose color IS visible this frame — the
    task-is-solvable gate)."""
    import jax
    import jax.numpy as jnp
    from tdnet_tpu.models import tdnet_config
    from tdnet_tpu.stream.runtime import Streamer
    from tdnet_tpu.train.metrics import RunningScore

    hw = HW if hw is None else hw
    eval_seeds = EVAL_SEEDS if eval_seeds is None else eval_seeds
    eval_frames = EVAL_FRAMES if eval_frames is None else eval_frames
    cfg = tdnet_config("td4-psp18", nclass=N_CLASSES, in_size=hw,
                       streaming=True)
    attn = "pallas" if jax.default_backend() == "tpu" else "xla"
    streamer = Streamer(params, cfg, attn_impl=attn, ablate_prop=ablate,
                        quant=quant)
    score = RunningScore(N_CLASSES)
    dark_score = RunningScore(N_CLASSES)   # temporal-only pixels
    lit_score = RunningScore(N_CLASSES)    # lit billboard pixels
    for seed in eval_seeds:
        imgs, lbls, dark = _render_clip(0, eval_frames, hw, seed)
        imgs = _norm_clip(imgs)
        streamer.reset()
        for t in range(eval_frames):
            out, _ = streamer.step(jnp.asarray(imgs[t][None]), timed=False)
            if t >= cfg.window:      # same frames scored in both modes
                pred = jnp.argmax(out, axis=-1)
                score.update(jnp.asarray(lbls[t][None]), pred)
                dark_lbl = np.where(dark[t], lbls[t], -1)   # <0 -> dropped
                dark_score.update(jnp.asarray(dark_lbl[None]), pred)
                lit_bb = (lbls[t] >= 6) & ~dark[t]
                lit_lbl = np.where(lit_bb, lbls[t], -1)
                lit_score.update(jnp.asarray(lit_lbl[None]), pred)

    def _pack(sc):
        scores, cls_iu = sc.get_scores()
        return {"miou": float(scores["Mean IoU : \t"]),
                "acc": float(scores["Overall Acc: \t"]),
                "class_iou": {k: float(v) for k, v in cls_iu.items()}}

    def _bb_miou(sc):
        _, cls_iu = sc.get_scores()
        vals = [v for k, v in cls_iu.items() if k >= 6 and np.isfinite(v)]
        return float(np.mean(vals)) if vals else float("nan")

    return {**_pack(score),
            "temporal_only": _pack(dark_score),
            "temporal_only_billboard_iou": _bb_miou(dark_score),
            "lit_billboard_iou": _bb_miou(lit_score)}


def main():
    import pickle

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--out", default="MECHANISM.json")
    ap.add_argument("--params", default="/tmp/mech_params.pkl",
                    help="trained-checkpoint pickle (written after train, "
                         "reused by --eval_only)")
    ap.add_argument("--eval_only", action="store_true")
    ap.add_argument("--overfit", action="store_true",
                    help="expressivity check: train AND eval on one clip "
                         "(seed 1). Memorization makes the ablated arm "
                         "strong too; the check is whether the warm arm "
                         "can express retrieval at all.")
    ap.add_argument("--skip_int8", action="store_true")
    args = ap.parse_args()

    train_seeds = [1] if args.overfit else TRAIN_SEEDS
    eval_seeds = [1] if args.overfit else EVAL_SEEDS

    if args.eval_only:
        with open(args.params, "rb") as f:
            params = pickle.load(f)
    else:
        params, _ = train(args.steps, args.batch, seeds=train_seeds)
        with open(args.params, "wb") as f:
            pickle.dump(params, f)
    warm = eval_stream(params, ablate=False, eval_seeds=eval_seeds)
    print("warm:", json.dumps({k: v for k, v in warm.items()
                               if k != "class_iou"}), flush=True)
    ablated = eval_stream(params, ablate=True, eval_seeds=eval_seeds)
    print("ablated:", json.dumps({k: v for k, v in ablated.items()
                                  if k != "class_iou"}), flush=True)

    delta_temporal = (warm["temporal_only"]["miou"]
                      - ablated["temporal_only"]["miou"])
    lit_ok = warm["lit_billboard_iou"] >= LIT_IOU_GATE
    margin_ok = delta_temporal >= MARGIN
    result = {
        "task": ("synthetic moving street scenes, "
                 f"{BILLBOARDS} FLASHING solid-COLOR billboards x"
                 f"{BILLBOARD_SCALE} scale (color shown 1 frame in "
                 f"{FLASH_PERIOD}, neutral gray otherwise, labels keep "
                 "the color class), {N_COLOR_VARIANTS} color variants "
                 "per training scene (identical when dark) — billboard "
                 "class is structurally unobservable from a dark frame "
                 "AND unmemorizable from scene identity, readable only "
                 "from the propagation window").format(
                     N_COLOR_VARIANTS=N_COLOR_VARIANTS),
        "model": "td4-psp18", "in_size": HW, "nclass": N_CLASSES,
        "flash_period": FLASH_PERIOD,
        "billboards": BILLBOARDS, "billboard_style": BILLBOARD_STYLE,
        "billboard_scale": BILLBOARD_SCALE,
        "n_color_variants": N_COLOR_VARIANTS,
        "noise_sigma": NOISE_SIGMA,
        "overfit_mode": args.overfit,
        "train_steps": args.steps, "train_seeds": train_seeds,
        "eval_seeds": eval_seeds, "eval_frames_per_video": EVAL_FRAMES,
        "warm": warm, "ablated": ablated,
        "miou_delta_warm_minus_ablated": round(
            warm["miou"] - ablated["miou"], 4),
        "temporal_only_miou_delta_warm_minus_ablated": round(
            delta_temporal, 4),
        "gates": {
            "lit_billboard_iou_gate": LIT_IOU_GATE,
            "lit_billboard_iou": round(warm["lit_billboard_iou"], 4),
            "lit_ok": lit_ok,
            "temporal_margin_required": MARGIN,
            "temporal_margin_measured": round(delta_temporal, 4),
            "margin_ok": margin_ok,
        },
        # a tie (or a sub-margin delta) records as NOT proven — VERDICT
        # r4 weak #1: a proof that can pass on noise is not a proof
        "mechanism_net_positive": bool(lit_ok and margin_ok),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items()
                      if k not in ("warm", "ablated")}))

    # side artifact AFTER the main result is on disk — a crash in the
    # int8 eval must never lose MECHANISM.json (it did once)
    if not args.skip_int8 and not args.overfit:
        # int8 PTQ accuracy at DEPLOYMENT geometry (VERDICT r4 next #6).
        # The only resolution-dependent params are the 2-D LayerNorm
        # affines ([h, w] of the c4 grid — models/tdnet.py:127); resize
        # them bilinearly so the 385x769 checkpoint evaluates at 769x1537
        # (quality drops a little, but the float-vs-int8 DELTA is what
        # this artifact measures, at the geometry the compile fix of
        # ops/quant.py:compiler_options_for was needed for).
        import jax
        from tdnet_tpu.models.tdnet import backbone_feat_hw
        dst = backbone_feat_hw(INT8_HW)

        def _resize_ln(p):
            def walk(d):
                if isinstance(d, dict):
                    out = {}
                    for k, v in d.items():
                        if k == "ln":
                            out[k] = {
                                kk: jax.image.resize(
                                    vv, (*vv.shape[:-2], *dst), "bilinear"
                                ).astype(vv.dtype)
                                for kk, vv in v.items()}
                        else:
                            out[k] = walk(v)
                    return out
                return d
            return walk(p)

        params769 = _resize_ln(params)
        warm_769 = eval_stream(params769, ablate=False, hw=INT8_HW,
                               eval_frames=INT8_FRAMES,
                               eval_seeds=EVAL_SEEDS[:2])
        int8_769 = eval_stream(params769, ablate=False, quant="int8",
                               hw=INT8_HW, eval_frames=INT8_FRAMES,
                               eval_seeds=EVAL_SEEDS[:2])
        with open("INT8_ACCURACY.json", "w") as f:
            json.dump({"task": ("synthetic flashing-color-billboard task "
                                "(mechanism-proof v6 ckpt)"),
                       "model": "td4-psp18", "in_size": INT8_HW,
                       "trained_at": HW,
                       "eval_frames": INT8_FRAMES,
                       "miou_float": warm_769["miou"],
                       "miou_int8": int8_769["miou"],
                       "miou_delta": round(
                           int8_769["miou"] - warm_769["miou"], 4)},
                      f, indent=1)
        print("INT8_ACCURACY.json written", flush=True)

    return 0 if result["mechanism_net_positive"] else 1


if __name__ == "__main__":
    sys.exit(main())
