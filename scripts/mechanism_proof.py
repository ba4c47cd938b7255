"""Mechanism proof: attention propagation must WIN end-to-end.

The reference's reason to exist is that recomposing features propagated
from the other sub-networks' frames approximates the full deep model
(/root/reference/README.md:9). Numerical parity (the oracle suite) and
trainability (the learning-sanity run) don't pin that: a per-pixel task
is solvable by the cold-cache path alone (VERDICT r3, missing #1).

This script builds a genuinely TEMPORAL synthetic task — moving street
scenes with FLASHING billboards whose texture (the only evidence of
their label class) is shown one frame in every flash_period
(data/synthetic.py:render_labeled, task history in the constants
below) — trains TD4-PSP18 on clips with the reference loss shape
(CE(out) + 0.5 CE(out_sub) + 0.1 CE(aux)), then measures streaming mIoU
two ways over held-out videos:

  warm    — the real streaming path (cache warmed, propagation active)
  ablated — Ctx.ablate_prop: the cold-cache head(LN(v_cur)) output
            every frame (models/tdnet.py stream_step ablation branch)

and writes MECHANISM.json. The proof passes iff warm > ablated.

Run: python scripts/mechanism_proof.py [--steps 700] [--out MECHANISM.json]
(TPU: ~10 min. The CPU-mesh test lane runs a tiny wiring check instead —
tests/test_mechanism.py.)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

HW = (193, 385)
# scene classes + the 8 billboard texture classes. Task design history
# (each earlier variant TIED warm vs ablated — MECHANISM.json history):
#   v1 scene-only: spatially inpaintable, single-frame path loses nothing.
#   v2 occluded billboards: recovering content UNDER an occluder needs
#      content-based retrieval the query cannot express (it encodes the
#      occluder, not the scene); 700 CE steps never learn it.
#   v3 heavy i.i.d. sensor noise: the conv stack averages pixel noise
#      away long before the stride-8 features, so no information gap
#      survives at the feature level (warm-ablated delta -0.0001).
# v4 FLASHING billboards: each billboard shows its texture (the only
# evidence of its label class) one frame in every FLASH_PERIOD, and a
# neutral gray interior otherwise; labels never change. On dark frames
# the class is structurally unobservable from the current frame — yet
# the billboard itself is plainly visible (gray panel + bright border),
# so the query position encodes WHERE to look and retrieval reduces to
# matching the shared surrounding context against the window's keys,
# which is learnable. With FLASH_PERIOD == path_num the last lit frame
# always sits inside the propagation window.
N_CLASSES = 6 + 8
OCCLUDERS = 0
BILLBOARDS = 8
FLASH_PERIOD = 4
NOISE_SIGMA = None
TRAIN_SEEDS = list(range(1, 9))      # seed 0 = the demo clip; keep held out
EVAL_SEEDS = [100, 101, 102]
EVAL_FRAMES = 36
CLIP_T_MAX = 24


def _norm_clip(imgs):
    from tdnet_tpu.data.streaming import normalize_frame
    return np.stack([normalize_frame(im) for im in imgs])


def make_batch(rng: np.random.RandomState, batch: int, path_num: int):
    """frames [P, N, H, W, 3] f32 (oldest..current), labels [N, H, W]."""
    from tdnet_tpu.data.synthetic import labeled_clip
    fs, ls = [], []
    for _ in range(batch):
        seed = TRAIN_SEEDS[rng.randint(len(TRAIN_SEEDS))]
        t0 = rng.randint(CLIP_T_MAX)
        imgs, lbls = labeled_clip(t0, path_num, HW, seed=seed,
                                  occluders=OCCLUDERS, billboards=BILLBOARDS,
                                  noise_sigma=NOISE_SIGMA,
                                  flash_period=FLASH_PERIOD,
                                  noise_seed=rng.randint(1 << 20))
        fs.append(_norm_clip(imgs))
        ls.append(lbls[-1])
    frames = np.stack(fs, axis=1).astype(np.float32)   # [P, N, H, W, 3]
    labels = np.stack(ls).astype(np.int32)
    return frames, labels


def train(steps: int, batch: int = 4):
    import jax
    import jax.numpy as jnp
    from tdnet_tpu.models import tdnet_config
    from tdnet_tpu.train.trainer import make_train_state, make_train_step

    cfg = tdnet_config("td4-psp18", nclass=N_CLASSES, in_size=HW,
                       streaming=False)
    key = jax.random.PRNGKey(0)
    state = make_train_state(key, cfg, max_iter=steps,
                             opt_kwargs=dict(lr0=1e-2, warmup_steps=100))
    step = make_train_step(cfg, max_iter=steps,
                           opt_kwargs=dict(lr0=1e-2, warmup_steps=100))
    rng = np.random.RandomState(7)
    t0 = time.time()
    for it in range(steps):
        frames, labels = make_batch(rng, batch, cfg.path_num)
        state, m = step(state, jnp.asarray(frames), jnp.asarray(labels),
                        jnp.int32(it % cfg.path_num))
        if it % 50 == 0 or it == steps - 1:
            print(f"it {it:4d}  loss {float(m['loss']):.4f}  "
                  f"lr {float(m['lr']):.5f}  ({time.time()-t0:.0f}s)",
                  flush=True)
    return jax.device_get(state["params"]), cfg


def eval_stream(params, ablate: bool, quant: str | None = None):
    """Streaming mIoU over the held-out videos; frames >= window only."""
    import jax
    import jax.numpy as jnp
    from tdnet_tpu.data.synthetic import labeled_clip
    from tdnet_tpu.models import tdnet_config
    from tdnet_tpu.stream.runtime import Streamer
    from tdnet_tpu.train.metrics import RunningScore

    cfg = tdnet_config("td4-psp18", nclass=N_CLASSES, in_size=HW,
                       streaming=True)
    attn = "pallas" if jax.default_backend() == "tpu" else "xla"
    streamer = Streamer(params, cfg, attn_impl=attn, ablate_prop=ablate,
                        quant=quant)
    score = RunningScore(N_CLASSES)
    occ_score = RunningScore(N_CLASSES)   # temporal-only pixels (occ mask)
    for seed in EVAL_SEEDS:
        imgs, lbls, occ = labeled_clip(0, EVAL_FRAMES, HW, seed=seed,
                                       occluders=OCCLUDERS,
                                       billboards=BILLBOARDS,
                                       noise_sigma=NOISE_SIGMA,
                                       flash_period=FLASH_PERIOD,
                                       return_occ=True)
        imgs = _norm_clip(imgs)
        streamer.reset()
        for t in range(EVAL_FRAMES):
            out, _ = streamer.step(jnp.asarray(imgs[t][None]), timed=False)
            if t >= cfg.window:      # same frames scored in both modes
                pred = jnp.argmax(out, axis=-1)
                score.update(jnp.asarray(lbls[t][None]), pred)
                occ_lbl = np.where(occ[t], lbls[t], -1)  # <0 -> dropped
                occ_score.update(jnp.asarray(occ_lbl[None]), pred)
    def _pack(sc):
        scores, cls_iu = sc.get_scores()
        return {"miou": float(scores["Mean IoU : \t"]),
                "acc": float(scores["Overall Acc: \t"]),
                "class_iou": {k: float(v) for k, v in cls_iu.items()}}
    return {**_pack(score), "temporal_only": _pack(occ_score)}


def main():
    import pickle

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=700)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--out", default="MECHANISM.json")
    ap.add_argument("--params", default="/tmp/mech_params.pkl",
                    help="trained-checkpoint pickle (written after train, "
                         "reused by --eval_only)")
    ap.add_argument("--eval_only", action="store_true")
    args = ap.parse_args()

    if args.eval_only:
        with open(args.params, "rb") as f:
            params = pickle.load(f)
    else:
        params, _ = train(args.steps, args.batch)
        with open(args.params, "wb") as f:
            pickle.dump(params, f)
    warm = eval_stream(params, ablate=False)
    ablated = eval_stream(params, ablate=True)

    # side artifact (VERDICT r3 #1b): int8 PTQ accuracy delta on a
    # TRAINED checkpoint — the first measured mIoU cost of ops/quant.py
    warm_int8 = eval_stream(params, ablate=False, quant="int8")
    with open("INT8_ACCURACY.json", "w") as f:
        json.dump({"task": "synthetic moving scenes (mechanism-proof ckpt)",
                   "model": "td4-psp18", "in_size": HW,
                   "miou_float": warm["miou"],
                   "miou_int8": warm_int8["miou"],
                   "miou_delta": round(warm_int8["miou"] - warm["miou"], 4)},
                  f, indent=1)
    result = {
        "task": ("synthetic moving street scenes, "
                 f"{BILLBOARDS} FLASHING billboards (texture shown 1 frame "
                 f"in {FLASH_PERIOD}, neutral gray otherwise, labels keep "
                 "the texture class) — billboard class is structurally "
                 "unobservable from a dark frame, readable only from the "
                 "propagation window"),
        "model": "td4-psp18", "in_size": HW, "nclass": N_CLASSES,
        "flash_period": FLASH_PERIOD,
        "billboards": BILLBOARDS, "occluders": OCCLUDERS,
        "noise_sigma": NOISE_SIGMA,
        "train_steps": args.steps, "train_seeds": TRAIN_SEEDS,
        "eval_seeds": EVAL_SEEDS, "eval_frames_per_video": EVAL_FRAMES,
        "warm": warm, "ablated": ablated,
        "miou_delta_warm_minus_ablated": round(
            warm["miou"] - ablated["miou"], 4),
        "temporal_only_miou_delta_warm_minus_ablated": round(
            warm["temporal_only"]["miou"] - ablated["temporal_only"]["miou"],
            4),
        "mechanism_net_positive": warm["miou"] > ablated["miou"],
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0 if result["mechanism_net_positive"] else 1


if __name__ == "__main__":
    sys.exit(main())
