"""Headline + full-surface benchmark: one JSON line per metric.

Line 1 (headline, north star — BASELINE.md): TD2-PSP50 streaming FPS
per TPU chip at 1025x2049 (full-res Cityscapes geometry,
stride-8-aligned) in bf16, vs the reference's ~180 ms/frame on a Titan
Xp at 769x1537 (Testing/TEST_README.md:32).

Further lines machine-record the rest of the reference's latency table
(TEST_README.md:27-33) each round (VERDICT r2 #5): TD4-PSP18 and
PSP101 throughput at the reference geometry, plus HARD-SYNCED
single-frame latency — the reference's actually-published quantity
(Testing/test.py:50-56). On this host a device barrier costs a ~28 ms
tunnel round trip which inflates the latency lines; throughput lines
are pipelined (frames chained on-device) and unaffected.
"""

from __future__ import annotations

import glob
import json
import sys
import time

import numpy as np

REF_MS = {"td4-psp18": 85.0, "td2-psp50": 180.0, "psp101": 360.0}


def _load_frames(in_size, dtype, n=8):
    import cv2
    import imageio.v2 as imageio
    import jax
    import jax.numpy as jnp
    from tdnet_tpu.data.streaming import normalize_frame

    files = sorted(glob.glob("/root/reference/Testing/data/vid1/*.png"))
    if not files:  # self-contained: procedural demo clip (data/synthetic.py)
        from tdnet_tpu.data.synthetic import demo_clip_dir
        files = sorted(glob.glob(demo_clip_dir(n) + "/*.png"))
    imgs = []
    for f in files[:n]:
        img = imageio.imread(f)
        img = cv2.resize(img, (in_size[1], in_size[0]))
        imgs.append(jnp.asarray(normalize_frame(img)[None], dtype))
    return imgs


def _spread(samples):
    """min/median/max over repeats — attributes round-over-round dips to
    tunnel weather vs real regressions (VERDICT r4 weak #5)."""
    s = sorted(samples)
    return {"min": round(s[0], 4), "median": round(float(np.median(s)), 4),
            "max": round(s[-1], 4), "n": len(s)}


def _bench_stream(model, in_size, dtype, n_frames=60):
    """Returns (pipelined s/frame repeats list, per-frame latency list)."""
    import jax
    from tdnet_tpu.models import init_tdnet, tdnet_config
    from tdnet_tpu.stream.runtime import Streamer

    cfg = tdnet_config(model, in_size=in_size, streaming=True)
    params = init_tdnet(jax.random.PRNGKey(0), cfg)
    streamer = Streamer(params, cfg, dtype=dtype, attn_impl="pallas",
                        stem_impl="oct")
    imgs = _load_frames(in_size, dtype)
    streamer.warm_compile(imgs[0])

    stream = [imgs[i % len(imgs)] for i in range(n_frames)]
    spfs = []
    for _ in range(3):
        streamer.reset()
        _, s = streamer.run_pipelined(stream)
        spfs.append(s)

    streamer.reset()
    streamer.meter.times.clear()
    streamer.meter.count = 0
    for img in stream[:24]:
        streamer.step(img, timed=True)   # hard-synced, 6-frame warmup excl.
    return spfs, list(streamer.meter.times)


def _bench_psp101(in_size, dtype, n=40):
    import jax
    from tdnet_tpu.models import PSPNetConfig, apply_pspnet, init_pspnet
    from tdnet_tpu.nn.module import Ctx
    from tdnet_tpu.stream.runtime import hard_sync

    cfg = PSPNetConfig(nclass=19, backbone="resnet101", in_size=in_size)
    params = jax.tree.map(lambda x: x.astype(dtype),
                          init_pspnet(jax.random.PRNGKey(0), cfg))
    fwd = jax.jit(lambda p, x: apply_pspnet(
        p, x, cfg, Ctx(train=False, stem_impl="oct"))[0])
    img = _load_frames(in_size, dtype, n=1)[0]
    hard_sync(fwd(params, img))
    spfs = []
    for _ in range(3):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fwd(params, img)
        hard_sync(o)
        spfs.append((time.perf_counter() - t0) / n)
    return spfs


def main():
    import jax.numpy as jnp

    lines = []

    # 1. headline: TD2-PSP50 @ full-res Cityscapes geometry
    spfs_hd, lats_hd = _bench_stream("td2-psp50", (1025, 2049), jnp.bfloat16)
    spf_hd = min(spfs_hd)
    ref_fps = 1000.0 / REF_MS["td2-psp50"]
    lines.append({
        "metric": "td2_psp50_stream_fps_1025x2049_bf16_per_chip",
        "value": round(1.0 / spf_hd, 2), "unit": "frames/s",
        "vs_baseline": round((1.0 / spf_hd) / ref_fps, 2),
        "spread_fps": _spread([1.0 / s for s in spfs_hd])})

    # 2-3. TD4-PSP18 @ reference geometry: throughput + latency
    spfs4, lats4 = _bench_stream("td4-psp18", (769, 1537), jnp.bfloat16)
    spf4, lat4 = min(spfs4), float(np.mean(lats4))
    lines.append({
        "metric": "td4_psp18_stream_fps_769x1537_bf16_per_chip",
        "value": round(1.0 / spf4, 2), "unit": "frames/s",
        "vs_baseline": round((1.0 / spf4) / (1000.0 / REF_MS["td4-psp18"]),
                             2),
        "spread_fps": _spread([1.0 / s for s in spfs4])})
    lines.append({
        "metric": "td4_psp18_latency_ms_769x1537_bf16_hard_synced",
        "value": round(lat4 * 1000.0, 2), "unit": "ms/frame",
        "vs_baseline": round(REF_MS["td4-psp18"] / (lat4 * 1000.0), 2),
        "spread_ms": _spread([t * 1000.0 for t in lats4])})

    # 4. TD2-PSP50 latency at the reference geometry
    _, lats2 = _bench_stream("td2-psp50", (769, 1537), jnp.bfloat16,
                             n_frames=24)
    lat2 = float(np.mean(lats2))
    lines.append({
        "metric": "td2_psp50_latency_ms_769x1537_bf16_hard_synced",
        "value": round(lat2 * 1000.0, 2), "unit": "ms/frame",
        "vs_baseline": round(REF_MS["td2-psp50"] / (lat2 * 1000.0), 2),
        "spread_ms": _spread([t * 1000.0 for t in lats2])})

    # 5. PSPNet-101 baseline
    spfs1 = _bench_psp101((769, 1537), jnp.bfloat16)
    spf1 = min(spfs1)
    lines.append({
        "metric": "psp101_fps_769x1537_bf16_per_chip",
        "value": round(1.0 / spf1, 2), "unit": "frames/s",
        "vs_baseline": round((1.0 / spf1) / (1000.0 / REF_MS["psp101"]), 2),
        "spread_fps": _spread([1.0 / s for s in spfs1])})

    for line in lines:
        print(json.dumps(line))
    return 0


if __name__ == "__main__":
    sys.exit(main())
