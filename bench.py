"""Headline benchmark: TD2-PSP50 streaming FPS per TPU chip.

North star (BASELINE.md): TD2-PSP50 streaming on Cityscapes
1024x2048-class inputs at >= 2x the reference GPU FPS per chip.
Reference: ~180 ms/frame (5.56 FPS) on a Titan Xp at 769x1537
(Testing/TEST_README.md:32). We benchmark at 1025x2049 (the full-res
Cityscapes geometry, stride-8-aligned) in bf16 and report FPS and the
ratio vs the reference's published FPS.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import glob
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from tdnet_tpu.models import init_tdnet, tdnet_config
    from tdnet_tpu.stream.runtime import Streamer

    in_size = (1025, 2049)
    cfg = tdnet_config("td2-psp50", in_size=in_size, streaming=True)
    params = init_tdnet(jax.random.PRNGKey(0), cfg)
    streamer = Streamer(params, cfg, dtype=jnp.bfloat16, attn_impl="pallas")

    frames = sorted(glob.glob("/root/reference/Testing/data/vid1/*.png"))
    if frames:
        import cv2
        import imageio.v2 as imageio
        from tdnet_tpu.data.streaming import normalize_frame
        imgs = []
        for f in frames[:8]:
            img = imageio.imread(f)
            img = cv2.resize(img, (in_size[1], in_size[0]))
            imgs.append(jnp.asarray(normalize_frame(img)[None], jnp.bfloat16))
    else:  # no fixture: synthetic frames
        key = jax.random.PRNGKey(1)
        imgs = [jax.random.normal(key, (1, *in_size, 3), jnp.bfloat16)
                for _ in range(8)]

    streamer.warm_compile(imgs[0])
    n_frames = 60
    stream = [imgs[i % len(imgs)] for i in range(n_frames)]
    # steady-state streaming throughput: frames submitted back-to-back,
    # chained on-device through the feature cache, hard-synced at the
    # end; best of three repeats (host/tunnel jitter)
    spf = float("inf")
    for _ in range(3):
        streamer.reset()
        _, s = streamer.run_pipelined(stream)
        spf = min(spf, s)

    fps = 1.0 / spf
    ref_fps = 1000.0 / 180.0  # reference TD2-PSP50: ~180 ms/frame
    print(json.dumps({
        "metric": "td2_psp50_stream_fps_1025x2049_bf16_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / ref_fps, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
