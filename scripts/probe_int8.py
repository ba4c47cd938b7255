"""One-off TPU probe: does int8 PTQ (ops/quant.py) WIN streaming FPS?

Measures TD2-PSP50 @1025x2049 and TD4-PSP18 @769x1537 pipelined
throughput with quant=None vs quant='int8' under otherwise identical
settings (bf16, pallas attention, fused trunk). Decides VERDICT r3
weak #2 / next #1b: int8 gets measured lines in bench.py, or moves to
docs/PERF.md's rejected table with these numbers.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")


def bench(model, in_size, quant):
    import jax
    import jax.numpy as jnp
    from bench import _load_frames
    from tdnet_tpu.models import init_tdnet, tdnet_config
    from tdnet_tpu.stream.runtime import Streamer

    cfg = tdnet_config(model, in_size=in_size, streaming=True)
    params = init_tdnet(jax.random.PRNGKey(0), cfg)
    streamer = Streamer(params, cfg, dtype=jnp.bfloat16, attn_impl="pallas",
                        stem_impl="oct", quant=quant)
    imgs = _load_frames(in_size, jnp.bfloat16)
    streamer.warm_compile(imgs[0])
    stream = [imgs[i % len(imgs)] for i in range(60)]
    spf = float("inf")
    for _ in range(3):
        streamer.reset()
        _, s = streamer.run_pipelined(stream)
        spf = min(spf, s)
    return 1.0 / spf


def main():
    for model, in_size in [("td4-psp18", (769, 1537)),
                           ("td2-psp50", (1025, 2049))]:
        fps_f = bench(model, in_size, None)
        print(json.dumps({"model": model, "quant": None,
                          "fps": round(fps_f, 2)}), flush=True)
        fps_q = bench(model, in_size, "int8")
        print(json.dumps({"model": model, "in_size": in_size,
                          "fps_float": round(fps_f, 2),
                          "fps_int8": round(fps_q, 2),
                          "speedup": round(fps_q / fps_f, 3)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
