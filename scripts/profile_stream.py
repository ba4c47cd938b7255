"""Capture a per-op device-time profile of the streaming step.

VERDICT r3 #2: the TD2@1025 streaming plateau (51.3 FPS) was never
profiled — docs/PERF.md's "Current profile" covers only the train step.
This captures a ``jax.profiler`` trace of N pipelined streaming frames
and prints the per-op table via utils/xprof, ready to paste into
docs/PERF.md ("Current profile (streaming)").

Run: python scripts/profile_stream.py [--model td2-psp50] [--h 1025 --w 2049]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="td2-psp50")
    ap.add_argument("--h", type=int, default=1025)
    ap.add_argument("--w", type=int, default=2049)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--dir", default="/tmp/trace_stream")
    ap.add_argument("--quant", default=None)
    ap.add_argument("--stem_impl", default="oct")
    args = ap.parse_args()
    in_size = (args.h, args.w)

    import jax
    import jax.numpy as jnp
    from bench import _load_frames
    from tdnet_tpu.models import init_tdnet, tdnet_config
    from tdnet_tpu.stream.runtime import Streamer
    from tdnet_tpu.utils import xprof

    cfg = tdnet_config(args.model, in_size=in_size, streaming=True)
    params = init_tdnet(jax.random.PRNGKey(0), cfg)
    streamer = Streamer(params, cfg, dtype=jnp.bfloat16, attn_impl="pallas",
                        stem_impl=args.stem_impl, quant=args.quant)
    imgs = _load_frames(in_size, jnp.bfloat16)
    streamer.warm_compile(imgs[0])
    stream = [imgs[i % len(imgs)] for i in range(args.frames)]
    streamer.reset()
    _, spf = streamer.run_pipelined(stream)   # warm the pipeline once
    streamer.reset()
    with jax.profiler.trace(args.dir):
        _, spf = streamer.run_pipelined(stream)
    print(f"pipelined: {1.0/spf:.2f} FPS ({spf*1e3:.2f} ms/frame)")
    for rep in xprof.op_report(
            xprof.load_xspace(xprof.latest_xplane(args.dir))):
        print(xprof.format_report(rep, steps=args.frames, top=24))
    return 0


if __name__ == "__main__":
    sys.exit(main())
