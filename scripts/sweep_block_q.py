"""Sweep the Pallas attention q-block size (and fc fusion) in situ.

VERDICT r3 #6: ``default_block_q`` was tuned at the TD2 hot shape
(33k x 2.1k, d_v=128); the TD4 shape (18.7k x 1225, d_v=512) never got
its own sweep and TD4 sits at 167 FPS against a >170 target. Isolated
kernel timings don't transfer (docs/PERF.md "Measuring on this
hardware"), so this sweeps the FULL streaming step: pipelined FPS of
the whole model per (block_q, fc-fusion) cell.

Run: python scripts/sweep_block_q.py [--model td4-psp18] [--h 769 --w 1537]
Writes one JSON line per cell; paste the table into docs/PERF.md and
bake the winner into kernels/propagation_attention.py:default_block_q.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys

sys.path.insert(0, "/root/repo")


def measure(model, in_size, block_q, fc_fused, n_frames=50):
    import jax
    import jax.numpy as jnp

    import tdnet_tpu.kernels.propagation_attention as pa
    from bench import _load_frames
    from tdnet_tpu.models import init_tdnet, tdnet_config
    from tdnet_tpu.stream.runtime import Streamer

    orig_default = pa.default_block_q
    orig_fused = pa.fused_propagation_attention
    pa.default_block_q = lambda lq, lkv: block_q
    if not fc_fused:
        @functools.wraps(orig_fused)
        def nofuse(q, k, v, *, temperature, block_q=None, fc_w=None,
                   fc_b=None):
            out = orig_fused(q, k, v, temperature=temperature,
                             block_q=block_q)
            if fc_w is not None:
                out = jnp.einsum("nld,de->nle", out, fc_w) + fc_b
            return out
        pa.fused_propagation_attention = nofuse
    try:
        cfg = tdnet_config(model, in_size=in_size, streaming=True)
        params = init_tdnet(jax.random.PRNGKey(0), cfg)
        streamer = Streamer(params, cfg, dtype=jnp.bfloat16,
                            attn_impl="pallas", stem_impl="oct")
        imgs = _load_frames(in_size, jnp.bfloat16)
        streamer.warm_compile(imgs[0])
        stream = [imgs[i % len(imgs)] for i in range(n_frames)]
        spf = float("inf")
        for _ in range(3):
            streamer.reset()
            _, s = streamer.run_pipelined(stream)
            spf = min(spf, s)
        return 1.0 / spf
    finally:
        pa.default_block_q = orig_default
        pa.fused_propagation_attention = orig_fused


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="td4-psp18")
    ap.add_argument("--h", type=int, default=769)
    ap.add_argument("--w", type=int, default=1537)
    ap.add_argument("--blocks", type=int, nargs="+",
                    default=[128, 256, 512, 1024, 2048])
    args = ap.parse_args()
    in_size = (args.h, args.w)
    for fc_fused in (True, False):
        for bq in args.blocks:
            try:
                fps = measure(args.model, in_size, bq, fc_fused)
                print(json.dumps({"model": args.model, "block_q": bq,
                                  "fc_fused": fc_fused,
                                  "fps": round(fps, 2)}), flush=True)
            except Exception as e:  # VMEM OOM at large blocks is expected
                print(json.dumps({"model": args.model, "block_q": bq,
                                  "fc_fused": fc_fused,
                                  "error": str(e)[:200]}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
