"""Model-sweep benchmark CLI — reproduces the reference's latency table
(Testing/TEST_README.md:27-33) on TPU.

``python -m tdnet_tpu.cli.benchmark [--models ...] [--in_size H W]``
measures steady-state pipelined streaming throughput (hard device
barriers, frames chained on-device through the feature cache) for each
model and prints a table plus the reference numbers for comparison.
"""

from __future__ import annotations

import argparse
import time

REFERENCE_MS = {"td4-psp18": 85.0, "td2-psp50": 180.0, "psp101": 360.0}


def bench_tdnet(model, in_size, dtype, attn_impl, n, quant=None):
    import jax
    import jax.numpy as jnp
    from tdnet_tpu.models import init_tdnet, tdnet_config
    from tdnet_tpu.stream.runtime import Streamer

    cfg = tdnet_config(model, in_size=in_size, streaming=True)
    params = init_tdnet(jax.random.PRNGKey(0), cfg)
    s = Streamer(params, cfg, dtype=dtype, attn_impl=attn_impl,
                 quant=quant)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, *in_size, 3), dtype)
    s.warm_compile(img)
    s.reset()
    _, spf = s.run_pipelined([img] * n)
    s.reset()
    _, spf2 = s.run_pipelined([img] * n)
    return min(spf, spf2)


def bench_psp101(in_size, dtype, n, quant=None):
    import jax
    import jax.numpy as jnp
    from tdnet_tpu.models import PSPNetConfig, apply_pspnet, init_pspnet
    from tdnet_tpu.nn.module import Ctx
    from tdnet_tpu.stream.runtime import hard_sync

    cfg = PSPNetConfig(nclass=19, backbone="resnet101", in_size=in_size)
    params = jax.tree.map(lambda x: x.astype(dtype),
                          init_pspnet(jax.random.PRNGKey(0), cfg))
    ctx = Ctx(train=False, quant=quant)
    fwd = jax.jit(lambda p, x: apply_pspnet(p, x, cfg, ctx)[0])
    img = jax.random.normal(jax.random.PRNGKey(1), (1, *in_size, 3), dtype)
    hard_sync(fwd(params, img))
    t0 = time.perf_counter()
    o = None
    for _ in range(n):
        o = fwd(params, img)
    hard_sync(o)
    return (time.perf_counter() - t0) / n


def main(argv=None):
    import jax.numpy as jnp

    parser = argparse.ArgumentParser()
    parser.add_argument("--models", nargs="+",
                        default=["td4-psp18", "td2-psp50", "psp101"])
    parser.add_argument("--in_size", type=int, nargs=2, default=[769, 1537])
    parser.add_argument("--dtype", default="bfloat16",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--attn_impl", default="pallas",
                        choices=["xla", "pallas"])
    parser.add_argument("--frames", type=int, default=40)
    parser.add_argument("--quant", default=None, choices=["int8"],
                        help="opt-in int8 PTQ backbone (ops/quant.py)")
    args = parser.parse_args(argv)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    in_size = tuple(args.in_size)
    print(f"| Model | {in_size[0]}x{in_size[1]} {args.dtype} "
          f"| Reference (Titan Xp @769x1537) | Speedup |")
    print("|---|---|---|---|")
    for model in args.models:
        if model == "psp101":
            spf = bench_psp101(in_size, dtype, args.frames,
                               quant=args.quant)
        else:
            spf = bench_tdnet(model, in_size, dtype, args.attn_impl,
                              args.frames, quant=args.quant)
        ref_ms = REFERENCE_MS.get(model)
        ref = f"{1000 / ref_ms:.1f} FPS ({ref_ms:.0f} ms)" if ref_ms else "—"
        speed = f"{(1 / spf) / (1000 / ref_ms):.1f}x" if ref_ms else "—"
        print(f"| {model} | {1 / spf:.1f} FPS ({spf * 1000:.1f} ms) "
              f"| {ref} | {speed} |")


if __name__ == "__main__":
    main()
