"""Capture a per-op device-time profile of the full training step.

VERDICT r4 weak #4 / next #4: the bf16 train step sits at 116 ms/step
against a <=105 target, and the named residuals (~21 ms stem/maxpool
copy family, ~15 ms small-op groups) were never attacked with a fresh
trace. This captures a ``jax.profiler`` trace of N full-recipe steps
(TD4-PSP18 @769x1537, OHEM + R101 grouped-teacher KD — the same
configuration bench_train.py records) and prints the per-op table via
utils/xprof, ready to paste into docs/PERF.md.

Run: python scripts/profile_train.py [--f32] [--steps 12] [--dir DIR]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--dir", default="/tmp/trace_train")
    ap.add_argument("--conv_wgrad", default=None)
    ap.add_argument("--top", type=int, default=28)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from tdnet_tpu.models import TDNetConfig, init_teacher
    from tdnet_tpu.models.teacher import TeacherConfig
    from tdnet_tpu.stream.runtime import hard_sync
    from tdnet_tpu.train.loss import make_loss_fn
    from tdnet_tpu.train.trainer import make_train_state, make_train_step
    from tdnet_tpu.utils import xprof

    in_hw = (769, 1537)
    cfg = TDNetConfig(nclass=19, backbone="resnet18", path_num=4,
                      in_size=in_hw, kv_stride=3, pool_before_proj=True,
                      aux=True)
    tcfg = TeacherConfig(nclass=19, backbone="resnet101", path_num=4)
    loss_fn = make_loss_fn("OhemCELoss2D", {
        "batch_size": 1, "n_devices": 1, "crop_size": list(in_hw),
        "loss": {"name": "OhemCELoss2D", "thresh": 0.7, "ignore_index": 250},
    })
    state = make_train_state(jax.random.PRNGKey(0), cfg, max_iter=40000)
    teacher_params = init_teacher(jax.random.PRNGKey(1), tcfg)
    step = make_train_step(cfg, teacher_cfg=tcfg, max_iter=40000,
                           loss_fn=loss_fn, conv_wgrad=args.conv_wgrad,
                           compute_dtype=None if args.f32 else jnp.bfloat16)

    frames = jax.random.normal(jax.random.PRNGKey(2), (4, 1, *in_hw, 3),
                               jnp.float32)
    labels = jnp.zeros((1, *in_hw), jnp.int32)
    state, metrics = step(state, frames, labels, jnp.int32(0), teacher_params)
    hard_sync(metrics["loss"])
    import time
    t0 = time.perf_counter()
    for i in range(args.steps):
        state, metrics = step(state, frames, labels, jnp.int32(i % 4),
                              teacher_params)
    hard_sync(metrics["loss"])
    print(f"warm: {(time.perf_counter()-t0)/args.steps*1e3:.1f} ms/step")
    with jax.profiler.trace(args.dir):
        for i in range(args.steps):
            state, metrics = step(state, frames, labels, jnp.int32(i % 4),
                                  teacher_params)
        hard_sync(metrics["loss"])
    for rep in xprof.op_report(
            xprof.load_xspace(xprof.latest_xplane(args.dir))):
        print(xprof.format_report(rep, steps=args.steps, top=args.top))
    return 0


if __name__ == "__main__":
    sys.exit(main())
