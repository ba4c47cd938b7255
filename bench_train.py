"""Training-step benchmark: TD4-PSP18 full reference recipe on one chip.

Recipe (Training/configs/td4_psp18_cityscapes.yml:26-42 +
td4_psp.py:367-374): 769x1537 crop, batch 1 per chip, OHEM-CE
(n_min = H*W/16) on out/out_sub/aux, R101 grouped-teacher KD, SGD-poly
via AdaOptimizer. The reference publishes no wall-clock training number
(BASELINE.md), so ``vs_baseline`` is null; the JSON line exists so the
ms/step figure is machine-recorded every round (VERDICT r1 #7).

Prints ONE JSON line. Run on the real TPU chip: ``python bench_train.py``;
``--bf16`` benches the opt-in mixed-precision mode (bf16 conv compute,
f32 masters/stats/losses) under the same recipe.
"""

from __future__ import annotations

import json
import sys
import time


def main():
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

    bf16 = "--bf16" in sys.argv
    # A/B a conv-autodiff policy (nn/resnet.py:_conv3x3) without editing
    # the per-dtype defaults: ``--conv_wgrad {mm,mm_wgrad,mixed,xla,pallas}``
    conv_wgrad = (sys.argv[sys.argv.index("--conv_wgrad") + 1]
                  if "--conv_wgrad" in sys.argv else None)
    teacher_quant = "int8" if "--teacher_quant" in sys.argv else None
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
    print(json.dumps({
        "metric": metric,
        "value": round(best * 1000.0, 1),
        "unit": "ms/step",
        "vs_baseline": None,  # reference publishes no training wall-clock
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
