"""Stateful streaming inference runtime.

Replaces the reference's per-frame Python loop over a stateful nn.Module
(Testing/test.py:46-74) with:

- per-path parameter trees resident in HBM (no per-frame gathers),
- one jitted step per path (PSP group slicing is static per path), with
  the K/V/Q cache pytree donated so it is updated in place,
- ``block_until_ready``-bracketed latency metering with the reference's
  6-frame warmup exclusion (test.py:58-59),
- optional bf16 compute.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from tdnet_tpu.models import model_init_cache, model_stream_step
from tdnet_tpu.models.tdnet import select_path
from tdnet_tpu.nn.module import Ctx


def hard_sync(x) -> None:
    """True device barrier: fetch one element to host.

    ``block_until_ready`` is a no-op on some tunneled platforms (axon);
    a tiny D2H read is the only reliable completion barrier and costs
    one element on direct-attached hardware.
    """
    np.asarray(jax.device_get(x.ravel()[0] if hasattr(x, "ravel") else x))


class LatencyMeter:
    def __init__(self, warmup: int = 6):
        self.warmup = warmup
        self.times: list[float] = []
        self.count = 0

    def add(self, dt: float):
        if self.count > self.warmup - 1:
            self.times.append(dt)
        self.count += 1

    @property
    def avg(self) -> float:
        return float(np.mean(self.times)) if self.times else float("nan")

    @property
    def fps(self) -> float:
        return 1.0 / self.avg if self.times else float("nan")


class Streamer:
    """Drives a TDNet (or any per-frame model) over a frame stream."""

    def __init__(self, params: dict, cfg, batch: int = 1,
                 dtype=jnp.float32, attn_impl: str = "xla",
                 stem_impl: str = "oct", fused_trunk: bool = True,
                 donate_cache: bool = True, quant: str | None = None,
                 ablate_prop: bool = False, fold_bn: bool = True):
        self.cfg = cfg
        self.dtype = dtype
        self._stream_step = model_stream_step(cfg)
        self._init_cache = model_init_cache(cfg)
        if dtype != jnp.float32:
            params = jax.tree.map(lambda x: x.astype(dtype)
                                  if jnp.issubdtype(x.dtype, jnp.floating) else x,
                                  params)
        if fold_bn:
            # pre-fold every BN's eval affine once at construction — the
            # per-frame [C]-vector rsqrt/mul/sub chains (one per BN, ~50
            # per step) leave the jitted graph (ops/norm.py:fold_bn_eval;
            # float-order-class change only, fold computed in f32 from
            # the post-cast stats exactly like the per-frame path).
            from tdnet_tpu.ops import fold_bn_eval
            params = fold_bn_eval(params)
        self.path_params = [
            jax.device_put(select_path(params["paths"], p))
            for p in range(cfg.path_num)]
        self.atn_params = [
            jax.device_put(select_path(params["atn"], p))
            for p in range(cfg.path_num)]
        self.cache = self._init_cache(cfg, batch, dtype)
        self.frame_idx = 0
        self.meter = LatencyMeter()

        def make_step(p):
            pid = cfg.psp_pid(p)

            def step(pp, ap, cache, img):
                ctx = Ctx(train=False, attn_impl=attn_impl,
                          stem_impl=stem_impl, fused_trunk=fused_trunk,
                          quant=quant, ablate_prop=ablate_prop)
                return self._stream_step(pp, ap, cache, img, cfg, pid, ctx)

            from tdnet_tpu.ops.quant import compiler_options_for
            return jax.jit(step, donate_argnums=(2,) if donate_cache else (),
                           compiler_options=compiler_options_for(quant))

        self._steps = [make_step(p) for p in range(cfg.path_num)]

    def reset(self):
        self.cache = self._init_cache(self.cfg, self.cache["q"].shape[1],
                                      self.dtype)
        self.frame_idx = 0

    def warm_compile(self, example: jnp.ndarray):
        """Pre-compile all path variants (reference analog: cudnn.benchmark)."""
        cache = self._init_cache(self.cfg, example.shape[0], self.dtype)
        for p in range(self.cfg.path_num):
            out, cache = self._steps[p](self.path_params[p],
                                        self.atn_params[p], cache, example)
        hard_sync(out)

    def step(self, img: jnp.ndarray, timed: bool = True):
        """Run one frame; returns upsampled logits [n, H, W, nclass]."""
        p = self.frame_idx % self.cfg.path_num
        img = img.astype(self.dtype)
        if timed:
            hard_sync(img)
        t0 = time.perf_counter()
        out, self.cache = self._steps[p](self.path_params[p],
                                         self.atn_params[p], self.cache, img)
        if timed:
            hard_sync(out)
            dt = time.perf_counter() - t0
            self.meter.add(dt)
        else:
            dt = time.perf_counter() - t0
        self.frame_idx += 1
        return out, dt

    def run_pipelined(self, frames, sync_every: int | None = None):
        """Throughput mode: submit frames back-to-back (the cache chains
        them on-device) and hard-sync only at the end. Returns
        (last_output, seconds_per_frame). This is the steady-state
        streaming rate; ``step(timed=True)`` measures single-frame
        latency including host round trip."""
        t0 = time.perf_counter()
        out = None
        for i, img in enumerate(frames):
            out, _ = self.step(img.astype(self.dtype), timed=False)
            if sync_every and (i + 1) % sync_every == 0:
                hard_sync(out)
        hard_sync(out)
        n = i + 1
        return out, (time.perf_counter() - t0) / n
