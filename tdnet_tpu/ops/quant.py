"""Post-training int8 quantized inference ops (beyond-reference feature).

The reference framework is f32-only; on TPU v5e the int8 MXU path has
2x the bf16 peak (394 vs 197 TOP/s), so an int8 conv trunk raises the
streaming throughput ceiling. This module implements the standard PTQ
recipe that needs no calibration data:

- weights: symmetric per-output-channel int8 (``absmax/127`` scales,
  computed from the float weights inside the jitted step — the trunk's
  weights are tiny next to its activations, so re-quantizing per frame
  costs microseconds and keeps the params pytree unchanged),
- activations: symmetric per-tensor DYNAMIC int8 (absmax of the live
  tensor); no calibration pass, no clipping tuning,
- accumulation in int32, dequantization in f32, bias added after.

Quantization error is bounded and tested (tests/test_quant.py); the
mode is opt-in (``Ctx.quant='int8'`` / ``Streamer(quant='int8')``) and
applies to the residual-block convs of the backbone only — the stem
(channel-starved, quality-critical first layer), BN/attention/heads
stay in the float dtype, standard PTQ practice.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_QMAX = 127.0
_EPS = 1e-12


def compiler_options_for(quant: str | None) -> dict | None:
    """Per-compile XLA options a quantized step needs, else None.

    The absmax+dequant+bn+relu producer fusions around the int8 convs
    stack-allocate past the default 16 MiB scoped-vmem budget at
    deployment shapes (v5e, [1,97,193,256]: "Ran out of memory in memory
    space vmem ... 18.92M and limit 16.00M"). Raise the per-compile
    scratch budget — v5e has 128 MiB of VMEM; 24 MiB of scratch is safe.
    Pass the result as ``jax.jit(..., compiler_options=...)``. Non-TPU
    backends (the CPU test mesh, or a GPU) reject TPU-only flags, so
    they get None.
    """
    import jax
    if quant == "int8" and jax.default_backend() == "tpu":
        return {"xla_tpu_scoped_vmem_limit_kib": 24576}
    return None


def quantize_weight(w: jnp.ndarray):
    """Symmetric per-output-channel int8 for an HWIO kernel.

    Returns (q int8 [kh,kw,ci,co], scale f32 [co]) with
    ``q * scale ~= w`` and ``|q| <= 127``.
    """
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=(0, 1, 2))
    scale = jnp.maximum(absmax, _EPS) / _QMAX
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -_QMAX, _QMAX)
    return q.astype(jnp.int8), scale


def quantize_act(x: jnp.ndarray):
    """Symmetric per-tensor dynamic int8 for an activation tensor.

    Returns (q int8, scale f32 scalar). The absmax reduce is one VPU
    pass over a tensor the following conv reads anyway.
    """
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(absmax, _EPS) / _QMAX
    # keep the reduce out of the quantize fusion: XLA otherwise builds one
    # (f32[], f32[N,H,W,C]) kOutput fusion whose stack allocation blows the
    # 16M scoped-vmem limit at deployment shapes (v5e, [1,97,193,256]:
    # "Ran out of memory in memory space vmem ... 18.92M and limit 16.00M")
    scale = lax.optimization_barrier(scale)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -_QMAX, _QMAX)
    return q.astype(jnp.int8), scale


def conv2d_int8(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None,
                *, stride: int = 1, padding: int = 0,
                dilation: int = 1) -> jnp.ndarray:
    """Drop-in ``ops.conv2d`` replacement computing in int8 on the MXU.

    NHWC/HWIO like conv2d; the int8 x int8 -> int32 convolution carries
    ~2x the bf16 MXU rate on v5e. Output returns in ``x.dtype`` after
    f32 dequantization (``y_i32 * (s_x * s_w[co])``).
    """
    qx, sx = quantize_act(x)
    qw, sw = quantize_weight(w)
    y = lax.conv_general_dilated(
        qx, qw,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (sx * sw)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)
