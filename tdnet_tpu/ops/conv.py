"""Convolution wrappers and parameter initializers (NHWC / HWIO).

TPU-first: all convs use the NHWC layout so XLA tiles channels onto the
128-lane minor dimension of the MXU; kernels are stored HWIO. PyTorch
checkpoints (OIHW) are transposed on import
(tdnet_tpu/utils/torch_import.py).

Initializers match the reference:
- ``kaiming_normal(a=1)`` + zero bias for PSP/head/encoding convs
  (reference: Training/.../td4_psp/td4_psp.py:496-505 ``init_weight``),
- ``normal(0, sqrt(2/n))`` with n = kh*kw*out_ch for backbone convs
  (reference: Testing/model/pspnet/resnet.py:162-168).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

_DIMNUMS = ("NHWC", "HWIO", "OHWI")  # placeholder, real value below


def conv2d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None, *,
           stride: int = 1, padding: int = 0, dilation: int = 1) -> jnp.ndarray:
    """2-D convolution, NHWC input, HWIO kernel, symmetric padding."""
    y = lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.promote_types(x.dtype, w.dtype),
    )
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def init_conv_kaiming(key, kh: int, kw: int, cin: int, cout: int, *,
                      a: float = 1.0, bias: bool = False, dtype=jnp.float32) -> dict:
    """torch ``kaiming_normal_(w, a=a)`` (fan_in, leaky_relu gain)."""
    fan_in = kh * kw * cin
    gain = math.sqrt(2.0 / (1.0 + a * a))
    std = gain / math.sqrt(fan_in)
    p = {"w": std * jax.random.normal(key, (kh, kw, cin, cout), dtype)}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def init_conv_msra_out(key, kh: int, kw: int, cin: int, cout: int, *,
                       bias: bool = False, dtype=jnp.float32) -> dict:
    """Backbone init: normal(0, sqrt(2/n)), n = kh*kw*cout."""
    n = kh * kw * cout
    std = math.sqrt(2.0 / n)
    p = {"w": std * jax.random.normal(key, (kh, kw, cin, cout), dtype)}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def init_conv_torch_default(key, kh: int, kw: int, cin: int, cout: int, *,
                            bias: bool = True, dtype=jnp.float32) -> dict:
    """torch nn.Conv2d default: kaiming_uniform(a=sqrt(5)) + uniform bias."""
    fan_in = kh * kw * cin
    gain = math.sqrt(2.0 / (1.0 + 5.0))
    bound = gain * math.sqrt(3.0 / fan_in)
    k1, k2 = jax.random.split(key)
    p = {"w": jax.random.uniform(k1, (kh, kw, cin, cout), dtype, -bound, bound)}
    if bias:
        bb = 1.0 / math.sqrt(fan_in)
        p["b"] = jax.random.uniform(k2, (cout,), dtype, -bb, bb)
    return p
