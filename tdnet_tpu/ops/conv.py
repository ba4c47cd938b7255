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


def space_to_depth(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """NHWC space-to-depth; pads H/W up to a multiple of ``block`` with
    zeros. Channel order of the output: (dy, dx, c)."""
    n, h, w, c = x.shape
    b = block
    ph, pw = (-h) % b, (-w) % b
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    h2, w2 = (h + ph) // b, (w + pw) // b
    x = x.reshape(n, h2, b, w2, b, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h2, w2, b * b * c)


def fold_stem_conv_s2d(w: jnp.ndarray, padding: int):
    """Fold a stride-2 conv kernel for application after space_to_depth(2).

    Returns (w2 [kh2, kw2, 4*cin, cout], (pad_top, pad_left)). The conv on
    the s2d input runs with stride 1 and asymmetric padding; arithmetic is
    identical to the original stride-2 conv (same taps, regrouped), but
    the MXU sees 4x the input channels and 1/4 the spatial positions —
    the classic TPU stem optimization for channel-starved first convs.

    Measured on v5e at 1025x2049: the win is real only when the input
    already arrives space-to-depth'd from the host (2.95 ms vs 3.9 ms
    isolated); a device-side relayout of the channels-minor image costs
    more than the conv saves, and inside the full model XLA's fused
    stem is already fast. Default OFF (Ctx.stem_impl="s2d") — kept as tooling
    for hosts that can emit blocked frames.
    """
    kh, kw, cin, cout = w.shape

    def taps(k):
        us = [r - padding for r in range(k)]
        bs = [u // 2 for u in us]
        return us, min(bs), max(bs)

    us_h, bmin_h, bmax_h = taps(kh)
    us_w, bmin_w, bmax_w = taps(kw)
    kh2, kw2 = bmax_h - bmin_h + 1, bmax_w - bmin_w + 1
    w2 = jnp.zeros((kh2, kw2, 4 * cin, cout), w.dtype)
    for rh, uh in enumerate(us_h):
        for rw, uw in enumerate(us_w):
            a, b = uh % 2, uw % 2
            cslice = (a * 2 + b) * cin
            w2 = w2.at[uh // 2 - bmin_h, uw // 2 - bmin_w,
                       cslice:cslice + cin, :].set(w[rh, rw])
    return w2, (-bmin_h, -bmin_w)


def conv2d_stem_s2d(x: jnp.ndarray, w: jnp.ndarray, *, padding: int) -> jnp.ndarray:
    """Stride-2 conv via space-to-depth. Exact same result as
    ``conv2d(x, w, stride=2, padding=padding)`` for any H/W."""
    n, h, w_in, cin = x.shape
    kh = w.shape[0]
    out_h = (h + 2 * padding - kh) // 2 + 1
    out_w = (w_in + 2 * padding - w.shape[1]) // 2 + 1
    x2 = space_to_depth(x, 2)
    w2, (pt, plft) = fold_stem_conv_s2d(w, padding)
    pb = out_h - 1 + w2.shape[0] - x2.shape[1] - pt
    pr = out_w - 1 + w2.shape[1] - x2.shape[2] - plft
    y = lax.conv_general_dilated(
        x2, w2, window_strides=(1, 1),
        padding=((pt, pb), (plft, pr)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.promote_types(x.dtype, w.dtype),
    )
    return y.astype(x.dtype)


def conv2d_stem_oct(x: jnp.ndarray, w: jnp.ndarray, *, padding: int) -> jnp.ndarray:
    """Stride-2 channel-starved stem conv as ONE dense MXU matmul.

    The direct conv (3 input channels) runs at ~3% MXU utilization and
    dominated the TD4-PSP18 streaming profile (1.6 of 7.1 ms/frame on
    v5e). Reformulation: view each padded row as OCTETS of 8 pixels
    (free minor-dim reshape to 8*cin=24 channels), take one strided
    row-slice per row parity, and assemble an im2col matrix
    ``q [oh, ow/4, kh*2*8*cin]`` from 2*kh shifted octet slices. Four
    width-phases (wo mod 4) share the same 2-octet window, so a single
    ``q @ w_packed [kh*16*cin, 4*cout]`` computes all of them and the
    phase axis reshapes away for free. Exact same multiset of products
    as the direct conv (result differs by float summation order only).

    Measured on v5e at 769x1537x3 -> 64: 0.63 ms vs 2.13 ms isolated
    (matmul itself 0.08 ms; the rest is the two strided row-slices and
    the concat). Requires kernel size <= 10 (2f+dx < 16).
    """
    n, h, wd, cin = x.shape
    kh, kw, _, co = w.shape
    assert 2 * 3 + kw - 1 < 16, "width window must fit two octets"
    oh = (h + 2 * padding - kh) // 2 + 1
    ow = (wd + 2 * padding - kw) // 2 + 1
    ow4 = (ow + 3) // 4
    wp8 = 8 * (ow4 + 1)
    nh = (kh + 1) // 2
    hp = 2 * (oh + nh)

    # packed weight: contraction (dy, oct 0|1, pixel-in-oct, cin),
    # output (phase f, cout); tap dx of phase f reads pixel p = 2f+dx
    wpk = jnp.zeros((kh, 2, 8, cin, 4, co), w.dtype)
    for f in range(4):
        for dx in range(kw):
            p = 2 * f + dx
            wpk = wpk.at[:, p // 8, p % 8, :, f, :].set(w[:, dx])
    wpk = wpk.reshape(kh * 16 * cin, 4 * co)

    xp = jnp.pad(x, ((0, 0), (padding, hp - h - padding),
                     (padding, wp8 - wd - padding), (0, 0)))
    E = lax.slice(xp, (0, 0, 0, 0), (n, hp - 1, wp8, cin), (1, 2, 1, 1))
    O = lax.slice(xp, (0, 1, 0, 0), (n, hp, wp8, cin), (1, 2, 1, 1))
    E = E.reshape(n, oh + nh, wp8 // 8, 8 * cin)
    O = O.reshape(n, oh + nh, wp8 // 8, 8 * cin)
    qs = []
    for dy in range(kh):
        src = E if dy % 2 == 0 else O
        m0 = dy // 2
        qs.append(lax.slice(src, (0, m0, 0, 0), (n, m0 + oh, ow4, 8 * cin)))
        qs.append(lax.slice(src, (0, m0, 1, 0), (n, m0 + oh, 1 + ow4, 8 * cin)))
    q = jnp.concatenate(qs, axis=-1)
    out = jnp.matmul(q.reshape(-1, q.shape[-1]), wpk,
                     preferred_element_type=jnp.promote_types(x.dtype, w.dtype))
    out = out.astype(x.dtype).reshape(n, oh, ow4 * 4, co)
    return lax.slice(out, (0, 0, 0, 0), (n, oh, ow, co))


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
