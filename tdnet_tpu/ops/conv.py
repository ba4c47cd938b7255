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

import functools
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


def _conv_s1(x, w, padding, dilation):
    return lax.conv_general_dilated(
        x, w, (1, 1), ((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.promote_types(x.dtype, w.dtype),
    ).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv2d_mm_wgrad(x, w, padding: int, dilation: int):
    """Stride-1 conv whose WEIGHT gradient is computed as kh*kw dense
    MXU matmuls instead of XLA's conv-wgrad.

    XLA lowers the wgrad of the dilated 3x3 convs (layer3/4 multi-grid,
    reference Testing/model/pspnet/resnet.py:170-202) through a
    phase-decomposed conv that runs at ~45 TFLOP/s on v5e (23.4 of
    172 ms/step in the bf16 TD4-PSP18 recipe). Each kernel tap's
    gradient is just ``x_shifted^T @ dy`` over the n*h*w contraction —
    a [ci, L] x [L, co] matmul the MXU runs near peak. Forward and
    data-gradient are unchanged XLA convs; the weight gradient is the
    same multiset of products in a different summation order (f32
    accumulation, at least as accurate as the native path).
    """
    return _conv_s1(x, w, padding, dilation)


def _tap_wgrad(x, dy, padding, dilation, kh, kw, ci):
    """dW via one dense [ci, L] x [L, co] matmul per kernel tap."""
    d = dilation
    n = x.shape[0]
    Ho, Wo = dy.shape[1], dy.shape[2]
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    rows = []
    for ih in range(kh):
        row = []
        for iw in range(kw):
            xs = lax.slice(xp, (0, ih * d, iw * d, 0),
                           (n, ih * d + Ho, iw * d + Wo, ci))
            row.append(lax.dot_general(
                xs, dy, (((0, 1, 2), (0, 1, 2)), ((), ())),
                preferred_element_type=jnp.float32))
        rows.append(jnp.stack(row))
    return jnp.stack(rows)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv2d_mm(x, w, padding: int, dilation: int):
    """Stride-1 conv computed ENTIRELY as per-tap dense MXU matmuls —
    forward, data gradient and weight gradient.

    XLA lowers stride-1 dilated convs (and their gradients) through a
    phase-decomposed form whose relayout copies dominated the bf16
    TD4-PSP18 train profile (the [97,8,25,c] tile family, ~25 ms/step
    on v5e). Per tap the conv is a shifted [L, ci] x [ci, co] matmul:
    kh*kw dense dots summed in f32 — no phase relayouts anywhere, and
    every FLOP lands on the MXU. Same multiset of products as the
    direct conv (float-sum order apart; f32 accumulation throughout).
    """
    kh, kw, ci, co = w.shape
    d, p = dilation, padding
    n, H, W, _ = x.shape
    Ho, Wo = H + 2 * p - d * (kh - 1), W + 2 * p - d * (kw - 1)
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    out = None
    for ih in range(kh):
        for iw in range(kw):
            xs = lax.slice(xp, (0, ih * d, iw * d, 0),
                           (n, ih * d + Ho, iw * d + Wo, ci))
            t = lax.dot_general(xs, w[ih, iw], (((3,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            out = t if out is None else out + t
    return out.astype(x.dtype)


def _mm_conv_fwd(x, w, padding, dilation):
    return conv2d_mm(x, w, padding, dilation), (x, w)


def _mm_conv_bwd(padding, dilation, res, dy):
    x, w = res
    kh, kw, ci, co = w.shape
    d, p = dilation, padding
    n, H, W, _ = x.shape
    Ho, Wo = dy.shape[1], dy.shape[2]
    # dgrad: per-tap dy @ w^T, accumulated at shifted offsets via
    # fusable pads (no scatter, no strided writes)
    acc = None
    for ih in range(kh):
        for iw in range(kw):
            t = lax.dot_general(dy, w[ih, iw], (((3,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
            pad_cfg = ((0, 0),
                       (ih * d, H + 2 * p - Ho - ih * d),
                       (iw * d, W + 2 * p - Wo - iw * d),
                       (0, 0))
            t = jnp.pad(t, pad_cfg)
            acc = t if acc is None else acc + t
    dx = lax.slice(acc, (0, p, p, 0),
                   (n, p + H, p + W, ci)).astype(x.dtype)
    dw = _tap_wgrad(x, dy, p, d, kh, kw, ci).astype(w.dtype)
    return dx, dw


conv2d_mm.defvjp(_mm_conv_fwd, _mm_conv_bwd)


def _mm_wgrad_fwd(x, w, padding, dilation):
    return _conv_s1(x, w, padding, dilation), (x, w)


def _mm_wgrad_bwd(padding, dilation, res, dy):
    x, w = res
    kh, kw, ci, co = w.shape
    d = dilation
    # dgrad: correlation with the flipped, IO-swapped kernel
    w_t = jnp.flip(w, (0, 1)).swapaxes(2, 3)
    ph, pw = d * (kh - 1) - padding, d * (kw - 1) - padding
    dx = lax.conv_general_dilated(
        dy, w_t, (1, 1), ((ph, ph), (pw, pw)),
        rhs_dilation=(d, d), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.promote_types(dy.dtype, w.dtype),
    ).astype(x.dtype)
    dw = _tap_wgrad(x, dy, padding, d, kh, kw, ci).astype(w.dtype)
    return dx, dw


conv2d_mm_wgrad.defvjp(_mm_wgrad_fwd, _mm_wgrad_bwd)


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
