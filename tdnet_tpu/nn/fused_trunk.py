"""Fused grouped-PSP + QKV encoding (inference fast path).

The straightforward dataflow materializes the grouped pyramid feature
``z = concat(identity_slice, up(f1)..up(f4))`` (2048 channels at the c4
grid) and then runs three 1x1 projections over it. On TPU that costs a
full-width concat, a layout copy, and fat reads (~3 ms/frame at
1025x2049). This module exploits three exact identities:

1. a 1x1 conv distributes over channel concat:
   ``conv(concat(xs), W) = sum_i conv(x_i, W_i)`` with W split by input
   channel groups;
2. a 1x1 conv commutes with bilinear upsampling (both linear, the conv
   is pointwise): project the TINY pooled pyramid maps (<= 6x6) first,
   then upsample the d_k/d_v-wide result;
3. upsample-then-grid-subsample equals applying the row-sliced
   interpolation matrices: ``resize(x, HW)[::s] == resize_rows(x,
   A_h[::s], A_w[::s])``.

So z never exists: the identity slice of c4 feeds the projections
directly and each pyramid branch contributes an upsampled projection of
its pooled map. Exact to float-sum order; validated against the
reference path in tests/test_fused_trunk.py. Inference only (BN uses
running stats; the training path keeps the reference dataflow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tdnet_tpu.nn.module import Ctx  # noqa: F401 (signature typing)
from tdnet_tpu.ops import adaptive_avg_pool_multi, batch_norm, conv2d
from tdnet_tpu.ops.resize import interp_matrix

_BINS = (1, 2, 3, 6)


def _split_w(w, groups):
    """Split a 1x1 HWIO kernel by input-channel group sizes."""
    outs = []
    off = 0
    for g in groups:
        outs.append(w[:, :, off:off + g, :])
        off += g
    return outs


def _chan_slice(t, start, size):
    """Channel slice supporting a traced start (group streaming runs one
    sub-network per device, so pid = f(lax.axis_index) is traced)."""
    if isinstance(start, int):
        return t[..., start:start + size]
    return jax.lax.dynamic_slice_in_dim(t, start, size, axis=t.ndim - 1)


def _up_matrices(src: int, dst: int, stride: int | None, dtype):
    a = interp_matrix(src, dst, True, dtype=dtype)
    if stride:
        a = a[::stride]
    return a


def _upsample_mat(x, ah, aw):
    y = jnp.einsum("Oh,nhwc->nOwc", ah, x.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("Ow,nhwc->nhOc", aw, y,
                   precision=jax.lax.Precision.HIGHEST)
    return y.astype(x.dtype)


def _psp_pieces(psp_params, c4, pid, groups: int):
    """Pooled + projected + sliced pyramid branch maps (NOT upsampled).

    The four pyramid pools share a single pass over c4
    (adaptive_avg_pool_multi) instead of four full reads."""
    c = c4.shape[-1]
    gq = c // (groups * 4)
    pooled = adaptive_avg_pool_multi(c4, _BINS)
    pieces = []
    for i, f in enumerate(pooled):
        br = psp_params[f"conv{i + 1}"]
        f = conv2d(f, br["conv"]["w"])
        f = batch_norm(f, br["bn"], train=False, activation="relu")
        pieces.append(_chan_slice(f, pid * gq, gq))
    return pieces


def _proj_distributed(conv_w, conv_b, id_map, pieces, out_hw,
                      stride: int | None):
    """conv1x1(z)[::stride] without z: identity contribution + upsampled
    projected pyramid contributions."""
    c_id = id_map.shape[-1]
    gq = pieces[0].shape[-1]
    ws = _split_w(conv_w, [c_id] + [gq] * 4)
    if stride:
        y = conv2d(id_map[:, ::stride, ::stride, :], ws[0], conv_b)
    else:
        y = conv2d(id_map, ws[0], conv_b)
    dt = y.dtype
    oh, ow = out_hw
    for f, w in zip(pieces, ws[1:]):
        p = conv2d(f, w)  # tiny: <=6x6 spatial
        ah = _up_matrices(f.shape[1], oh, stride, jnp.float32)
        aw = _up_matrices(f.shape[2], ow, stride, jnp.float32)
        y = y + _upsample_mat(p, ah, aw).astype(dt)
    return y


def fused_psp_encoding(psp_params, enc_params, c4, ctx: Ctx, *, pid,
                       groups: int, kv_stride: int):
    """Returns (q_tokens, v_map, q_c, k_c, v_c): the outputs of
    apply_encoding_full + apply_encoding_cached(pool_before_proj=True)
    on the grouped-PSP feature, computed without materializing it.
    """
    del ctx  # inference-only path: BN always uses running stats
    n, h, w, c = c4.shape
    g = c // groups
    id_map = _chan_slice(c4, pid * g, g)
    pieces = _psp_pieces(psp_params, c4, pid, groups)

    def proj2(p2, full_stride):
        """two-layer q/k projection: conv0 -> BN(leaky) -> conv1."""
        y = _proj_distributed(p2["conv0"]["w"], p2["conv0"]["b"], id_map,
                              pieces, (h, w), full_stride)
        y = batch_norm(y, p2["bn0"], train=False, activation="leaky_relu")
        return conv2d(y, p2["conv1"]["w"], p2["conv1"]["b"])

    # current-frame (full-res) q and v
    q_full = proj2(enc_params["w_qs"], None)
    v_map = _proj_distributed(enc_params["w_vs"]["w"], enc_params["w_vs"]["b"],
                              id_map, pieces, (h, w), None)
    q_tokens = q_full.reshape(n, h * w, -1)

    # cached (subsampled) q/k/v — pool-before-projection semantics:
    # subsample z first == sliced upsample matrices (identity 3 above)
    q_c = proj2(enc_params["w_qs"], kv_stride)
    k_c = proj2(enc_params["w_ks"], kv_stride)
    v_c = _proj_distributed(enc_params["w_vs"]["w"], enc_params["w_vs"]["b"],
                            id_map, pieces, (h, w), kv_stride)
    tok = lambda t: t.reshape(n, t.shape[1] * t.shape[2], -1)
    return q_tokens, v_map, tok(q_c), tok(k_c), tok(v_c)
