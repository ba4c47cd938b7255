"""Ring-parallel attention propagation (explicit ICI collectives).

SURVEY.md 5.7: TDNet's temporal design IS a bounded sequence-parallel
scheme — hop-by-hop attention over a window of cached frames with value
accumulation. Its natural multi-chip mapping puts one cached frame's
K/V/Q (and one attention instance) on each device of a ``ring`` mesh
axis and passes the accumulated value tensor around the ring with
``ppermute`` — each step of the rotation executes one hop of the chain
(reference td4_psp18.py:145-147), so W devices finish the W-hop chain in
W ring steps with only the [n, L_kv, d_v] accumulator crossing ICI.

Under GSPMD the (data x path) training mesh already realizes this
dataflow implicitly; this module is the explicit shard_map form — the
template for scaling the window beyond path_num (longer temporal
context), where per-device KV residency is what makes the window cheap.

Equivalence with the serial chain: tests/test_ring.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tdnet_tpu.ops import scaled_dot_attention


def _apply_fc(atn_fc, tokens):
    w = atn_fc["w"][0, 0]
    return jnp.einsum("nld,de->nle", tokens, w) + atn_fc["b"]


def ring_hop_chain(atn_stacked, ks, vs, qs, q_cur, *, d_k: int, mesh: Mesh):
    """The W-hop propagation chain with per-hop state resident on the
    ``ring`` mesh axis.

    atn_stacked: fc params stacked [W, ...]; ks/vs/qs: [W, n, L, d]
    (oldest first); q_cur: [n, Lq, d_k] full-res current queries.
    Returns [n, Lq, d_v] tokens (the final hop's output, pre-reshape).
    """
    W = ks.shape[0]
    temperature = math.sqrt(d_k)

    def shard(x):
        return jax.device_put(x, NamedSharding(mesh, P("ring")))

    atn_sh = jax.tree.map(lambda x: shard(x), atn_stacked)
    ks_sh, vs_sh, qs_sh = shard(ks), shard(vs), shard(qs)
    rep = NamedSharding(mesh, P())
    q_cur = jax.device_put(q_cur, rep)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P("ring"), atn_stacked),
                  P("ring"), P("ring"), P("ring"), P()),
        out_specs=P(),
    )
    def chain(atn_local, k_local, v_local, q_local, q_cur):
        # local shapes: [1, n, L, d]; device i holds hop i's state
        idx = jax.lax.axis_index("ring")
        n, l, dv = v_local.shape[1:]
        acc = jnp.zeros((n, l, dv), v_local.dtype)
        out = jnp.zeros((n, q_cur.shape[1], dv), v_local.dtype)
        perm = [(i, (i + 1) % W) for i in range(W)]

        for step in range(W):
            # device holding hop `step` is active this ring step (the
            # others run the same masked compute to stay in lockstep for
            # the collectives — a W-step demo of the dataflow, not a
            # throughput path)
            active = idx == step
            if step < W - 1:
                # hops 0..W-2 attend with the NEXT cached frame's
                # queries, resident one device over
                q_in = jax.lax.ppermute(q_local[0], "ring",
                                        [((i + 1) % W, i) for i in range(W)])
            else:
                q_in = q_cur
            hop = scaled_dot_attention(q_in, k_local[0], v_local[0] + acc,
                                       temperature=temperature)
            hop = _apply_fc(jax.tree.map(lambda x: x[0], atn_local)["fc"],
                            hop)
            if step < W - 1:
                # pass the accumulator to the next hop's device
                acc_next = jnp.where(active, hop, jnp.zeros_like(hop))
                acc = jax.lax.ppermute(acc_next, "ring", perm)
                acc = jnp.where(idx == step + 1, acc, jnp.zeros_like(acc))
            else:
                out = jnp.where(active, hop, jnp.zeros_like(out))
        # only the last device produced the result; sum-reduce shares it
        return jax.lax.psum(out, "ring")

    return chain(atn_sh, ks_sh, vs_sh, qs_sh, q_cur)
