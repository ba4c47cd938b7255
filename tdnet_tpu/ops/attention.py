"""Scaled dot-product attention for cross-frame feature propagation.

Reference semantics (Testing/model/pspnet/transformer.py:117-139):
``softmax(q @ k^T / sqrt(d_k)) @ v`` with attention dropout 0.1 in
training. The streaming hot shape is q = [1, 18721, 64] against
k/v = [1, 1225, 64/512] (769x1537 input, stride-4 KV subsampling).

This is the XLA reference implementation (two MXU matmuls + fused
softmax, f32 accumulation). A fused Pallas kernel lives in
``tdnet_tpu/kernels/propagation_attention.py`` and is selected via
``impl='pallas'`` where profitable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scaled_dot_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                         temperature: float,
                         dropout_rate: float = 0.0,
                         dropout_rng=None,
                         impl: str = "xla") -> jnp.ndarray:
    """q [n,Lq,dk] x k [n,Lk,dk] x v [n,Lk,dv] -> [n,Lq,dv].

    Softmax over the key axis, computed in f32 regardless of input dtype.
    """
    if impl == "pallas" and dropout_rng is None:
        from tdnet_tpu.kernels.propagation_attention import fused_propagation_attention
        return fused_propagation_attention(q, k, v, temperature=temperature)

    logits = jnp.einsum("nqd,nkd->nqk", q, k,
                        preferred_element_type=jnp.float32) / temperature
    attn = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, attn.shape)
        attn = jnp.where(keep, attn / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum("nqk,nkv->nqv", attn.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)
