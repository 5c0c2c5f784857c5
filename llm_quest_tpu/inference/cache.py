"""Functional, static-shape KV cache.

TPU-first redesign of the reference's chunk-growing ``KVCache``
(reference: utils.py:409-531): XLA requires static shapes, so the cache is
pre-allocated to ``max_len`` once and filled in place via
``lax.dynamic_update_slice``; a scalar ``pos`` tracks how many positions are
valid. The cache is a plain pytree, threaded through model ``apply`` and
returned updated (no mutation) — it drops straight into ``lax.scan`` decode
loops as carry state.

Layout: (n_layers, b, n_kv_heads, max_len, head_dim) — one stacked array per
K/V rather than per-layer tensors, so a single sharding annotation covers all
layers and the decode step stays a single fused program.

The hybrid (Qwen3.5 / Qwen3-Next) cache lives in hybrid_cache.py.
"""

import jax.numpy as jnp
from jax import lax


def init_kv_cache(n_layers, batch, n_kv_heads, max_len, head_dim, *, v_head_dim=None, dtype=jnp.float32):
    """Zero-filled cache pytree: {"k", "v", "pos"}."""
    v_head_dim = v_head_dim if v_head_dim is not None else head_dim
    return {
        "k": jnp.zeros((n_layers, batch, n_kv_heads, max_len, head_dim), dtype),
        "v": jnp.zeros((n_layers, batch, n_kv_heads, max_len, v_head_dim), dtype),
        "pos": jnp.zeros((), jnp.int32),
    }


def update_layer(cache, layer_idx, k_new, v_new):
    """Write (b, hkv, s, d) new keys/values at the current position for one
    layer; returns the updated cache pytree plus the FULL (max_len) k/v views
    for attention. ``pos`` is NOT advanced here — call ``advance`` once after
    the final layer (mirrors reference: utils.py:524 advancing on last layer).
    """
    pos = cache["pos"]
    k = lax.dynamic_update_slice(cache["k"], k_new[None].astype(cache["k"].dtype), (layer_idx, 0, 0, pos, 0))
    v = lax.dynamic_update_slice(cache["v"], v_new[None].astype(cache["v"].dtype), (layer_idx, 0, 0, pos, 0))
    cache = {**cache, "k": k, "v": v}
    return cache, k[layer_idx], v[layer_idx]


def advance(cache, seq_len):
    """Advance the filled-position counter by seq_len."""
    return {**cache, "pos": cache["pos"] + seq_len}


def max_len(cache):
    return cache["k"].shape[3]
