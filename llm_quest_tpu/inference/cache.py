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

from llm_quest_tpu.ops.quantization import QuantKV, quantize_rows_int8


def init_kv_cache(n_layers, batch, n_kv_heads, max_len, head_dim, *, v_head_dim=None, dtype=jnp.float32, quant=None):
    """Zero-filled cache pytree: {"k", "v", "pos"}.

    ``quant="int8"`` allocates the int8 serving cache instead: data buffers
    in int8 plus per-(layer, row, head, position) fp32 scales stored with a
    trailing singleton so the same write paths cover them ({"k_q", "k_s",
    "v_q", "v_s", "pos"}). K/V are quantized once at write time
    (ops/quantization.py::quantize_rows_int8) and stream int8 through the
    flash-decode kernel — half the KV bytes per decode step, half the cache
    HBM footprint (so 2× the serving slots fit)."""
    v_head_dim = v_head_dim if v_head_dim is not None else head_dim
    if quant == "int8":
        return {
            "k_q": jnp.zeros((n_layers, batch, n_kv_heads, max_len, head_dim), jnp.int8),
            "k_s": jnp.zeros((n_layers, batch, n_kv_heads, max_len, 1), jnp.float32),
            "v_q": jnp.zeros((n_layers, batch, n_kv_heads, max_len, v_head_dim), jnp.int8),
            "v_s": jnp.zeros((n_layers, batch, n_kv_heads, max_len, 1), jnp.float32),
            "pos": jnp.zeros((), jnp.int32),
        }
    assert quant is None, quant
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

    ``pos`` may be a (b,) VECTOR (continuous-batching serving,
    inference/serving.py): each row writes at its own column via a vmapped
    per-row dynamic_update_slice.

    Quantized caches (``init_kv_cache(quant="int8")``) quantize the new
    rows here and return ``QuantKV`` views instead of arrays; the attention
    router streams them int8 (kernels/flash_decode.py) or dequantizes.
    """
    return write_layer(cache, layer_idx, k_new, v_new, cache["pos"])


def write_layer(cache, layer_idx, k_new, v_new, pos):
    """``update_layer`` with an explicit write position — the hybrid models
    (qwen3_5 / qwen3_next) carry their own pos through mixed KV/GDN layer
    stacks and call this directly."""
    if "k_q" in cache:
        k_q, k_s = quantize_rows_int8(k_new)
        v_q, v_s = quantize_rows_int8(v_new)
        cache = {
            **cache,
            "k_q": write_kv(cache["k_q"], k_q, layer_idx, pos),
            "k_s": write_kv(cache["k_s"], k_s[..., None], layer_idx, pos),
            "v_q": write_kv(cache["v_q"], v_q, layer_idx, pos),
            "v_s": write_kv(cache["v_s"], v_s[..., None], layer_idx, pos),
        }
        return (
            cache,
            QuantKV(cache["k_q"][layer_idx], cache["k_s"][layer_idx, ..., 0]),
            QuantKV(cache["v_q"][layer_idx], cache["v_s"][layer_idx, ..., 0]),
        )
    if getattr(pos, "ndim", 0) >= 1:
        k = cache["k"].at[layer_idx].set(
            _vector_pos_write(cache["k"][layer_idx], k_new, pos)
        )
        v = cache["v"].at[layer_idx].set(
            _vector_pos_write(cache["v"][layer_idx], v_new, pos)
        )
        cache = {**cache, "k": k, "v": v}
        return cache, k[layer_idx], v[layer_idx]
    k = lax.dynamic_update_slice(cache["k"], k_new[None].astype(cache["k"].dtype), (layer_idx, 0, 0, pos, 0))
    v = lax.dynamic_update_slice(cache["v"], v_new[None].astype(cache["v"].dtype), (layer_idx, 0, 0, pos, 0))
    cache = {**cache, "k": k, "v": v}
    return cache, k[layer_idx], v[layer_idx]


def _vector_pos_write(buf_l, new, pos):
    """Per-row-column write of (b, h, s, d) ``new`` into the (b, h, S, d)
    layer buffer at column ``pos[row]``. NOT a scatter: per-row dynamic
    starts lower to TPU scatter ops, which serialize (measured ~1 s per
    32-step decode chunk through a 12-layer cache). Instead a positional
    mask + select — a full-buffer read/modify/write, but that's only a few
    MB/layer of HBM streaming, which the MXU-idle decode step absorbs."""
    b, h, s, d = new.shape
    S = buf_l.shape[2]
    cols = jnp.arange(S, dtype=jnp.int32)[None, :]  # (1, S)
    if s == 1:
        hit = cols == pos[:, None]  # (b, S)
        return jnp.where(hit[:, None, :, None], new.astype(buf_l.dtype), buf_l)
    lo, hi = pos[:, None], pos[:, None] + s
    hit = (cols >= lo) & (cols < hi)  # (b, S)
    # gather each column's source row from `new` (clamped; masked by `hit`)
    src = jnp.clip(cols - lo, 0, s - 1)  # (b, S)
    spread = jnp.take_along_axis(new.astype(buf_l.dtype), src[:, None, :, None], axis=2)
    return jnp.where(hit[:, None, :, None], spread, buf_l)


def write_kv(buf, new, layer_idx, pos):
    """Write (b, h, s, d) ``new`` into the stacked (L, b, h, max_len, d)
    ``buf`` at ``layer_idx``, starting at column ``pos`` — scalar (everyone
    at the same column) or (b,) vector (continuous-batching serving: each
    row at its own column). ``new`` may carry FEWER heads than the buffer
    (models whose layer types differ in KV groups share one max-groups
    buffer, e.g. MiMo's SWA/GA alternation): only the first h head rows
    are written."""
    h = new.shape[1]
    if getattr(pos, "ndim", 0) >= 1:
        return buf.at[layer_idx, :, :h].set(
            _vector_pos_write(buf[layer_idx, :, :h], new, pos)
        )
    return lax.dynamic_update_slice(
        buf, new[None].astype(buf.dtype), (layer_idx, 0, 0, pos, 0)
    )


def cur_token_mask(attn_mask, s, pos0):
    """Slice the (b, max_len) validity mask down to the s columns the
    current call covers, starting at ``pos0`` (scalar or (b,) vector)."""
    if attn_mask is None:
        return None
    if attn_mask.shape[1] == s:
        return attn_mask
    if getattr(pos0, "ndim", 0) >= 1:
        cols = pos0[:, None] + jnp.arange(s)[None, :]
        return jnp.take_along_axis(attn_mask, cols, axis=1)
    return lax.dynamic_slice_in_dim(attn_mask, pos0, s, axis=1)


def advance(cache, seq_len):
    """Advance the filled-position counter by seq_len."""
    return {**cache, "pos": cache["pos"] + seq_len}


def max_len(cache):
    return cache["k_q" if "k_q" in cache else "k"].shape[3]
