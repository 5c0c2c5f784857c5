"""Attention mask construction.

Polarity convention (matches the reference custom-attention convention,
gpt/gpt_attention.py:144,200): boolean masks are True = MASKED OUT.
Padding masks arriving from the data layer are (b, s) bool with True = REAL
token and get inverted when combined (reference: gpt_attention.py:193-195).

TPU-first design note: the reference precomputes (ctx, ctx) triu buffers and
memoizes them process-wide (common/buffers.py). Under XLA that's unnecessary —
iota comparisons fuse into the attention softmax with zero HBM traffic, and
they handle the KV-cache q/k length mismatch naturally via absolute positions,
so masks here are built on the fly.

Masked positions are filled with finfo.min/2, not -inf, so a fully-masked row
(left-padding pad×pad) softmaxes to uniform instead of NaN
(reference: gpt_attention.py:196-200).
"""

import jax.numpy as jnp
import numpy as np


def mask_value(dtype):
    """finfo.min/2 fill value — avoids NaN softmax on fully-masked rows."""
    return jnp.finfo(dtype).min / 2


def causal_mask(q_len, k_len=None, *, q_start=0, window_size=None, attn_mask=None):
    """Build a (b|1, 1, q_len, k_len) bool mask, True = masked.

    Queries occupy absolute positions q_start .. q_start+q_len-1 against keys
    at absolute positions 0 .. k_len-1 — this covers both the no-cache case
    (q_start=0, k_len=q_len) and the static-KV-cache case (q_start=pos,
    k_len=max_len; unwritten cache slots are masked by causality since the
    queries are the newest tokens).

    Args:
        q_len: number of query positions (static).
        k_len: number of key positions (static; default q_len).
        q_start: absolute position of the first query (may be traced — KV pos).
        window_size: optional sliding-window size; keys older than
            q_pos - window_size + 1 are masked (Gemma/MiMo SWA semantics,
            reference: common/buffers.py:71-87).
        attn_mask: optional (b, k_len) bool padding mask, True = REAL token.
    """
    if k_len is None:
        k_len = q_len
    k_pos = jnp.arange(k_len)
    if getattr(q_start, "ndim", 0) >= 1:
        # per-ROW query offsets (continuous-batching serving: each slot sits
        # at its own sequence position) → (b, 1, q_len, k_len)
        q_pos = q_start[:, None] + jnp.arange(q_len)[None, :]  # (b, q)
        masked = k_pos[None, None, :] > q_pos[:, :, None]  # (b, q, k)
        if window_size is not None:
            masked = masked | (k_pos[None, None, :] <= q_pos[:, :, None] - window_size)
        masked = masked[:, None, :, :]
    else:
        q_pos = q_start + jnp.arange(q_len)
        masked = k_pos[None, :] > q_pos[:, None]  # future → masked
        if window_size is not None:
            masked = masked | (k_pos[None, :] <= q_pos[:, None] - window_size)
        masked = masked[None, None, :, :]
    if attn_mask is not None:
        masked = masked | ~attn_mask[:, None, None, :]
    return masked


def bidirectional_mask(attn_mask):
    """(b, k) padding mask → (b, 1, 1, k), True = masked (ViT/vision encoder)."""
    if attn_mask is None:
        return None
    return ~attn_mask[:, None, None, :]


def swa_causal_mask_table(ctx_len, window_size):
    """Materialized (ctx, ctx) sliding-window causal mask — kept for tests and
    parity checks against the reference's buffer variant
    (reference: common/buffers.py:71-87)."""
    causal = np.triu(np.ones((ctx_len, ctx_len), dtype=bool), k=1)
    outside = np.tril(np.ones((ctx_len, ctx_len), dtype=bool), k=-window_size)
    return jnp.asarray(causal | outside)
