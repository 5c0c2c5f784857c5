"""QK-Clip (Moonshot MuonClip): post-optimizer-step rescale of Q/K weights.

Behavioral parity with the reference (common/qk_clip.py):
- naive per-layer variant (:23-77): η = clamp(τ/max_logit, max 1); all heads
  of a flagged layer scaled — W_q ·= η^α, W_k ·= η^(1−α)
- per-head GQA-aware QKClip (:80-207): γ per QUERY head; K heads shared by a
  group take the reduced γ (min/max/mean — min default, the only reduction
  guaranteeing max logit ≤ τ); Q head columns scaled by its own γ^α, K head
  columns by the group-reduced γ^(1−α)

Functional form: pure transforms of (wq, wk) weight arrays given the observed
max attention logits — callers fold them into params after the optimizer
step, mirroring the reference's "applied after optimizer.step()" contract.
``max_logits_from_scores`` is the collection helper models use in aux.
"""

import jax.numpy as jnp


def max_logits_from_scores(scores):
    """Per-head max attention logit from (b, h, q, k) PRE-softmax scores."""
    return jnp.max(scores, axis=(0, 2, 3))


def qk_clip_naive(wq, wk, max_logit, clip_threshold, *, alpha=0.5):
    """Layer-level clip (reference: :23-77). max_logit: scalar for the layer."""
    eta = jnp.minimum(clip_threshold / max_logit, 1.0)
    return wq * eta**alpha, wk * eta ** (1 - alpha)


def qk_clip_per_head(wq, wk, max_logits_per_head, clip_threshold, *, num_heads, num_kv_heads=None,
                     alpha=0.5, reduction="min"):
    """Per-head GQA-aware clip (reference: :80-207).

    wq: (d_in, num_heads·head_dim); wk: (d_in, num_kv_heads·head_dim) —
    column-blocks are heads. max_logits_per_head: (num_heads,).
    """
    num_kv_heads = num_kv_heads or num_heads
    gamma = jnp.minimum(clip_threshold / max_logits_per_head, 1.0)  # (num_heads,)

    head_dim = wq.shape[1] // num_heads
    q_scale = jnp.repeat(gamma**alpha, head_dim)  # (num_heads·head_dim,)
    new_wq = wq * q_scale[None, :]

    group = num_heads // num_kv_heads
    gamma_grouped = gamma.reshape(num_kv_heads, group)
    if reduction == "min":
        gamma_kv = jnp.min(gamma_grouped, axis=1)
    elif reduction == "max":
        gamma_kv = jnp.max(gamma_grouped, axis=1)
    elif reduction == "mean":
        gamma_kv = jnp.mean(gamma_grouped, axis=1)
    else:
        raise ValueError(f"Unknown reduction: {reduction}")

    k_head_dim = wk.shape[1] // num_kv_heads
    k_scale = jnp.repeat(gamma_kv ** (1 - alpha), k_head_dim)
    new_wk = wk * k_scale[None, :]
    return new_wq, new_wk


def apply_qk_clip(params, max_logits_per_layer, clip_threshold, *, num_heads, num_kv_heads=None,
                  alpha=0.5, reduction="min", per_head=True):
    """Fold QK-clip into a blocks-style params tree (blocks[i].att.wq/wk).

    max_logits_per_layer: list of (num_heads,) arrays (per-head) or scalars
    (naive). Returns the updated params tree (pure)."""
    new_blocks = []
    for block, ml in zip(params["blocks"], max_logits_per_layer):
        att = block["att"]
        if per_head:
            wq, wk = qk_clip_per_head(
                att["wq"]["w"], att["wk"]["w"], ml, clip_threshold,
                num_heads=num_heads, num_kv_heads=num_kv_heads, alpha=alpha, reduction=reduction,
            )
        else:
            wq, wk = qk_clip_naive(att["wq"]["w"], att["wk"]["w"], ml, clip_threshold, alpha=alpha)
        att = {**att, "wq": {**att["wq"], "w": wq}, "wk": {**att["wk"], "w": wk}}
        new_blocks.append({**block, "att": att})
    return {**params, "blocks": new_blocks}


def magnitude_qk_clip(wq, wk, max_logits_per_head, clip_threshold, *, num_heads, alpha=0.5):
    """Magnitude variant (reference: :209-272): clips on |max logit| (handles
    negative logit blow-ups too); MHA-only (equal q/k head counts).

    wq/wk: (d_in, num_heads·head_dim). max_logits_per_head: (num_heads,)
    SIGNED per-head extreme logits (use amax of |scores| upstream).
    """
    gamma = jnp.minimum(clip_threshold / jnp.abs(max_logits_per_head), 1.0)
    head_dim = wq.shape[1] // num_heads
    q_scale = jnp.repeat(gamma**alpha, head_dim)
    k_scale = jnp.repeat(gamma ** (1 - alpha), head_dim)
    return wq * q_scale[None, :], wk * k_scale[None, :]
