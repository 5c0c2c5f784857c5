"""Reinforced Attention Learning (RAL): advantage-weighted attention JSD.

Behavioral parity with the reference (common/reinforced_attention_learning.py:22-205):
head-averaged attention maps, diagonal masked, renormalized + clamped;
JSD(P‖Q) summed over keys; loss = mean over sequences of
advantage·JSD masked-mean over query tokens, scaled by ral_factor.
The old-policy (Q) statistics are gradient-stopped (the reference
precomputes them under no_grad).
"""

import jax
import jax.numpy as jnp


def _prepare_attention_weights(attn_weights):
    """Head-average, zero the diagonal, renormalize, clamp (reference: :72-88)."""
    s = attn_weights.shape[-1]
    diag = jnp.eye(s, dtype=bool)
    attn = jnp.mean(attn_weights.astype(jnp.float32), axis=1)
    attn = jnp.where(diag[None], 0.0, attn)
    attn = attn / jnp.maximum(jnp.sum(attn, axis=-1, keepdims=True), 1e-8)
    return jnp.maximum(attn, 1e-8)


def attention_divergence_loss(policy_attention_weights, old_attention_weights, advantages, loss_mask,
                              *, ral_factor=1.0):
    """L_ral = mean_b[ adv · masked-mean_q JSD(P‖Q) ] · factor."""
    q = jax.lax.stop_gradient(_prepare_attention_weights(old_attention_weights))
    p = _prepare_attention_weights(policy_attention_weights)

    m = (p + q) / 2.0
    log_m = jnp.log(m)
    p_kl = p * (jnp.log(p) - log_m)
    q_kl = q * (jnp.log(q) - log_m)
    jsd = 0.5 * jnp.sum(p_kl + q_kl, axis=-1)  # (b, s)

    lm = loss_mask.astype(jsd.dtype)
    per_seq = jnp.sum(advantages[:, None] * jsd * lm, axis=-1) / jnp.maximum(jnp.sum(lm, axis=-1), 1)
    return jnp.mean(per_seq) * ral_factor
