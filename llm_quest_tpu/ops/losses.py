"""Loss functions.

``cross_entropy`` reproduces torch F.cross_entropy(ignore_index=-100) mean
semantics used throughout the reference engines (engine.py:7-47): targets of
-100 contribute neither to the numerator nor the denominator.
"""

import jax
import jax.numpy as jnp

IGNORE_INDEX = -100


def cross_entropy(logits, targets, *, ignore_index=IGNORE_INDEX):
    """Mean token-level CE over non-ignored targets.

    logits: (..., v); targets: (...,) int with ignore_index for no-loss slots.
    Computed in fp32.
    """
    logits = logits.astype(jnp.float32)
    valid = targets != ignore_index
    safe_targets = jnp.where(valid, targets, 0)
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logprobs, safe_targets[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / denom


def log_probs_of(logits, targets):
    """Per-position log p(target) from (..., v) logits, fp32."""
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(logprobs, targets[..., None], axis=-1)[..., 0]
