"""Number Token Loss — Wasserstein variant (NTL-WAS).

Behavioral parity with the reference (common/num_token_loss.py:16-139):
vocab→number mapping (single digits by default, multi-digit optional),
cached |i−j| digit distance matrix, loss = Σ_j |label − value_j|·p_j over
number-token positions only (leveraging one-hot labels so no CDF needed),
optional importance weighting, 0 when no number tokens in the batch.

Static-shape note: the reference boolean-indexes valid positions; here the
loss is computed for ALL positions and masked — identical mean, XLA-shaped.
"""

import jax
import jax.numpy as jnp
import numpy as np


def build_num_vocab(tokenizer, vocab_size, *, multi_digits=False):
    """(vocab_size,) float map: digit tokens → value, others → NaN
    (reference: :57-80). Works with any tokenizer exposing get_vocab() or
    decode(id)."""
    values = np.full((vocab_size,), np.nan, np.float32)
    if hasattr(tokenizer, "get_vocab"):
        items = tokenizer.get_vocab().items()
    else:
        items = ((tokenizer.decode([i]), i) for i in range(vocab_size))
    for string, token_id in items:
        stripped = string.strip()
        try:
            value = float(stripped)
        except ValueError:
            continue
        single_digit = -1 <= value <= 9 and len(stripped) == 1
        if multi_digits or single_digit:
            if token_id < vocab_size:
                values[token_id] = value
    return jnp.asarray(values)


def num_token_loss(logits, labels, num_nan_vocab, *, importance_mask=None, ignore_index=-100):
    """Mean NTL-WAS over number-token label positions (reference: :83-136).

    logits: (b, s, v); labels: (b, s); num_nan_vocab: (v,) value-or-NaN map.
    """
    num_tokens_mask = ~jnp.isnan(num_nan_vocab)  # (v,)
    num_values = jnp.where(num_tokens_mask, num_nan_vocab, 0.0)

    safe_labels = jnp.where(labels == ignore_index, 0, labels)
    label_values = num_nan_vocab[safe_labels]  # (b, s)
    valid = ~jnp.isnan(label_values) & (labels != ignore_index)
    label_values = jnp.where(valid, label_values, 0.0)

    # softmax over the number sub-vocabulary only (non-number logits → -inf)
    masked_logits = jnp.where(num_tokens_mask[None, None, :], logits.astype(jnp.float32), -jnp.inf)
    number_probs = jax.nn.softmax(masked_logits, axis=-1)  # zeros outside number tokens

    # per-position Wasserstein: Σ_j |label − value_j| · p_j
    distances = jnp.abs(label_values[..., None] - num_values[None, None, :])  # (b, s, v)
    per_pos = jnp.sum(jnp.where(num_tokens_mask[None, None, :], distances * number_probs, 0.0), axis=-1)

    if importance_mask is not None:
        w = importance_mask.astype(per_pos.dtype) * valid
        denom = jnp.sum(w != 0)
        return jnp.where(denom > 0, jnp.sum(per_pos * w) / jnp.maximum(denom, 1), 0.0)
    denom = jnp.sum(valid)
    return jnp.where(denom > 0, jnp.sum(jnp.where(valid, per_pos, 0.0)) / jnp.maximum(denom, 1), 0.0)
