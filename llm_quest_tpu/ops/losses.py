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


def cross_entropy_fused_head(hidden, head_w, targets, *, ignore_index=IGNORE_INDEX, chunk_size=1024):
    """CE fused with the LM head: scans sequence chunks, computing each
    chunk's logits on the fly and REMATERIALIZING them in the backward pass —
    the full fp32 (T, vocab) tensor never exists. At 152k vocab this is the
    difference between 9.3 GB of logit temps and ~0.3 GB (measured OOM fix
    for Qwen3-Next training at s=2048).

    Per-chunk NLL is the logsumexp form ``lse(logits) - logits[target]``
    rather than materializing log_softmax: the fp32 (c, v) logprob tensor
    never exists either, only two reductions over the bf16 logits. Measured
    v5e-1 at 151,936 vocab (fwd+bwd, 8k tokens): 81.3 → 68.2 ms (112 vs 94
    TFLOP/s), bit-identical loss. chunk_size=1024 beats 512 at every batch
    measured (512 additionally hits a pathological XLA schedule in
    isolation: 5.5 s/call).

    hidden: (b, s, d) pre-head states; head_w: (d, v); targets: (b, s).
    Returns mean CE over non-ignored targets (identical to
    cross_entropy(hidden @ head_w, targets)).
    """
    b, s, d = hidden.shape
    t = b * s
    h2 = hidden.reshape(t, d)
    y2 = targets.reshape(t)
    c = min(chunk_size, t)
    t_pad = -(-t // c) * c
    if t_pad != t:
        h2 = jnp.concatenate([h2, jnp.zeros((t_pad - t, d), h2.dtype)])
        y2 = jnp.concatenate([y2, jnp.full((t_pad - t,), ignore_index, y2.dtype)])

    hc = h2.reshape(t_pad // c, c, d)
    yc = y2.reshape(t_pad // c, c)

    @jax.checkpoint
    def chunk_loss(h_chunk, y_chunk):
        logits = h_chunk @ head_w  # (c, v) — only this chunk, model dtype
        valid = y_chunk != ignore_index
        safe = jnp.where(valid, y_chunk, 0)
        lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32), axis=-1)
        tgt = jnp.take_along_axis(logits, safe[:, None], axis=-1)[:, 0].astype(jnp.float32)
        nll = lse - tgt
        return jnp.sum(jnp.where(valid, nll, 0.0)), jnp.sum(valid)

    def scan_body(carry, xs):
        tot, cnt = carry
        l, n = chunk_loss(*xs)
        return (tot + l, cnt + n), None

    (total, count), _ = jax.lax.scan(scan_body, (0.0, 0), (hc, yc))
    return total / jnp.maximum(count, 1)
