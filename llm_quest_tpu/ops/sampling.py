"""Logit samplers: temperature, top-k, top-p (nucleus), min-p.

Filtering semantics mirror the reference (generate.py:472-608): temp=0 →
greedy argmax; otherwise softmax(logits/temp) is filtered, renormalized, and
sampled. top_p and min_p are mutually exclusive; top_k composes with top_p
(pre-filter) and with min_p (as min_tokens_to_keep).

XLA redesign notes:
- filters are threshold/sort based (no data-dependent shapes): top-k keeps
  everything ≥ the k-th largest prob (tie behavior differs from torch's
  scatter at measure-zero ties; parity is distribution-level).
- top-p keeps the HF "pivot shift" behavior: the token that crosses the
  cumulative threshold stays in the set (reference: generate.py:565-570).
- sampling uses jax.random.categorical on log-probs (zeroed entries → -inf).

All fns accept logits/probs of shape (..., vocab) so the speculative-decoding
(b, γ, v) batch works unchanged (reference: generate.py:552-556).
"""

import jax
import jax.numpy as jnp


def greedy_argmax(logits):
    """Last-axis argmax via a lane-chunked two-stage reduction.

    XLA lowers ``jnp.argmax`` over a large trailing axis to a variadic
    (value, index) reduction that measures ~76× the logits-read floor on
    TPU at (32, 248320) — 1.48 ms for a 15.9 MB read. Stage 1 is a plain
    128-lane max (bandwidth-bound); the two remaining argmaxes run on
    vocab/128 and 128 elements. First-occurrence tie semantics are
    preserved exactly (earliest group wins, then earliest lane), so greedy
    decode parity with ``jnp.argmax`` — and the torch reference — holds.
    """
    *lead, v = logits.shape
    g = 128
    x = logits.reshape(-1, v)
    pad = (-v) % g
    if pad:
        fill = jnp.finfo(logits.dtype).min if jnp.issubdtype(logits.dtype, jnp.floating) else jnp.iinfo(logits.dtype).min
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=fill)
    x = x.reshape(x.shape[0], -1, g)
    gmax = jnp.max(x, axis=2)  # (n, groups) — the only full-width pass
    gi = jnp.argmax(gmax, axis=1)  # (n,)
    grp = jnp.take_along_axis(x, gi[:, None, None], axis=1)[:, 0]  # (n, g)
    li = jnp.argmax(grp, axis=1)
    return (gi * g + li).astype(jnp.int32).reshape(lead)


def top_k_filter(probs, k):
    """Zero out everything below the k-th largest probability
    (reference: generate.py:517-536)."""
    kth = jax.lax.top_k(probs, k)[0][..., -1:]
    return jnp.where(probs < kth, 0.0, probs)


def top_p_filter(probs, p, top_k=None):
    """Nucleus filtering with pivot-keep shift (reference: generate.py:539-585)."""
    if top_k:
        probs = top_k_filter(probs, top_k)

    sort_idx = jnp.argsort(-probs, axis=-1)
    sorted_probs = jnp.take_along_axis(probs, sort_idx, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    over = cum > p
    # shift right: the pivot token (first to cross p) is kept; slot 0 always kept
    over = jnp.concatenate([jnp.zeros_like(over[..., :1]), over[..., :-1]], axis=-1)
    sorted_filtered = jnp.where(over, 0.0, sorted_probs)

    inv_idx = jnp.argsort(sort_idx, axis=-1)
    return jnp.take_along_axis(sorted_filtered, inv_idx, axis=-1)


def min_p_filter(probs, min_p, min_tokens_to_keep=1):
    """Dynamic threshold scaled by p_max; always keeps the top
    min_tokens_to_keep tokens (reference: generate.py:588-608)."""
    p_max = jnp.max(probs, axis=-1, keepdims=True)
    scaled_min_p = min_p * p_max
    kth = jax.lax.top_k(probs, min_tokens_to_keep)[0][..., -1:]
    remove = (probs < scaled_min_p) & (probs < kth)
    return jnp.where(remove, 0.0, probs)


def filter_probs(probs, *, top_k=None, top_p=None, min_p=None):
    """Apply the configured filters to a probability tensor (..., v)."""
    assert top_p is None or min_p is None, "Cannot use top_p and min_p together"
    if min_p:
        probs = min_p_filter(probs, min_p, min_tokens_to_keep=1 if top_k is None else top_k)
    elif top_p:
        probs = top_p_filter(probs, top_p, top_k)
    elif top_k:
        probs = top_k_filter(probs, top_k)
    return probs / jnp.sum(probs, axis=-1, keepdims=True)


def sampling(rng, logits, *, top_k=None, top_p=None, min_p=None, temp=0.0):
    """Sample next-token ids from (..., v) logits → (...,) int32.

    temp == 0.0 → greedy argmax (reference: generate.py:494-496). The
    temperature must be a static python float (it selects the code path).
    """
    if temp == 0.0:
        return greedy_argmax(logits)

    probs = jax.nn.softmax(logits.astype(jnp.float32) / temp, axis=-1)
    probs = filter_probs(probs, top_k=top_k, top_p=top_p, min_p=min_p)
    # categorical over log-probs: zeroed tokens → -inf → never sampled
    return jax.random.categorical(rng, jnp.log(probs), axis=-1).astype(jnp.int32)


def filter_probs_per_row(probs, *, top_k, top_p, min_p=None, head=1024, exact_head=False):
    """``filter_probs`` with PER-ROW knob arrays (b,), applied over
    (b, ..., v) probabilities (extra middle axes share the row's knobs).
    Disable encodings: top_k 0, top_p >= 1, min_p 0. Matches filter_probs'
    combination semantics: the hard top-k cut is off under min-p (top_k
    becomes min_tokens_to_keep), top-p keeps the pivot token.

    Implemented THRESHOLD-style over a ``head = top_k(H)`` selection
    instead of a full-vocab argsort: every filter reduces to a per-row
    scalar prob threshold derived from the sorted head, then one
    elementwise compare over the vocab. The previous full argsort ran
    EVERY decode step of a per-request-sampling serving pool and measured
    ~300 ms/step at (32, 248320) — 30× the whole model forward; top_k(H)
    is a selection, not a sort. Exactness: identical keep-set whenever the
    nucleus/top-k fits in the head (always, for peaked real-model logits
    with H=4096); a row whose top-p nucleus exceeds the head mass falls
    back to keeping everything (documented, measured only on near-uniform
    random-weight logits). Tie handling is threshold-based (all tokens
    tying the pivot/kth prob are kept — same measure-zero divergence class
    as ``top_k_filter``'s note)."""
    v = probs.shape[-1]
    h = min(head, v)
    mid = (1,) * (probs.ndim - 2)
    col = lambda a: a.reshape(a.shape[:1] + mid + (1,))  # noqa: E731
    if min_p is None:
        min_p = jnp.zeros(probs.shape[:1], jnp.float32)

    if exact_head or h == v or jax.default_backend() != "tpu":
        # exact selection: CPU (the test oracle) and the opt-in knob
        head_vals = jax.lax.top_k(probs, h)[0]  # (b, ..., h) descending
    else:
        # TPU hardware-accelerated approximate top-k (PartialReduce, sorted
        # output): exact top_k on TPU is itself a near-full sort — measured
        # 9 ms vs 1.6 ms at (32, 248320); the top-64 exact values land in
        # the approx-1024 head with measured recall 1.0, so the thresholds
        # the filters derive are exact in practice
        head_vals = jax.lax.approx_max_k(probs, h, recall_target=0.99)[0]

    def gather_head(pos):  # per-row position (b,) -> head value (b, ..., 1)
        p_ = jnp.broadcast_to(col(pos.astype(jnp.int32)), probs.shape[:-1] + (1,))
        return jnp.take_along_axis(head_vals, p_, axis=-1)

    kth = gather_head(jnp.clip(top_k - 1, 0, h - 1))
    keep = jnp.where(col((top_k > 0) & (min_p <= 0)), probs >= kth, True)

    cum = jnp.cumsum(head_vals, axis=-1)
    # pivot = first sorted position whose cumulative crosses p (kept);
    # number kept = count of positions with shifted-cum <= p
    over = jnp.concatenate([jnp.zeros_like(cum[..., :1]), cum[..., :-1]], axis=-1) > col(top_p)
    n_keep = jnp.sum(~over, axis=-1, keepdims=True)  # (b, ..., 1) >= 1
    thr_p = jnp.take_along_axis(head_vals, n_keep - 1, axis=-1)
    # nucleus wider than the head -> keep everything (threshold 0)
    thr_p = jnp.where(cum[..., -1:] > col(top_p), thr_p, 0.0)
    keep &= jnp.where(col(top_p < 1.0), probs >= thr_p, True)

    p_max = head_vals[..., :1]
    mtk_th = gather_head(jnp.clip(jnp.maximum(top_k, 1) - 1, 0, h - 1))
    keep_m = (probs >= col(min_p) * p_max) | (probs >= mtk_th)
    keep &= jnp.where(col(min_p > 0), keep_m, True)

    probs = jnp.where(keep, probs, 0.0)
    return probs / jnp.sum(probs, axis=-1, keepdims=True)


def sampling_per_row(rng, logits, *, temp, top_k, top_p, min_p):
    """Per-ROW sampling: every argument is a (b,) array, so one compiled
    program serves requests with different sampler settings (continuous-
    batching serving). Disable encodings: temp 0 → greedy row (argmax of the
    raw logits), top_k 0 → no top-k, top_p >= 1 → no nucleus, min_p 0 → no
    min-p. Semantics per row match ``sampling``/``filter_probs`` exactly
    (same pivot-keep top-p shift, same min_tokens_to_keep = max(top_k, 1)
    under min-p); with uniform rows the draws are bit-identical to the
    scalar sampler (same categorical call)."""
    temp = temp.astype(jnp.float32)
    t_eff = jnp.where(temp > 0, temp, 1.0)[:, None]
    probs = jax.nn.softmax(logits.astype(jnp.float32) / t_eff, axis=-1)
    probs = filter_probs_per_row(probs, top_k=top_k, top_p=top_p, min_p=min_p)
    sampled = jax.random.categorical(rng, jnp.log(probs), axis=-1).astype(jnp.int32)
    greedy = greedy_argmax(logits)
    return jnp.where(temp > 0, sampled, greedy)
