"""Speculative decoding, redesigned for XLA static shapes.

Behavioral parity with the reference (speculative_decoding/spec_decoding_engine.py):

- greedy fast path: one-hot acceptance — accept drafted token i iff the
  target argmax matches; on mismatch the target's choice replaces it (:101-135)
- stochastic path: accept with prob min(1, p/q) on the temperature/top-k/
  top-p-modified distributions; on rejection resample from
  norm(max(0, p−q)); bonus token from the target's γ+1-th distribution when
  all γ accepted (:144-210, :73-98)
- γ drafted tokens per step; EOS stops the loop (:299-368)

TPU redesign (the headline divergence): the reference drafts with a KV cache
but re-runs the target over the FULL sequence uncached every step (:283).
Here both models run cached with FIXED (γ+1)-token windows inside one
``lax.while_loop``:

- a static token buffer + scalar cur_len replace the growing sequence;
- each step feeds [last committed token, γ drafted] at absolute positions
  cur_len−1 …, so rejected tokens need no cache rollback — the next step's
  window simply overwrites the stale K/V slots (positions beyond cur_len are
  causally masked anyway);
- acceptance length n is computed as a cumprod prefix; a fixed (γ+1)-slot
  candidate vector [accepted…, correction|bonus, junk…] is written with one
  dynamic_update_slice and cur_len advances by n+1.

Everything compiles once; no shape depends on the acceptance pattern.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from llm_quest_tpu.ops.sampling import filter_probs


def modified_probs(logits, *, top_k=None, top_p=None, temp=1.0):
    """softmax(logits/temp) filtered by top-k/top-p, renormalized
    (reference: get_modified_distrib :7-41)."""
    logits = logits.astype(jnp.float32)
    if temp > 0.0:
        logits = logits / temp
    probs = jax.nn.softmax(logits, axis=-1)
    if top_p or top_k:
        probs = filter_probs(probs, top_k=top_k, top_p=top_p)
    return probs / jnp.sum(probs, axis=-1, keepdims=True)


def speculative_generate(
    target_model,
    target_params,
    target_cfg,
    draft_model,
    draft_params,
    draft_cfg,
    prompt,
    *,
    max_gen,
    draft_max_gen,
    top_k=None,
    top_p=None,
    temp=0.0,
    eos_id=None,
    rng=None,
):
    """Speculative decoding for a single sequence (b=1), fully jitted.

    Returns dict {"sequences": (1, prompt_len + max_gen) int32 (pad-filled
    past the true end), "num_generated": int32 scalar, "num_steps": int32
    scalar (speculative iterations — for speedup accounting)}.
    """
    gamma = draft_max_gen
    b, prompt_len = prompt.shape
    assert b == 1, "speculative decoding is single-sequence (reference parity)"
    eos = -1 if eos_id is None else eos_id
    if rng is None:
        rng = jax.random.PRNGKey(0)

    max_total = prompt_len + max_gen + gamma + 1  # slack for the fixed window
    buf = jnp.zeros((1, max_total), jnp.int32)
    buf = lax.dynamic_update_slice(buf, prompt.astype(jnp.int32), (0, 0))

    t_cache = target_model.init_cache(target_cfg, 1, max_total)
    d_cache = draft_model.init_cache(draft_cfg, 1, max_total)

    # prefill both models with prompt[:-1]; each step re-feeds the last
    # committed token, so caches always hold the verified prefix
    prefix = prompt[:, :-1]
    if prompt_len > 1:
        _, t_cache, _ = target_model.apply(target_params, target_cfg, prefix, cache=t_cache)
        _, d_cache, _ = draft_model.apply(draft_params, draft_cfg, prefix, cache=d_cache)

    mprobs = partial(modified_probs, top_k=top_k, top_p=top_p, temp=temp)

    def draft_tokens(d_cache, buf, cur_len, rng):
        """Draft γ tokens sequentially with the draft KV cache.
        Returns (drafted (γ,), draft_probs (γ, v), d_cache, rng)."""

        def step(carry, _):
            d_cache, tok, rng = carry
            logits, d_cache, _ = draft_model.apply(draft_params, draft_cfg, tok[None, None], cache=d_cache)
            logits = logits[0, 0]
            probs = mprobs(logits)
            rng, sub = jax.random.split(rng)
            if temp == 0.0:
                nxt = jnp.argmax(logits).astype(jnp.int32)
            else:
                nxt = jax.random.categorical(sub, jnp.log(probs)).astype(jnp.int32)
            return (d_cache, nxt, rng), (nxt, probs)

        last_tok = lax.dynamic_index_in_dim(buf[0], cur_len - 1, keepdims=False)
        (d_cache, _, rng), (drafted, dprobs) = lax.scan(step, (d_cache, last_tok, rng), None, length=gamma)
        return drafted, dprobs, d_cache, rng

    def body(state):
        buf, cur_len, t_cache, d_cache, rng, finished, n_steps = state

        # caches hold exactly the verified prefix [0, cur_len-1)
        t_cache = {**t_cache, "pos": cur_len - 1}
        d_cache = {**d_cache, "pos": cur_len - 1}

        drafted, dprobs, d_cache, rng = draft_tokens(d_cache, buf, cur_len, rng)  # (γ,), (γ, v)

        # target verify over the fixed window [last committed, drafted γ]
        last_tok = lax.dynamic_index_in_dim(buf[0], cur_len - 1, keepdims=False)
        window = jnp.concatenate([last_tok[None], drafted])[None]  # (1, γ+1)
        t_logits, t_cache, _ = target_model.apply(target_params, target_cfg, window, cache=t_cache)
        t_logits = t_logits[0]  # (γ+1, v): row i predicts the token after window[i]

        rng, r_accept, r_corr, r_bonus = jax.random.split(rng, 4)
        if temp == 0.0:
            target_choice = jnp.argmax(t_logits[:gamma], axis=-1).astype(jnp.int32)
            accept = target_choice == drafted
            corrections = target_choice
            bonus = jnp.argmax(t_logits[gamma]).astype(jnp.int32)
        else:
            tprobs = mprobs(t_logits[:gamma])  # (γ, v)
            p_tok = jnp.take_along_axis(tprobs, drafted[:, None], axis=-1)[:, 0]
            q_tok = jnp.take_along_axis(dprobs, drafted[:, None], axis=-1)[:, 0]
            ratio = p_tok / jnp.maximum(q_tok, 1e-20)
            accept = jax.random.uniform(r_accept, (gamma,)) < ratio
            adjusted = jnp.maximum(tprobs - dprobs, 0.0)
            adjusted = adjusted / jnp.maximum(jnp.sum(adjusted, axis=-1, keepdims=True), 1e-20)
            corrections = jax.random.categorical(r_corr, jnp.log(jnp.maximum(adjusted, 1e-20)), axis=-1).astype(
                jnp.int32
            )
            bonus = jax.random.categorical(r_bonus, jnp.log(mprobs(t_logits[gamma]))).astype(jnp.int32)

        # prefix acceptance length n, candidate vector of γ+1 slots
        prefix_ok = jnp.cumprod(accept.astype(jnp.int32))
        n = jnp.sum(prefix_ok)  # 0..γ
        idx = jnp.arange(gamma + 1)
        cand = jnp.where(
            idx < n,
            jnp.concatenate([drafted, jnp.zeros((1,), jnp.int32)])[idx],
            jnp.where(
                idx == n,
                jnp.where(n == gamma, bonus, jnp.concatenate([corrections, jnp.zeros((1,), jnp.int32)])[idx]),
                0,
            ),
        )
        num_new = n + 1

        # EOS truncation: stop at (and include) the first EOS among committed
        is_eos = (cand == eos) & (idx < num_new)
        any_eos = jnp.any(is_eos)
        eos_pos = jnp.argmax(is_eos)
        num_new = jnp.where(any_eos, eos_pos + 1, num_new)
        # cap at max_gen remaining
        remaining = prompt_len + max_gen - cur_len
        num_new = jnp.minimum(num_new, remaining)
        finished = finished | any_eos

        buf = lax.dynamic_update_slice(buf, cand[None], (0, cur_len))
        cur_len = cur_len + num_new
        return buf, cur_len, t_cache, d_cache, rng, finished, n_steps + 1

    def cond(state):
        _, cur_len, _, _, _, finished, _ = state
        return (cur_len < prompt_len + max_gen) & ~finished

    state = (buf, jnp.asarray(prompt_len, jnp.int32), t_cache, d_cache, rng, jnp.asarray(False), jnp.asarray(0))
    buf, cur_len, _, _, _, _, n_steps = lax.while_loop(cond, body, state)

    return {
        "sequences": buf[:, : prompt_len + max_gen],
        "num_generated": cur_len - prompt_len,
        "num_steps": n_steps,
    }
