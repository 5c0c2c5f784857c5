"""Decode loops, redesigned for XLA.

The reference implements six python decode loops (generate.py:8-469):
simple/sampled uncached, single-sequence KV-cache, and three batched variants
(right-pad uncached, right-pad cached, left-pad cached). Under XLA the
idiomatic design is ONE batched engine: prefill once, then a ``lax.scan`` over
max_gen single-token steps with static shapes; per-row finished flags swap
sampled tokens for pad (exactly the reference's finished→pad substitution,
generate.py:345-350), the attention mask buffer grows by one valid bit per
step, and the whole thing jit-compiles to a single program.

Semantics preserved from the reference:
- right padding: first-step logits gathered at each row's last REAL token
  (generate.py:338-340); decode position ids continue from mask.sum()
  (generate.py:326-331).
- left padding: prompt position ids are cumsum(mask)-1 with pads pinned to 0
  (generate.py:428-432); logits taken at the last column.
- an EOS token is recorded, its row marked finished, and its mask bit set
  False so later steps don't attend to it (generate.py:348-356).
- the scan always runs max_gen steps (no data-dependent early exit under XLA);
  finished rows emit pad_id, which is cheap relative to the recompile cost a
  dynamic exit would force.

Uncached truncating python loops are kept as ``generate_loop_uncached`` for
parity testing (they recompile per shape — not a production path).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from llm_quest_tpu.ops.sampling import sampling

# whole-generation jit cache: one compiled program per (model, cfg, shapes,
# sampler flags). Without this the prefill + python glue dispatch op-by-op
# (catastrophic over remote-device transports: 300 ms/step vs ~10 ms jitted).
# Unbounded by design: entries are keyed on (id(model-module), cfg, shapes),
# one per compiled program a process actually uses — the same lifetime as
# XLA's own executable cache, so eviction would only force recompiles.
_JIT_CACHE = {}


def _freeze(obj):
    if isinstance(obj, dict):
        return tuple(sorted((k, _freeze(v)) for k, v in obj.items()))
    if isinstance(obj, (list, tuple)):
        return tuple(_freeze(v) for v in obj)
    return obj


def _is_eos(tokens, eos_ids_arr):
    return jnp.any(tokens[..., None] == eos_ids_arr, axis=-1)


def _normalize_eos(eos_ids, pad_id):
    if eos_ids is None:
        return [-1 if pad_id is None else pad_id]
    if not isinstance(eos_ids, (list, tuple)):
        return [eos_ids]
    return list(eos_ids)


def generate_batched_kv_cache(
    model,
    params,
    cfg,
    input_ids,
    attention_mask,
    *,
    max_gen,
    top_k=None,
    top_p=None,
    min_p=None,
    temp=0.0,
    eos_ids=None,
    pad_id=50256,
    rng=None,
    left_pad=False,
    cache_dtype=None,
):
    """Batched KV-cache generation (right- or left-padded prompts).

    The ENTIRE generation (prefill + decode scan) compiles to one program,
    cached per (model, cfg, shapes, sampler flags) — see _JIT_CACHE.

    Args:
        model: model module exposing ``apply`` and ``init_cache``.
        params: model params pytree.
        cfg: model config dict.
        input_ids: (b, prompt_len) int32 token ids (padded).
        attention_mask: (b, prompt_len) bool, True = real token.
        max_gen: number of tokens to generate (static).
        left_pad: prompts are left-padded (position ids from cumsum).
        rng: PRNGKey for stochastic sampling (required if temp > 0).

    Returns:
        dict with:
          "sequences": (b, prompt_len + max_gen) — prompts + generated tokens,
              finished rows padded with pad_id.
          "mask": (b, prompt_len + max_gen) bool validity mask (EOS and pad
              excluded, matching the reference's growing attention mask).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    eos_key = tuple(_normalize_eos(eos_ids, pad_id))
    key = (
        id(model), _freeze(cfg), input_ids.shape, max_gen, top_k, top_p, min_p, temp,
        eos_key, pad_id, left_pad, str(cache_dtype),
    )
    if key not in _JIT_CACHE:
        fn = partial(
            _generate_batched_impl, model, cfg,
            max_gen=max_gen, top_k=top_k, top_p=top_p, min_p=min_p, temp=temp,
            eos_ids=eos_ids, pad_id=pad_id, left_pad=left_pad, cache_dtype=cache_dtype,
        )
        _JIT_CACHE[key] = jax.jit(fn)
    return _JIT_CACHE[key](params, input_ids, attention_mask.astype(bool), rng)


def _generate_batched_impl(
    model, cfg, params, input_ids, attention_mask, rng, *,
    max_gen, top_k, top_p, min_p, temp, eos_ids, pad_id, left_pad, cache_dtype,
):
    b, prompt_len = input_ids.shape
    max_total = prompt_len + max_gen
    eos_arr = jnp.asarray(_normalize_eos(eos_ids, pad_id), dtype=jnp.int32)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    cache = model.init_cache(cfg, b, max_total, dtype=cache_dtype)
    attention_mask = attention_mask.astype(bool)

    # (b, max_total) mask buffer; generated slots start False
    mask_buf = jnp.concatenate(
        [attention_mask, jnp.zeros((b, max_gen), dtype=bool)], axis=-1
    )

    if left_pad:
        prompt_pos = jnp.cumsum(attention_mask, axis=-1) - 1
        prompt_pos = jnp.where(attention_mask, prompt_pos, 0)
        last_real = jnp.full((b,), prompt_len - 1, dtype=jnp.int32)
    else:
        prompt_pos = None  # default arange positions (pads are masked anyway)
        last_real = jnp.sum(attention_mask, axis=-1).astype(jnp.int32) - 1

    next_pos = jnp.sum(attention_mask, axis=-1, keepdims=True).astype(jnp.int32)  # (b, 1)

    # --- prefill ---
    logits_all, cache, _ = model.apply(
        params, cfg, input_ids, attn_mask=mask_buf, cache=cache, position_ids=prompt_pos
    )
    logits = logits_all[jnp.arange(b), last_real, :]  # (b, v)

    finished = jnp.zeros((b,), dtype=bool)
    sample = partial(sampling, top_k=top_k, top_p=top_p, min_p=min_p, temp=temp)

    def step(carry, i):
        cache, mask_buf, finished, logits, next_pos, rng = carry
        rng, sub = jax.random.split(rng)

        sampled = sample(sub, logits)  # (b,)
        next_token = jnp.where(finished, pad_id, sampled)  # (b,)
        finished = finished | _is_eos(next_token, eos_arr)

        # mask bit for the new column: valid only if the row isn't finished
        col = prompt_len + i
        mask_buf = mask_buf.at[:, col].set(~finished)

        logits_step, cache, _ = model.apply(
            params,
            cfg,
            next_token[:, None],
            attn_mask=mask_buf,
            cache=cache,
            position_ids=next_pos,
        )
        next_pos = next_pos + 1
        return (cache, mask_buf, finished, logits_step[:, 0], next_pos, rng), next_token

    (cache, mask_buf, finished, logits, next_pos, rng), gen_tokens = lax.scan(
        step,
        (cache, mask_buf, finished, logits, next_pos, rng),
        jnp.arange(max_gen),
    )
    sequences = jnp.concatenate([input_ids, gen_tokens.T], axis=-1)
    return {"sequences": sequences, "mask": mask_buf}


def generate_kv_cache(
    model,
    params,
    cfg,
    input_ids,
    *,
    max_gen,
    top_k=None,
    top_p=None,
    min_p=None,
    temp=0.0,
    eos_ids=None,
    pad_id=50256,
    rng=None,
):
    """Single-prompt (or uniformly-unpadded batch) KV-cache generation —
    the reference's generate_loop_kv_cache (generate.py:97-148) as a scan."""
    b, prompt_len = input_ids.shape
    mask = jnp.ones((b, prompt_len), dtype=bool)
    return generate_batched_kv_cache(
        model,
        params,
        cfg,
        input_ids,
        mask,
        max_gen=max_gen,
        top_k=top_k,
        top_p=top_p,
        min_p=min_p,
        temp=temp,
        eos_ids=eos_ids,
        pad_id=pad_id,
        rng=rng,
    )


def generate_loop_uncached(
    model,
    params,
    cfg,
    input_ids,
    *,
    max_gen,
    context_length=None,
    top_k=None,
    top_p=None,
    min_p=None,
    temp=0.0,
    eos_ids=None,
    rng=None,
):
    """Uncached python decode loop with context truncation — parity oracle for
    the cached engine (reference: generate.py:29-94). Recompiles per shape;
    not a production path."""
    context_length = context_length or cfg["context_length"]
    eos_set = set(_normalize_eos(eos_ids, None)) if eos_ids is not None else None
    if rng is None:
        rng = jax.random.PRNGKey(0)

    for _ in range(max_gen):
        trunc = input_ids[:, -context_length:]
        logits, _, _ = model.apply(params, cfg, trunc)
        rng, sub = jax.random.split(rng)
        next_token = sampling(sub, logits[:, -1], top_k=top_k, top_p=top_p, min_p=min_p, temp=temp)
        if eos_set is not None and bool(jnp.any(jnp.isin(next_token, jnp.asarray(list(eos_set))))):
            break
        input_ids = jnp.concatenate([input_ids, next_token[:, None]], axis=-1)
    return input_ids
