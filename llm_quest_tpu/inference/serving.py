"""Continuous-batching serving engine (TPU-native, beyond the reference).

The batched decode engine (inference/generate.py) is batch-synchronous: a
batch enters together and occupies the chip until its LONGEST sequence
finishes — short requests pay head-of-line blocking, and no new request can
enter mid-flight. Production serving wants iteration-level scheduling
(Orca/vLLM style): a fixed pool of SLOTS, each slot one in-flight sequence;
finished slots retire and are refilled immediately while the others keep
decoding.

TPU redesign (everything static-shape, three compiled programs total):
- **Slot pool**: the model's ordinary static cache pre-allocated for
  ``n_slots`` rows, with the column pointer ``cache["pos"]`` promoted to a
  per-row VECTOR (inference/cache.py handles vector pos via a vmapped
  per-row dynamic_update_slice; ops/masks.py::causal_mask takes the vector
  as per-row ``q_start``). Positions-for-RoPE are tracked separately per
  row; after admission the column pointer rewinds to the REAL prompt
  length, so decode overwrites the masked bucket-pad columns and cache
  columns stay CONTIGUOUS with tokens (same attended set — per-request
  tokens are BIT-IDENTICAL to ``generate_batched_kv_cache`` under greedy
  decoding — but max_len only needs prompt+gen, and window-rewrite schemes
  like speculative decoding can re-feed the last committed token).
- **Admit** (one jit per prompt bucket): prefill the new prompt on a fresh
  b=1 cache, then insert the row (cache row, mask row, last-token logits,
  counters) into the pool with dynamic_update_slice — no other slot is
  touched, no recompile.
- **Decode chunk** (one jit): a ``lax.while_loop`` of up to ``decode_chunk``
  single-token steps advancing ALL slots; per-row finished flags swap
  samples for pad and stop mask-bit growth, and the loop EXITS EARLY the
  step every slot is finished — the drain tail stops burning all-pad
  forwards instead of running the chunk out. The chunk granularity
  amortizes the host round-trip (the scheduler only intervenes every
  ``decode_chunk`` tokens — over a tunneled TPU that RTT is ~35 ms, so
  chunking is what makes the scheduler affordable), while the early exit
  keeps large chunks cheap when the pool empties mid-chunk.
- **Retire/refill** on the host: read the chunk's tokens + finished flags,
  close requests (EOS or their max_gen), admit queued prompts into the
  freed slots.

Nothing model-specific lives here: any model exposing
``apply(params, cfg, ids, attn_mask=, cache=, position_ids=)`` +
``init_cache`` with the standard stacked-KV layout serves through this
engine unchanged (int8-quantized checkpoints included — the dispatch is in
ops/linear.py).

Multi-chip serving: pass ``mesh=`` (+ ``param_rules=`` to TP-shard the
params in place). Slots shard over "data" (independent sequences — free
parallelism), cache/state head axes over "model" to match the column-
parallel K/V projections, and the jitted admit/decode programs pin their
output shardings so the pool stays distributed across scheduler
iterations (``pool_state_shardings``). The Pallas kernels survive the
mesh: attention routes head-sharded through shard_map
(ops/attention.py "head_shard" — each chip streams its resident kv
heads, zero collectives), so the int8 flash-decode path serves
multi-chip too; tokens are bit-identical to the single-device engine
(tests/test_serving.py::test_serving_sharded_on_mesh,
::test_serving_sharded_int8_kv_flash_decode_on_mesh).

Speculative serving: pass ``draft_model/draft_params/draft_cfg`` (+
``gamma``) — every scheduler chunk becomes ``decode_chunk`` DRAFT+VERIFY
windows advancing all slots in parallel: γ autoregressive draft steps, ONE
target forward over [last committed, γ drafted] (re-fed last token —
contiguous columns make the rewrite exact), greedy longest-prefix
acceptance, per-row variable advance over the same vector-pos pool.
LOSSLESS: greedy tokens equal the plain engine's exactly
(tests/test_serving.py::test_serving_speculative_lossless); a perfect
draft commits γ+1 tokens per window
(::test_serving_speculative_self_draft_accepts_everything).

Multi-LoRA serving: stacked adapters in the params tree
(ops/lora.py::stack_adapters) are auto-detected; ``submit(adapter=j)``
routes each request through its adapter via a per-row index gather inside
the SAME compiled programs, adapters mix freely in one pool, and
``register_prefix(adapter=j)`` bakes an adapter into a stored prefix row.
Per-request sampling (``per_request_sampling=True``): submit() overrides
temp/top-k/top-p/min-p per request (ops/sampling.py::sampling_per_row) —
greedy and stochastic traffic share one decode program. Per-token
logprobs (``return_logprobs=True``): raw model log-softmax of committed
tokens rides the same packed transfer; ``request_logprobs(rid)``.
Explicit expert parallelism: ``cfg["expert_parallel"]`` dispatches MoE
tokens to expert shards via all-to-all inside admit and decode (waves pad
to the device multiple).

Reference: the closest thing upstream is the left-pad batched loop
(generate.py:360-469), which cannot admit mid-flight, and the b=1
speculative engine (speculative_decoding/spec_decoding_engine.py) this
vectorizes; the combination is a TPU-first addition.
"""

import time
from collections import deque
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from llm_quest_tpu.inference.generate import _freeze, _is_eos, _normalize_eos
from llm_quest_tpu.ops.sampling import greedy_argmax, sampling

DEFAULT_BUCKETS = (32, 64, 128, 256, 512)


def pool_state_shardings(state, mesh, n_slots):
    """NamedSharding pytree for the engine pool state on a ("data","model")
    mesh: the SLOT axis of every leaf shards over "data" (slots are
    independent sequences — pure DP), and the head axis of the stacked
    cache leaves (axis after the slot axis on >=4-D leaves: KV heads, GDN
    value heads) shards over "model", matching how column-parallel wk/wv
    leave the per-head K/V sharded under the TP param rules.

    The slot axis is axis 1 on cache leaves (layer-stacked: (L, B, H, S, d))
    and axis 0 on the flat per-slot buffers (mask_buf, seqpos, ...) — looked
    up positionally, NOT by "first axis of size n_slots", so a layer count
    that happens to equal n_slots cannot mis-shard."""
    data, model = mesh.shape["data"], mesh.shape["model"]

    def spec_for(leaf):
        shape = getattr(leaf, "shape", ())
        if not shape:
            return P()
        spec = [None] * len(shape)
        if len(shape) >= 3 and shape[1] == n_slots:
            slot_ax = 1
        elif shape[0] == n_slots:
            slot_ax = 0
        else:
            return P()
        if n_slots % data == 0 and data > 1:
            spec[slot_ax] = "data"
        head_ax = slot_ax + 1
        if len(shape) >= 4 and head_ax < len(shape) - 1 and model > 1 and shape[head_ax] % model == 0:
            spec[head_ax] = "model"
        return P(*spec)

    return jax.tree.map(lambda x: NamedSharding(mesh, spec_for(x)), state)


def _insert_rows(big, small, slots, n_slots, k):
    """Scatter a k-row leaf into the n_slots-row pool leaf at the row
    indices ``slots`` (k,), along the batch axis (the axis where big has
    n_slots and small has k, other dims equal); scalar → vector for
    ``pos``."""
    if getattr(small, "ndim", 0) < getattr(big, "ndim", 0):
        return big.at[slots].set(small.astype(big.dtype))  # () → (B,)
    axis = next(
        i
        for i, (a, b) in enumerate(zip(big.shape, small.shape))
        if a == n_slots
        and b == k
        and big.shape[:i] == small.shape[:i]
        and big.shape[i + 1 :] == small.shape[i + 1 :]
    )
    idx = (slice(None),) * axis + (slots,)
    return big.at[idx].set(small.astype(big.dtype))


@dataclass
class _Request:
    rid: int
    ids: np.ndarray  # (prompt_len,) int32
    max_gen: int
    tokens: list = field(default_factory=list)
    logprobs: list = field(default_factory=list)  # per committed token (when enabled)
    done: bool = False
    prefix: int | None = None  # registered prefix id (register_prefix)
    pixels: np.ndarray | None = None  # multimodal: image pixels for this prompt
    pixels_dev: object = None  # device-resident copy (async-uploaded at submit)
    adapter: int | None = None  # multi-LoRA: stacked adapter id for this request
    sample: np.ndarray | None = None  # per-request [temp, top_k, top_p, min_p] override
    # observability timestamps (time.monotonic): queued / admitted to a slot /
    # first token credited / retired — the host stamps them, never the device
    t_submit: float = 0.0
    t_admit: float = 0.0
    t_first: float = 0.0
    t_done: float = 0.0


# jit wrappers shared across engine instances (same lifetime rationale as
# generate._JIT_CACHE): keyed on (model, cfg, pool geometry, sampler flags)
_SERVE_JIT_CACHE = {}


def _maybe_pin_group_cache(cfg, grp_cache, k):
    """Pin the admit-wave scratch cache to the pool's sharding convention
    (rows→"data", heads→"model") on mesh engines. Without this, GSPMD is
    free to pick a conflicting layout for the group cache (e.g. rows over
    ALL devices, propagated from the expert-parallel token sharding) and
    then 'involuntarily fully rematerializes' — replicates + repartitions —
    every per-layer cache write against the head-sharded attention reads.
    The multichip dryrun fails on that warning (__graft_entry__)."""
    ms = cfg.get("head_shard") or cfg.get("expert_parallel")
    if ms is None:
        return grp_cache
    return jax.tree.map(
        lax.with_sharding_constraint,
        grp_cache, pool_state_shardings(grp_cache, ms["mesh"], k),
    )


def _admit_impl(model, _frozen, cfg, n_slots, max_len, cache_dtype,
                params, state, prompts, pmasks, slots, budgets):
    """Admit k requests in ONE program: prefill them as a b=k batch on a
    fresh cache, then scatter the k rows into the pool at ``slots``.
    Batching admissions is what keeps the scheduler viable over a
    high-RTT host link (one dispatch per wave, not per request)."""
    k, lb = prompts.shape
    grp_cache = _maybe_pin_group_cache(
        cfg, model.init_cache(cfg, k, max_len, dtype=cache_dtype), k
    )
    grp_mask = jnp.zeros((k, max_len), bool).at[:, :lb].set(pmasks)
    logits_all, grp_cache, _ = model.apply(
        params, cfg, prompts, attn_mask=grp_mask, cache=grp_cache
    )
    grp_cache = _maybe_pin_group_cache(cfg, grp_cache, k)
    real_len = jnp.sum(pmasks, axis=1).astype(jnp.int32)  # (k,)
    logits = logits_all[jnp.arange(k), real_len - 1]  # (k, v)
    # per-row column pointer = REAL length, not the bucket: decode overwrites
    # the masked bucket-pad columns, so cache columns stay contiguous with
    # tokens (same attended set — bit-identical outputs — but max_len only
    # needs real_len+gen, and window-rewrite schemes like speculative
    # decoding can re-feed the last committed token at pos-1)
    grp_cache = {**grp_cache, "pos": real_len}

    cache = jax.tree.map(
        lambda big, small: _insert_rows(big, small, slots, n_slots, k),
        state["cache"], grp_cache,
    )
    return {
        "cache": cache,
        "mask_buf": state["mask_buf"].at[slots].set(grp_mask),
        "last_logits": state["last_logits"].at[slots].set(logits.astype(jnp.float32)),
        "seqpos": state["seqpos"].at[slots].set(real_len),
        "finished": state["finished"].at[slots].set(False),
        "budget": state["budget"].at[slots].set(budgets),
        "rng": state["rng"],
    }


def _prefix_impl(model, _frozen, cfg, max_len, cache_dtype, plen,
                 params, ids):
    """Prefill ONE shared prefix (system prompt) on a fresh b=1 cache row.
    ``plen`` is STATIC (the host registered the prefix), so the stored row's
    ``pos`` is pinned to the REAL length — suffix admits write from column
    ``plen``, overwriting the bucket-pad garbage, and cache columns stay
    aligned with RoPE positions exactly."""
    cache = model.init_cache(cfg, 1, max_len, dtype=cache_dtype)
    mask = jnp.zeros((1, max_len), bool).at[:, :plen].set(True)  # bucket pads stay invalid
    _, cache, _ = model.apply(params, cfg, ids, attn_mask=mask, cache=cache)
    cache["pos"] = jnp.asarray(plen, jnp.int32)
    return cache


def _admit_prefix_impl(model, _frozen, cfg, n_slots, max_len, cache_dtype, plen,
                       params, state, pcache, prompts, pmasks, slots, budgets):
    """Admit k requests that SHARE a registered prefix: broadcast the prefix
    cache row into a b=k group cache (one HBM copy per admit, no recompute
    of the prefix forward), prefill only the suffixes at q_start=plen, then
    scatter the rows into the pool. The models derive positions and causal
    masking from cache["pos"]=plen, so suffix token i gets RoPE position
    plen+i and sees prefix columns [0, plen) — identical numerics to
    prefilling prefix+suffix in one shot."""
    k, lb = prompts.shape

    def bcast(x):
        if getattr(x, "ndim", 0) >= 3 and x.shape[1] == 1:
            return jnp.broadcast_to(x, x.shape[:1] + (k,) + x.shape[2:])
        return x

    grp_cache = jax.tree.map(bcast, pcache)  # "pos" stays the scalar plen
    grp_mask = (
        jnp.zeros((k, max_len), bool)
        .at[:, :plen].set(True)
        .at[:, plen : plen + lb].set(pmasks)
    )
    logits_all, grp_cache, _ = model.apply(
        params, cfg, prompts, attn_mask=grp_mask, cache=grp_cache
    )
    real_len = jnp.sum(pmasks, axis=1).astype(jnp.int32)  # (k,) suffix tokens
    logits = logits_all[jnp.arange(k), real_len - 1]
    grp_cache = {**grp_cache, "pos": plen + real_len}  # contiguous columns

    cache = jax.tree.map(
        lambda big, small: _insert_rows(big, small, slots, n_slots, k),
        state["cache"], grp_cache,
    )
    return {
        "cache": cache,
        "mask_buf": state["mask_buf"].at[slots].set(grp_mask),
        "last_logits": state["last_logits"].at[slots].set(logits.astype(jnp.float32)),
        "seqpos": state["seqpos"].at[slots].set(plen + real_len),
        "finished": state["finished"].at[slots].set(False),
        "budget": state["budget"].at[slots].set(budgets),
        "rng": state["rng"],
    }


def _admit_vlm_impl(model, _frozen, cfg, n_slots, max_len, cache_dtype,
                    pixel_transform,
                    params, state, prompts, pmasks, pixels, prompt_pos, next_pos0,
                    slots, budgets):
    """Admit k MULTIMODAL requests: encode each image ONCE inside the admit
    program (the reference re-encodes per decode step,
    qwen3_5_generate_multimodal.py:107-123), fuse embeddings at the prompt's
    image placeholders, prefill with host-computed 3-D MRoPE positions, then
    scatter rows into the pool. Decode continues on seqpos = next_pos0 (the
    max 3-D position + 1, NOT the text length — MRoPE counts the 2-D image
    grid), which apply_text broadcasts back to T=H=W."""
    k, lb = prompts.shape
    if pixel_transform is not None:
        # on-device preprocessing (e.g. uint8 -> normalized bf16): the wire
        # carries 1/4 the bytes and the convert fuses into the encode
        pixels = pixel_transform(pixels)
    grp_cache = model.init_cache(cfg, k, max_len, dtype=cache_dtype)
    grp_mask = jnp.zeros((k, max_len), bool).at[:, :lb].set(pmasks)
    logits_all, grp_cache, _ = model.apply(
        params, cfg, prompts, image_pixels=pixels, attn_mask=grp_mask,
        cache=grp_cache, position_ids=prompt_pos,
    )
    real_len = jnp.sum(pmasks, axis=1).astype(jnp.int32)
    logits = logits_all[jnp.arange(k), real_len - 1]
    grp_cache = {**grp_cache, "pos": real_len}  # contiguous columns

    cache = jax.tree.map(
        lambda big, small: _insert_rows(big, small, slots, n_slots, k),
        state["cache"], grp_cache,
    )
    return {
        "cache": cache,
        "mask_buf": state["mask_buf"].at[slots].set(grp_mask),
        "last_logits": state["last_logits"].at[slots].set(logits.astype(jnp.float32)),
        "seqpos": state["seqpos"].at[slots].set(next_pos0),
        "finished": state["finished"].at[slots].set(False),
        "budget": state["budget"].at[slots].set(budgets),
        "rng": state["rng"],
    }


def _admit_vlm_prefix_impl(model, _frozen, cfg, n_slots, max_len, cache_dtype,
                           pixel_transform, plen,
                           params, state, pcache, prompts, pmasks, pixels, prompt_pos,
                           next_pos0, slots, budgets):
    """_admit_vlm_impl on top of a registered TEXT prefix: the broadcast
    prefix row seeds the group cache and the image-bearing suffix prefills
    at q_start=plen. The host passes suffix MRoPE positions offset by plen —
    exact because a pure-text prefix contributes exactly plen to the global
    position cumsum (compute_3d_position_ids is translation-invariant there;
    register_prefix rejects prefixes containing image placeholders)."""
    k, lb = prompts.shape
    if pixel_transform is not None:
        pixels = pixel_transform(pixels)

    def bcast(x):
        if getattr(x, "ndim", 0) >= 3 and x.shape[1] == 1:
            return jnp.broadcast_to(x, x.shape[:1] + (k,) + x.shape[2:])
        return x

    grp_cache = jax.tree.map(bcast, pcache)  # "pos" stays the scalar plen
    grp_mask = (
        jnp.zeros((k, max_len), bool)
        .at[:, :plen].set(True)
        .at[:, plen : plen + lb].set(pmasks)
    )
    logits_all, grp_cache, _ = model.apply(
        params, cfg, prompts, image_pixels=pixels, attn_mask=grp_mask,
        cache=grp_cache, position_ids=prompt_pos,
    )
    real_len = jnp.sum(pmasks, axis=1).astype(jnp.int32)
    logits = logits_all[jnp.arange(k), real_len - 1]
    grp_cache = {**grp_cache, "pos": plen + real_len}  # contiguous columns

    cache = jax.tree.map(
        lambda big, small: _insert_rows(big, small, slots, n_slots, k),
        state["cache"], grp_cache,
    )
    return {
        "cache": cache,
        "mask_buf": state["mask_buf"].at[slots].set(grp_mask),
        "last_logits": state["last_logits"].at[slots].set(logits.astype(jnp.float32)),
        "seqpos": state["seqpos"].at[slots].set(next_pos0),
        "finished": state["finished"].at[slots].set(False),
        "budget": state["budget"].at[slots].set(budgets),
        "rng": state["rng"],
    }


def _decode_chunk_impl(model, _frozen, cfg, n_slots, max_len, decode_chunk,
                       sample_kw, pad_id, params, state, eos_arr, row_sample=None,
                       with_logprobs=False):
    if row_sample is None:
        sample = partial(sampling, **dict(sample_kw))
    else:
        # per-request sampling: row_sample (n_slots, 4) = [temp, top_k,
        # top_p, min_p] per slot (ops/sampling.py::sampling_per_row — one
        # program serves mixed greedy/temp/top-k/top-p/min-p traffic)
        from llm_quest_tpu.ops.sampling import sampling_per_row

        sample = partial(
            sampling_per_row,
            temp=row_sample[:, 0], top_k=row_sample[:, 1].astype(jnp.int32),
            top_p=row_sample[:, 2], min_p=row_sample[:, 3],
        )

    def step(carry, _):
        cache, mask_buf, last_logits, seqpos, finished, budget, rng = carry
        rng, sub = jax.random.split(rng)
        sampled = sample(sub, last_logits)
        token = jnp.where(finished, pad_id, sampled)
        # raw MODEL logprob of the committed token (pre-temperature/filters,
        # the OpenAI-convention readout); bitcast to int32 so ONE packed
        # host transfer still carries everything
        lp = jnp.take_along_axis(
            jax.nn.log_softmax(last_logits, axis=-1), token[:, None], axis=1
        )[:, 0] if with_logprobs else None
        budget = budget - jnp.where(finished, 0, 1)
        finished = finished | _is_eos(token, eos_arr) | (budget <= 0)
        col = cache["pos"]  # (n,) — where this token's K/V will land
        # positional select, not .at[] scatter — per-row scatters
        # serialize on TPU (see cache._vector_pos_write)
        hit = jnp.arange(max_len, dtype=jnp.int32)[None, :] == col[:, None]
        mask_buf = jnp.where(hit, ~finished[:, None], mask_buf)
        logits, cache, _ = model.apply(
            params, cfg, token[:, None],
            attn_mask=mask_buf, cache=cache, position_ids=seqpos[:, None],
        )
        seqpos = seqpos + 1
        carry = (cache, mask_buf, logits[:, 0].astype(jnp.float32), seqpos, finished, budget, rng)
        ys = (token,) if lp is None else (token, lax.bitcast_convert_type(lp, jnp.int32))
        return carry, ys

    init = (
        state["cache"], state["mask_buf"], state["last_logits"],
        state["seqpos"], state["finished"], state["budget"], state["rng"],
    )
    # Early-exit chunk: a while_loop bounded at decode_chunk that stops as
    # soon as EVERY slot is finished (empty slots start finished, so partial
    # pools qualify). A fixed-length scan burns full-model forwards on the
    # drain tail — e.g. the last admission wave's shortest max_gen pins how
    # soon the pool empties, and every iteration past that point is an
    # all-pad forward. Skipped iterations leave pad_id tokens (exactly what
    # the scan would have sampled for all-finished rows), so the packed
    # host format is unchanged.
    bufs = [jnp.full((decode_chunk, n_slots), pad_id, jnp.int32)]
    if with_logprobs:
        bufs.append(jnp.zeros((decode_chunk, n_slots), jnp.int32))

    def cond(loop):
        i, carry, _ = loop
        return (i < decode_chunk) & ~jnp.all(carry[4])

    def body(loop):
        i, carry, bufs = loop
        carry, ys = step(carry, None)
        bufs = tuple(
            lax.dynamic_update_index_in_dim(b, y, i, 0) for b, y in zip(bufs, ys)
        )
        return i + 1, carry, bufs

    _, (cache, mask_buf, last_logits, seqpos, finished, budget, rng), ys = lax.while_loop(
        cond, body, (jnp.int32(0), init, tuple(bufs))
    )
    new_state = {
        "cache": cache, "mask_buf": mask_buf, "last_logits": last_logits,
        "seqpos": seqpos, "finished": finished, "budget": budget, "rng": rng,
    }
    # ONE packed host transfer per chunk: tokens (+ bitcast logprobs) + the
    # finished column
    cols = [y.T for y in ys] + [finished[:, None].astype(jnp.int32)]
    packed = jnp.concatenate(cols, axis=1)
    return new_state, packed  # (n_slots, chunk·(1 or 2) + 1)


def _admit_chunked_impl(model, _frozen, cfg, n_slots, max_len, cache_dtype,
                        n_chunks, chunk, params, state, prompts, pmasks,
                        slots, budgets):
    """Chunked-prefill admission for prompts LONGER than the largest bucket:
    the group cache fills through ``n_chunks`` sequential fixed-size prefill
    calls (static offsets — one compiled program per chunk COUNT, shared by
    every long request). The full (k, max_len) validity mask is passed to
    every chunk: later columns hold unwritten K/V but per-row causal
    q_start = c·chunk already hides the future, so no per-chunk mask is
    needed. Each row's last-token logits are captured from whichever chunk
    contains its last REAL token (right-padded waves end in different
    chunks). Hybrids resume exactly across chunks: the GDN conv taps seed
    from the carried state (ops/gdn.py::causal_conv1d_seeded) and the
    recurrent state threads through the cache."""
    k, lb = prompts.shape
    assert lb == n_chunks * chunk, (lb, n_chunks, chunk)
    grp_cache = model.init_cache(cfg, k, max_len, dtype=cache_dtype)
    grp_mask = jnp.zeros((k, max_len), bool).at[:, :lb].set(pmasks)
    real_len = jnp.sum(pmasks, axis=1).astype(jnp.int32)
    rows = jnp.arange(k)
    last = jnp.zeros((k, cfg["vocab_size"]), jnp.float32)
    for c in range(n_chunks):
        ids_c = prompts[:, c * chunk : (c + 1) * chunk]
        logits_c, grp_cache, _ = model.apply(
            params, cfg, ids_c, attn_mask=grp_mask, cache=grp_cache
        )
        loc = real_len - 1 - c * chunk
        in_chunk = (loc >= 0) & (loc < chunk)
        picked = logits_c[rows, jnp.clip(loc, 0, chunk - 1)].astype(jnp.float32)
        last = jnp.where(in_chunk[:, None], picked, last)
    grp_cache = {**grp_cache, "pos": real_len}

    cache = jax.tree.map(
        lambda big, small: _insert_rows(big, small, slots, n_slots, k),
        state["cache"], grp_cache,
    )
    return {
        "cache": cache,
        "mask_buf": state["mask_buf"].at[slots].set(grp_mask),
        "last_logits": state["last_logits"].at[slots].set(last),
        "seqpos": state["seqpos"].at[slots].set(real_len),
        "finished": state["finished"].at[slots].set(False),
        "budget": state["budget"].at[slots].set(budgets),
        "rng": state["rng"],
    }


def _admit_lora_impl(model, _frozen, cfg, n_slots, max_len, cache_dtype,
                     params, state, prompts, pmasks, slots, budgets, adapters):
    """_admit_impl with per-row multi-LoRA: ``adapters`` (k,) selects each
    wave row's stacked adapter (ops/lora.py::select_adapter) before the
    prefill — the only difference from the plain admit."""
    from llm_quest_tpu.ops.lora import select_adapter

    return _admit_impl(model, _frozen, cfg, n_slots, max_len, cache_dtype,
                       select_adapter(params, adapters), state, prompts,
                       pmasks, slots, budgets)


def _admit_spec_chunked_impl(model, draft_model, _frozen, cfg, dcfg, n_slots,
                             max_len, cache_dtype, n_chunks, chunk, params,
                             dparams, state, prompts, pmasks, slots, budgets):
    """Chunked-prefill admission for SPECULATIVE serving: prompts longer
    than any bucket prefill BOTH pool caches (target and draft) through n
    sequential fixed-size chunks in one program; the verify windows start
    from each row's last real token (column pointers rewound to real
    length, as in _admit_spec_impl)."""
    k, lb = prompts.shape
    assert lb == n_chunks * chunk, (lb, n_chunks, chunk)
    grp_mask = jnp.zeros((k, max_len), bool).at[:, :lb].set(pmasks)
    real_len = jnp.sum(pmasks, axis=1).astype(jnp.int32)
    rows = jnp.arange(k)

    def chunked_prefill(m, p, c):
        cache = m.init_cache(c, k, max_len, dtype=cache_dtype)
        last = jnp.zeros((k, c["vocab_size"]), jnp.float32)
        for ci in range(n_chunks):
            ids_c = prompts[:, ci * chunk : (ci + 1) * chunk]
            logits_c, cache, _ = m.apply(p, c, ids_c, attn_mask=grp_mask, cache=cache)
            loc = real_len - 1 - ci * chunk
            in_chunk = (loc >= 0) & (loc < chunk)
            picked = logits_c[rows, jnp.clip(loc, 0, chunk - 1)].astype(jnp.float32)
            last = jnp.where(in_chunk[:, None], picked, last)
        return {**cache, "pos": real_len}, last

    grp_cache, logits = chunked_prefill(model, params, cfg)
    grp_d, _ = chunked_prefill(draft_model, dparams, dcfg)
    last_tok = prompts[rows, real_len - 1]

    insert = lambda big, small: _insert_rows(big, small, slots, n_slots, k)  # noqa: E731
    return {
        "cache": jax.tree.map(insert, state["cache"], grp_cache),
        "d_cache": jax.tree.map(insert, state["d_cache"], grp_d),
        "mask_buf": state["mask_buf"].at[slots].set(grp_mask),
        "last_logits": state["last_logits"].at[slots].set(logits),
        "last_tok": state["last_tok"].at[slots].set(last_tok.astype(jnp.int32)),
        "seqpos": state["seqpos"].at[slots].set(real_len),
        "finished": state["finished"].at[slots].set(False),
        "budget": state["budget"].at[slots].set(budgets),
        "rng": state["rng"],
    }


def _admit_spec_lora_impl(model, draft_model, _frozen, cfg, dcfg, n_slots, max_len,
                          cache_dtype, params, dparams, state, prompts, pmasks,
                          slots, budgets, adapters):
    """Speculative admission with per-row multi-LoRA on the TARGET (the
    draft stays base — acceptance may drop for strong adapters, greedy
    commits stay exactly the adapted target's)."""
    from llm_quest_tpu.ops.lora import select_adapter

    return _admit_spec_impl(model, draft_model, _frozen, cfg, dcfg, n_slots,
                            max_len, cache_dtype, select_adapter(params, adapters),
                            dparams, state, prompts, pmasks, slots, budgets)


def _admit_spec_prefix_lora_impl(model, draft_model, _frozen, cfg, dcfg, n_slots,
                                 max_len, cache_dtype, plen, params, dparams, state,
                                 pcache, d_pcache, prompts, pmasks, slots, budgets,
                                 adapters):
    """_admit_spec_prefix_impl with the target selected per-row (the stored
    target prefix row was prefilled through the same adapter)."""
    from llm_quest_tpu.ops.lora import select_adapter

    return _admit_spec_prefix_impl(model, draft_model, _frozen, cfg, dcfg, n_slots,
                                   max_len, cache_dtype, plen,
                                   select_adapter(params, adapters), dparams, state,
                                   pcache, d_pcache, prompts, pmasks, slots, budgets)


def _spec_lora_chunk_impl(model, draft_model, _frozen, cfg, dcfg, n_slots, max_len,
                          gamma, windows, pad_id, sample_kw, params, dparams, state,
                          eos_arr, slot_adapters, row_sample=None):
    """_spec_chunk_impl verifying through each slot's adapter (draft base)."""
    from llm_quest_tpu.ops.lora import select_adapter

    return _spec_chunk_impl(model, draft_model, _frozen, cfg, dcfg, n_slots, max_len,
                            gamma, windows, pad_id, sample_kw,
                            select_adapter(params, slot_adapters), dparams, state,
                            eos_arr, row_sample)


def _admit_vlm_lora_impl(model, _frozen, cfg, n_slots, max_len, cache_dtype,
                         pixel_transform,
                         params, state, prompts, pmasks, pixels, prompt_pos,
                         next_pos0, slots, budgets, adapters):
    """_admit_vlm_impl with per-row multi-LoRA: each image+text request
    encodes and prefills through ITS adapter (adapters may wrap the vision
    tower's linears too — the per-row gather applies wherever the stacked
    lora dicts sit)."""
    from llm_quest_tpu.ops.lora import select_adapter

    return _admit_vlm_impl(model, _frozen, cfg, n_slots, max_len, cache_dtype,
                           pixel_transform,
                           select_adapter(params, adapters), state, prompts,
                           pmasks, pixels, prompt_pos, next_pos0, slots, budgets)


def _admit_chunked_lora_impl(model, _frozen, cfg, n_slots, max_len, cache_dtype,
                             n_chunks, chunk, params, state, prompts, pmasks,
                             slots, budgets, adapters):
    """_admit_chunked_impl with per-row multi-LoRA (long adapter prompts
    prefill through their adapters chunk by chunk)."""
    from llm_quest_tpu.ops.lora import select_adapter

    return _admit_chunked_impl(model, _frozen, cfg, n_slots, max_len, cache_dtype,
                               n_chunks, chunk, select_adapter(params, adapters),
                               state, prompts, pmasks, slots, budgets)


def _prefix_lora_impl(model, _frozen, cfg, max_len, cache_dtype, plen,
                      params, ids, adapter_idx):
    """_prefix_impl under a stacked adapter: the b=1 prefix row prefills
    through adapter_idx (1,) — requests sharing this prefix must use the
    SAME adapter (the stored K/V embed it)."""
    from llm_quest_tpu.ops.lora import select_adapter

    return _prefix_impl(model, _frozen, cfg, max_len, cache_dtype, plen,
                        select_adapter(params, adapter_idx), ids)


def _admit_prefix_lora_impl(model, _frozen, cfg, n_slots, max_len, cache_dtype, plen,
                            params, state, pcache, prompts, pmasks, slots, budgets,
                            adapters):
    """_admit_prefix_impl with per-row multi-LoRA (every row carries the
    prefix's adapter — submit() enforced the match)."""
    from llm_quest_tpu.ops.lora import select_adapter

    return _admit_prefix_impl(model, _frozen, cfg, n_slots, max_len, cache_dtype,
                              plen, select_adapter(params, adapters), state,
                              pcache, prompts, pmasks, slots, budgets)


def _decode_lora_chunk_impl(model, _frozen, cfg, n_slots, max_len, decode_chunk,
                            sample_kw, pad_id, params, state, eos_arr, slot_adapters,
                            row_sample=None, with_logprobs=False):
    """_decode_chunk_impl with per-slot multi-LoRA: every slot decodes
    through ITS request's adapter, selected once for the whole chunk."""
    from llm_quest_tpu.ops.lora import select_adapter

    return _decode_chunk_impl(model, _frozen, cfg, n_slots, max_len, decode_chunk,
                              sample_kw, pad_id, select_adapter(params, slot_adapters),
                              state, eos_arr, row_sample, with_logprobs)


def _admit_spec_prefix_impl(model, draft_model, _frozen, cfg, dcfg, n_slots,
                            max_len, cache_dtype, plen, params, dparams, state,
                            pcache, d_pcache, prompts, pmasks, slots, budgets):
    """Speculative admission on top of a registered prefix: BOTH pool caches
    (target and draft) seed from their broadcast prefix rows, the suffix
    prefills each at q_start=plen, and the verify windows start from the
    suffix's last token."""
    k, lb = prompts.shape

    def bcast(x):
        if getattr(x, "ndim", 0) >= 3 and x.shape[1] == 1:
            return jnp.broadcast_to(x, x.shape[:1] + (k,) + x.shape[2:])
        return x

    grp_mask = (
        jnp.zeros((k, max_len), bool)
        .at[:, :plen].set(True)
        .at[:, plen : plen + lb].set(pmasks)
    )
    real_len = jnp.sum(pmasks, axis=1).astype(jnp.int32)

    grp_cache = jax.tree.map(bcast, pcache)
    logits_all, grp_cache, _ = model.apply(
        params, cfg, prompts, attn_mask=grp_mask, cache=grp_cache
    )
    logits = logits_all[jnp.arange(k), real_len - 1]
    grp_cache = {**grp_cache, "pos": plen + real_len}

    grp_d = jax.tree.map(bcast, d_pcache)
    _, grp_d, _ = draft_model.apply(dparams, dcfg, prompts, attn_mask=grp_mask, cache=grp_d)
    grp_d = {**grp_d, "pos": plen + real_len}

    last_tok = prompts[jnp.arange(k), real_len - 1]
    insert = lambda big, small: _insert_rows(big, small, slots, n_slots, k)  # noqa: E731
    return {
        "cache": jax.tree.map(insert, state["cache"], grp_cache),
        "d_cache": jax.tree.map(insert, state["d_cache"], grp_d),
        "mask_buf": state["mask_buf"].at[slots].set(grp_mask),
        "last_logits": state["last_logits"].at[slots].set(logits.astype(jnp.float32)),
        "last_tok": state["last_tok"].at[slots].set(last_tok.astype(jnp.int32)),
        "seqpos": state["seqpos"].at[slots].set(plen + real_len),
        "finished": state["finished"].at[slots].set(False),
        "budget": state["budget"].at[slots].set(budgets),
        "rng": state["rng"],
    }


def _admit_spec_impl(model, draft_model, _frozen, cfg, dcfg, n_slots, max_len,
                     cache_dtype, params, dparams, state, prompts, pmasks,
                     slots, budgets):
    """Speculative admit: the plain admit plus a DRAFT-model prefill of the
    same prompts (the draft pool cache mirrors the target's slot/column
    conventions) and the per-row last committed token, which every verify
    window re-feeds."""
    k, lb = prompts.shape
    grp_mask = jnp.zeros((k, max_len), bool).at[:, :lb].set(pmasks)
    real_len = jnp.sum(pmasks, axis=1).astype(jnp.int32)

    grp_cache = model.init_cache(cfg, k, max_len, dtype=cache_dtype)
    logits_all, grp_cache, _ = model.apply(
        params, cfg, prompts, attn_mask=grp_mask, cache=grp_cache
    )
    logits = logits_all[jnp.arange(k), real_len - 1]
    grp_cache = {**grp_cache, "pos": real_len}

    grp_d = draft_model.init_cache(dcfg, k, max_len, dtype=cache_dtype)
    _, grp_d, _ = draft_model.apply(dparams, dcfg, prompts, attn_mask=grp_mask, cache=grp_d)
    grp_d = {**grp_d, "pos": real_len}

    last_tok = prompts[jnp.arange(k), real_len - 1]

    insert = lambda big, small: _insert_rows(big, small, slots, n_slots, k)  # noqa: E731
    return {
        "cache": jax.tree.map(insert, state["cache"], grp_cache),
        "d_cache": jax.tree.map(insert, state["d_cache"], grp_d),
        "mask_buf": state["mask_buf"].at[slots].set(grp_mask),
        "last_logits": state["last_logits"].at[slots].set(logits.astype(jnp.float32)),
        "last_tok": state["last_tok"].at[slots].set(last_tok.astype(jnp.int32)),
        "seqpos": state["seqpos"].at[slots].set(real_len),
        "finished": state["finished"].at[slots].set(False),
        "budget": state["budget"].at[slots].set(budgets),
        "rng": state["rng"],
    }


def _spec_chunk_impl(model, draft_model, _frozen, cfg, dcfg, n_slots, max_len,
                     gamma, windows, pad_id, sample_kw, params, dparams, state,
                     eos_arr, row_sample=None):
    """Speculative decode chunk: ``windows`` draft+verify windows advancing
    every slot (greedy acceptance — lossless vs plain greedy decode).

    Per window (all rows in parallel, everything static-shape):
    1. draft γ tokens autoregressively with the draft pool cache, writing
       K/V at columns [col-1, col+γ-1) — the window region is pre-marked
       valid; per-row causal q_start keeps within-window causality;
    2. ONE target forward over [last committed, γ drafted] re-feeds the
       last committed token at col-1 (identical K/V — columns are
       contiguous with tokens, see admit) and verifies every draft in
       parallel: t_logits[:, i] predicts the token after window[i];
    3. greedy acceptance: n = longest matching prefix; the committed
       correction/bonus is uniformly choice[:, n]; num_new = n+1, truncated
       at EOS and the per-row budget; finished rows commit nothing;
    4. the mask rewinds to exactly the committed columns — stale drafted
       K/V beyond num_new stays invisible and the NEXT window overwrites it
       (the single-sequence design of spec_decoding.py, per-row vectorized).

    With temp > 0 the window is STOCHASTIC (reference
    spec_decoding_engine.py semantics, per-row vectorized): drafts sample
    from the modified draft distribution, acceptance is u < p/q on the
    modified distributions, rejection resamples from norm(max(0, p-q)),
    and a full accept samples the bonus from the target's γ+1-th
    distribution. temp == 0 is the exact greedy path (lossless).

    Emits (tokens (b, windows, γ+1) pad-filled past num_new, counts
    (b, windows), finished) packed into one host transfer.
    """
    from llm_quest_tpu.inference.spec_decoding import modified_probs

    kw = dict(sample_kw)
    temp = kw.get("temp") or 0.0
    if row_sample is not None:
        # PER-REQUEST sampling inside speculative serving: each row carries
        # [temp, top_k, top_p, _]; greedy rows (temp 0) use exact-match
        # acceptance, stochastic rows the u < p/q scheme — selected per row
        # from both computed paths (min_p is rejected at submit: the
        # reference's modified-distribution scheme doesn't define it)
        from llm_quest_tpu.ops.sampling import filter_probs_per_row

        r_temp = row_sample[:, 0]
        r_topk = row_sample[:, 1].astype(jnp.int32)
        r_topp = row_sample[:, 2]
        t_eff = jnp.where(r_temp > 0, r_temp, 1.0)
        temp = 1.0  # force the stochastic code path below; per-row masks pick

        def mprobs(logits):
            scaled = logits.astype(jnp.float32) / t_eff.reshape(
                (-1,) + (1,) * (logits.ndim - 1)
            )
            return filter_probs_per_row(
                jax.nn.softmax(scaled, axis=-1), top_k=r_topk, top_p=r_topp
            )
    else:
        mprobs = partial(modified_probs, top_k=kw.get("top_k"), top_p=kw.get("top_p"), temp=temp)
    idx = jnp.arange(gamma + 1)[None, :]
    cols = jnp.arange(max_len, dtype=jnp.int32)[None, :]

    def window_step(carry, _):
        cache, d_cache, mask_buf, last_tok, seqpos, finished, budget, rng = carry
        rng, r_draft, r_accept, r_corr = jax.random.split(rng, 4)
        col = cache["pos"]  # (b,) one past the last committed column
        colm1 = jnp.maximum(col - 1, 0)  # fresh/empty slots clamp to 0

        # window region valid for the forwards; rewound after acceptance
        win = (cols >= colm1[:, None]) & (cols < (colm1 + gamma + 1)[:, None])
        mask_w = jnp.where(win, True, mask_buf)

        def dstep(c, t):
            d_cache, tok = c
            d_cache = {**d_cache, "pos": colm1 + t}
            logits, d_cache, _ = draft_model.apply(
                dparams, dcfg, tok[:, None], attn_mask=mask_w, cache=d_cache,
                position_ids=(seqpos - 1 + t)[:, None],
            )
            if temp == 0.0:
                nxt = greedy_argmax(logits[:, 0])
                probs = jnp.zeros((logits.shape[0], 0), jnp.float32)  # unused
            else:
                probs = mprobs(logits[:, 0])
                nxt = jax.random.categorical(
                    jax.random.fold_in(r_draft, t), jnp.log(jnp.maximum(probs, 1e-20))
                ).astype(jnp.int32)
                if row_sample is not None:  # greedy rows draft via argmax
                    nxt = jnp.where(
                        r_temp > 0, nxt,
                        greedy_argmax(logits[:, 0]),
                    )
            return (d_cache, nxt), (nxt, probs)

        (d_cache, _), (drafted, dprobs) = lax.scan(dstep, (d_cache, last_tok), jnp.arange(gamma))
        drafted = drafted.T  # (b, γ)
        # feed the LAST draft too (output discarded): its K/V must be in the
        # draft cache, else a full-accept window leaves a stale column the
        # next window's draft attends — self-rejection every other window
        # (the last COMMITTED token instead heals via the next window's
        # re-feed before anything reads it)
        d_cache = {**d_cache, "pos": colm1 + gamma}
        _, d_cache, _ = draft_model.apply(
            dparams, dcfg, drafted[:, -1:], attn_mask=mask_w, cache=d_cache,
            position_ids=(seqpos - 1 + gamma)[:, None],
        )

        window = jnp.concatenate([last_tok[:, None], drafted], axis=1)  # (b, γ+1)
        cache = {**cache, "pos": colm1}
        pos_ids = (seqpos - 1)[:, None] + idx
        t_logits, cache, _ = model.apply(
            params, cfg, window, attn_mask=mask_w, cache=cache, position_ids=pos_ids,
        )
        if temp == 0.0:
            choice = greedy_argmax(t_logits)  # (b, γ+1)
            accept = choice[:, :gamma] == drafted  # (b, γ)
            n = jnp.sum(jnp.cumprod(accept.astype(jnp.int32), axis=1), axis=1)  # (b,)
            corr = jnp.take_along_axis(choice, n[:, None], axis=1)[:, 0]  # correction | bonus
        else:
            tprobs = mprobs(t_logits)  # (b, γ+1, v)
            dp = jnp.moveaxis(dprobs, 0, 1)  # (b, γ, v)
            p_tok = jnp.take_along_axis(tprobs[:, :gamma], drafted[:, :, None], axis=2)[..., 0]
            q_tok = jnp.take_along_axis(dp, drafted[:, :, None], axis=2)[..., 0]
            ratio = p_tok / jnp.maximum(q_tok, 1e-20)  # (b, γ)
            accept = jax.random.uniform(r_accept, ratio.shape) < ratio
            if row_sample is not None:  # greedy rows: exact-match acceptance
                g_choice = greedy_argmax(t_logits)
                accept = jnp.where(
                    (r_temp > 0)[:, None], accept, g_choice[:, :gamma] == drafted
                )
            n = jnp.sum(jnp.cumprod(accept.astype(jnp.int32), axis=1), axis=1)  # (b,)
            adjusted = jnp.maximum(tprobs[:, :gamma] - dp, 0.0)
            adjusted = adjusted / jnp.maximum(jnp.sum(adjusted, axis=-1, keepdims=True), 1e-20)
            # per-position resamples + bonus, picked at row position n
            all_corr = jax.random.categorical(
                r_corr, jnp.log(jnp.maximum(
                    jnp.concatenate([adjusted, tprobs[:, gamma:]], axis=1), 1e-20)),
                axis=-1,
            ).astype(jnp.int32)  # (b, γ+1): resample at i<γ, bonus at γ
            corr = jnp.take_along_axis(all_corr, n[:, None], axis=1)[:, 0]
            if row_sample is not None:  # greedy rows: correction = argmax
                corr = jnp.where(
                    r_temp > 0, corr,
                    jnp.take_along_axis(g_choice, n[:, None], axis=1)[:, 0],
                )
        drafted_pad = jnp.concatenate([drafted, jnp.zeros((drafted.shape[0], 1), jnp.int32)], axis=1)
        cand = jnp.where(idx < n[:, None], drafted_pad,
                         jnp.where(idx == n[:, None], corr[:, None], pad_id))

        num_new = n + 1
        is_eos = _is_eos(cand, eos_arr) & (idx < num_new[:, None])
        any_eos = jnp.any(is_eos, axis=1)
        eos_pos = jnp.argmax(is_eos, axis=1)
        num_new = jnp.where(any_eos, eos_pos + 1, num_new)
        num_new = jnp.minimum(num_new, budget)
        num_new = jnp.where(finished, 0, num_new)

        emit = jnp.where(idx < num_new[:, None], cand, pad_id)
        budget = budget - num_new
        finished = finished | (~jnp.equal(num_new, 0) & any_eos) | (budget <= 0)

        new_col = col + num_new
        # rewind the window region to exactly the committed columns
        mask_buf = jnp.where(win, cols < new_col[:, None], mask_buf)
        cache = {**cache, "pos": new_col}
        last_tok = jnp.where(
            num_new > 0, jnp.take_along_axis(cand, jnp.maximum(num_new - 1, 0)[:, None], axis=1)[:, 0],
            last_tok,
        )
        seqpos = seqpos + num_new
        carry = (cache, d_cache, mask_buf, last_tok, seqpos, finished, budget, rng)
        return carry, (emit, num_new)

    init = (state["cache"], state["d_cache"], state["mask_buf"],
            state["last_tok"], state["seqpos"], state["finished"], state["budget"],
            state["rng"])
    # Early-exit (see _decode_chunk_impl): stop issuing draft+verify windows
    # once every slot is finished. Skipped windows leave (pad_id tokens,
    # count 0) — exactly what window_step emits for finished rows, so the
    # packed host format is unchanged.
    bufs0 = (
        jnp.full((windows, n_slots, gamma + 1), pad_id, jnp.int32),
        jnp.zeros((windows, n_slots), jnp.int32),
    )

    def cond(loop):
        i, carry, _ = loop
        return (i < windows) & ~jnp.all(carry[5])

    def body(loop):
        i, carry, bufs = loop
        carry, (emit, num_new) = window_step(carry, None)
        return i + 1, carry, (
            lax.dynamic_update_index_in_dim(bufs[0], emit, i, 0),
            lax.dynamic_update_index_in_dim(bufs[1], num_new, i, 0),
        )

    _, (cache, d_cache, mask_buf, last_tok, seqpos, finished, budget, rng), (toks, counts) = (
        lax.while_loop(cond, body, (jnp.int32(0), init, bufs0))
    )
    new_state = {
        "cache": cache, "d_cache": d_cache, "mask_buf": mask_buf,
        "last_logits": state["last_logits"], "last_tok": last_tok,
        "seqpos": seqpos, "finished": finished, "budget": budget,
        "rng": rng,
    }
    # toks (W, b, γ+1) / counts (W, b) → one (b, W*(γ+1) + W + 1) transfer
    packed = jnp.concatenate(
        [
            jnp.moveaxis(toks, 0, 1).reshape(toks.shape[1], -1),
            counts.T.astype(jnp.int32),
            finished[:, None].astype(jnp.int32),
        ],
        axis=1,
    )
    return new_state, packed


class ContinuousBatchingEngine:
    """Iteration-level scheduler over a fixed slot pool. See module docstring.

    Args:
        model: module with ``apply`` / ``init_cache``.
        n_slots: concurrent sequences resident on the chip.
        max_len: cache columns per slot (longest bucket + longest gen must fit).
        decode_chunk: tokens decoded per scheduler intervention.
        prefill_buckets: prompt lengths are right-padded up to the smallest
            bucket ≥ the prompt — one compiled admit program per bucket.
        mesh: optional ("data","model") Mesh — serve sharded (see module
            docstring); n_slots should divide mesh.shape["data"]-evenly and
            kv heads mesh.shape["model"]-evenly for the pool to distribute.
        param_rules: optional sharding rules; when given with ``mesh`` the
            params are TP-sharded here (pre-sharded params also accepted).
    """

    def __init__(
        self, model, params, cfg, *, n_slots, max_len, decode_chunk=8,
        prefill_buckets=DEFAULT_BUCKETS, top_k=None, top_p=None, min_p=None,
        temp=0.0, eos_ids=None, pad_id=0, cache_dtype=None, rng=None,
        pipeline_depth="auto", mesh=None, param_rules=None,
        draft_model=None, draft_params=None, draft_cfg=None, gamma=4,
        draft_param_rules=None, prefill_chunk=None, per_request_sampling=False,
        return_logprobs=False, pixel_transform=None,
    ):
        # multimodal pixel preprocessing applied ON DEVICE inside the admit
        # program (e.g. uint8 -> normalized model-dtype): submit() uploads
        # whatever dtype the caller hands it, so a uint8 feed carries 1/4
        # the host->device bytes of float32 and the convert/normalize fuses
        # into the vision encode. Callable (k, ...) pixels -> model pixels.
        self._pixel_transform = pixel_transform
        self._spec = draft_model is not None
        if self._spec:
            # speculative serving: each scheduler "chunk" is decode_chunk
            # DRAFT+VERIFY windows (γ drafts + 1 target forward each), so a
            # chunk commits between decode_chunk and decode_chunk·(γ+1)
            # tokens per live slot. Greedy (temp=0) acceptance is exact-match
            # — LOSSLESS vs plain greedy decode; temp>0 runs the reference's
            # stochastic u<p/q acceptance with rejection resampling. On a
            # mesh, BOTH pools shard (slots over "data", heads over "model")
            # and the draft params shard per draft_param_rules.
            assert draft_params is not None and draft_cfg is not None
        if mesh is not None:
            # Multi-chip serving: params shard per the TP rules, slots shard
            # over "data", cache heads over "model" (pool_state_shardings);
            # the jitted admit/decode programs pin their output shardings so
            # the pool STAYS distributed across scheduler iterations. Kernel
            # routing goes HEAD-SHARDED (ops/attention.py "head_shard": each
            # chip runs the flash/flash-decode kernels on its resident heads
            # inside shard_map, zero collectives) when the kv heads divide
            # the TP axis; otherwise the Pallas routes are disabled — XLA's
            # sdpa partitions automatically, while an un-shard_mapped
            # pallas_call would force a gather.
            tp = mesh.shape["model"]

            def _mesh_cfg(c):
                kvh = c.get("num_kv_groups", c.get("n_heads"))
                if tp > 1 and kvh and kvh % tp == 0:
                    # use_gdn_kernel off: the GDN Pallas kernel has no
                    # head-sharded route yet — the chunked XLA form partitions
                    return dict(c, head_shard={"mesh": mesh, "axis": "model"}, use_gdn_kernel=False)
                return dict(c, use_flash=False, use_flash_decode=False,
                            use_fused_mha=False, use_gdn_kernel=False)

            cfg = _mesh_cfg(cfg)
            if param_rules is not None:
                from llm_quest_tpu.parallel.sharding import shard_params

                params = shard_params(params, mesh, param_rules)
            if self._spec:
                draft_cfg = _mesh_cfg(draft_cfg)
                if draft_param_rules is not None:
                    from llm_quest_tpu.parallel.sharding import shard_params

                    draft_params = shard_params(draft_params, mesh, draft_param_rules)
        self.mesh = mesh
        # EXPLICIT expert parallelism in serving: cfg["expert_parallel"]
        # routes the MoE layers through the all-to-all token dispatch
        # (parallel/expert_parallel.py) inside the admit/decode programs.
        # Its shard_map requires the batch to divide over data×ep devices,
        # so admit waves pad up to that multiple (extra rows repeat the last
        # request's slot — order-independent duplicate writes, no extra
        # compute class) and n_slots must divide evenly.
        self._wave_multiple = None
        ep = (cfg or {}).get("expert_parallel")
        if ep is not None:
            epm = ep["mesh"]
            n_all = epm.shape[ep.get("data_axis", "data")] * epm.shape[ep.get("ep_axis", "model")]
            if n_slots % n_all:
                raise ValueError(f"n_slots {n_slots} must divide over {n_all} EP devices")
            self._wave_multiple = n_all
            # pin the MoE-region exit back to data-only batch sharding:
            # without it GSPMD propagates the (data×ep) token layout into
            # the pool cache's dynamic_update_slice and involuntarily fully
            # rematerializes the cache every chunk (expert_parallel.py
            # docstring; training deliberately does NOT set this)
            cfg = dict(cfg, expert_parallel=dict(ep, pin_output=True))
        self.model, self.params, self.cfg = model, params, cfg
        self.n_slots, self.max_len = n_slots, max_len
        self.decode_chunk = decode_chunk
        self.buckets = tuple(sorted(b for b in prefill_buckets if b <= max_len))
        self.sample_kw = dict(top_k=top_k, top_p=top_p, min_p=min_p, temp=temp)
        # per-request sampling: submit(temp=, top_k=, top_p=, min_p=)
        # overrides the engine defaults PER ROW; one decode program serves
        # mixed sampler traffic (greedy + stochastic in the same pool)
        self._row_sampling = per_request_sampling
        # per-token logprobs of committed tokens (raw model log-softmax, the
        # OpenAI convention) — read back via request_logprobs(rid)
        self._logprobs = return_logprobs
        if return_logprobs and draft_model is not None:
            raise ValueError("return_logprobs does not compose with speculative serving yet")
        self._default_sample = np.asarray(
            [temp, top_k or 0, 2.0 if top_p is None else top_p, min_p or 0.0],
            np.float32,
        )
        self._slot_sample = np.tile(self._default_sample, (n_slots, 1))
        self.eos_arr = jnp.asarray(_normalize_eos(eos_ids, pad_id), jnp.int32)
        self.pad_id = pad_id
        self.cache_dtype = cache_dtype
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)

        self.draft_model, self.draft_params, self.draft_cfg = draft_model, draft_params, draft_cfg
        self.gamma = gamma
        # multi-LoRA serving: stacked adapters in the params tree
        # (ops/lora.py::stack_adapters) are auto-detected; submit(adapter=j)
        # routes each request through its adapter, the null (last) row is the
        # no-adapter base path
        from llm_quest_tpu.ops.lora import num_adapters

        self._lora_n = num_adapters(params)  # incl. the null row; 0 = off
        self._slot_adapter = np.full((n_slots,), max(self._lora_n - 1, 0), np.int32)
        # prompts longer than the largest bucket admit through sequential
        # fixed-size prefill chunks (one program per chunk count)
        self.prefill_chunk = prefill_chunk
        cache = model.init_cache(cfg, n_slots, max_len, dtype=cache_dtype)
        cache["pos"] = jnp.zeros((n_slots,), jnp.int32)  # per-row column pointer
        self.state = {
            "cache": cache,
            "mask_buf": jnp.zeros((n_slots, max_len), bool),
            "last_logits": jnp.zeros((n_slots, cfg["vocab_size"]), jnp.float32),
            "seqpos": jnp.zeros((n_slots,), jnp.int32),  # RoPE position per row
            "finished": jnp.ones((n_slots,), bool),  # empty slots are finished
            # remaining generation budget per slot: the DEVICE flags a row
            # finished when it hits 0, so max_gen retirement (like EOS) needs
            # no host->device control write — the scheduler only ever reads
            "budget": jnp.zeros((n_slots,), jnp.int32),
            "rng": self.rng,  # resident: no per-chunk host split/upload
        }
        if self._spec:
            d_cache = draft_model.init_cache(draft_cfg, n_slots, max_len, dtype=cache_dtype)
            d_cache["pos"] = jnp.zeros((n_slots,), jnp.int32)
            self.state["d_cache"] = d_cache
            self.state["last_tok"] = jnp.zeros((n_slots,), jnp.int32)
        self._state_shardings = None
        if mesh is not None:
            self._state_shardings = pool_state_shardings(self.state, mesh, n_slots)
            self.state = jax.tree.map(jax.device_put, self.state, self._state_shardings)
        # compiled programs are shared ACROSS engine instances: jit wrappers
        # live in a module-level cache keyed on the engine's static config,
        # so a fresh engine over the same model re-dispatches the already-
        # compiled admit/decode programs instead of re-tracing + re-loading
        # (measured 4.3 s first-step penalty per instance without this)
        cfg_key = (id(model), _freeze(cfg), n_slots, max_len, str(cache_dtype), mesh)
        if self._spec:
            cfg_key = cfg_key + ("spec", id(draft_model), _freeze(draft_cfg), gamma)
        if self._lora_n:
            cfg_key = cfg_key + ("mlora", self._lora_n)
        admit_key = cfg_key + ("admit",)
        if admit_key not in _SERVE_JIT_CACHE:
            if self._spec:
                _SERVE_JIT_CACHE[admit_key] = jax.jit(
                    partial(_admit_spec_lora_impl if self._lora_n else _admit_spec_impl,
                            model, draft_model, _freeze(cfg), cfg,
                            draft_cfg, n_slots, max_len, cache_dtype),
                    donate_argnums=(2,),
                    out_shardings=self._state_shardings,
                )
            else:
                _SERVE_JIT_CACHE[admit_key] = jax.jit(
                    partial(_admit_lora_impl if self._lora_n else _admit_impl,
                            model, _freeze(cfg), cfg, n_slots, max_len, cache_dtype),
                    donate_argnums=(1,),
                    out_shardings=self._state_shardings,
                )
        self._admit_jit = _SERVE_JIT_CACHE[admit_key]
        decode_key = cfg_key + (
            "decode", decode_chunk, _freeze(self.sample_kw), pad_id,
            "rowsample" if self._row_sampling else None,
            "logprobs" if self._logprobs else None,
        )
        if decode_key not in _SERVE_JIT_CACHE:
            if self._spec:
                _SERVE_JIT_CACHE[decode_key] = jax.jit(
                    partial(_spec_lora_chunk_impl if self._lora_n else _spec_chunk_impl,
                            model, draft_model, _freeze(cfg), cfg,
                            draft_cfg, n_slots, max_len, gamma, decode_chunk, pad_id,
                            tuple(sorted(self.sample_kw.items()))),
                    donate_argnums=(2,),
                    out_shardings=None if mesh is None else (
                        self._state_shardings, NamedSharding(mesh, P())
                    ),
                )
            else:
                _SERVE_JIT_CACHE[decode_key] = jax.jit(
                    partial(
                        _decode_lora_chunk_impl if self._lora_n else _decode_chunk_impl,
                        model, _freeze(cfg), cfg, n_slots,
                        max_len, decode_chunk, tuple(sorted(self.sample_kw.items())), pad_id,
                        with_logprobs=self._logprobs,
                    ),
                    donate_argnums=(1,),
                    out_shardings=None if mesh is None else (
                        self._state_shardings, NamedSharding(mesh, P())
                    ),
                )
        self._decode_jit = _SERVE_JIT_CACHE[decode_key]

        self._queue = deque()
        self._slot_req = [None] * n_slots
        self._requests = {}
        self._prefixes = {}  # pid -> (prefilled b=1 cache row, real prefix len)
        self._prefix_adapter = {}  # pid -> multi-LoRA adapter the prefix was prefilled with
        self._next_rid = 0
        # observability counters (stats()): admit waves, decode chunks, and
        # per-chunk live-slot occupancy for utilization
        self._n_waves = 0
        self._n_chunks = 0
        self._busy_slot_steps = 0
        # pipelined scheduling: keep up to ``pipeline_depth`` decode chunks
        # in flight and drain the oldest while newer ones execute — the
        # host's read + retire/refill bookkeeping overlaps device compute
        # (over the tunneled chip the per-chunk host RTT is ~35 ms, roughly
        # half a 32-token chunk; depth=1 restores synchronous scheduling).
        # Correctness is unchanged: finished rows are sticky on device, and
        # each in-flight chunk carries a snapshot of the slot->request map
        # taken at ITS dispatch, so late admits never steal earlier tokens.
        #
        # Depth is a measured tradeoff, not a free win: every in-flight
        # chunk beyond the first delays retirement by one chunk, so each
        # finished request wastes (depth-1) stale chunks of slot time.
        # Measured on v5e-1 (48 reqs, gen U[16,64], 32 slots, 32-chunk):
        # dense-300M (chunk ~23 ms < ~35 ms dispatch RTT) depth2 = 1.39x
        # depth1, but Qwen3.5-0.8B (chunk ~230 ms >> RTT) depth1 = 2028
        # vs depth2 1567 tok/s. "auto" (default) resolves at warmup() by
        # timing the decode chunk against a tiny-op dispatch round trip:
        # depth 1 when the chunk dominates, else 2. An int pins it.
        self._auto_depth = pipeline_depth in (None, "auto")
        self.pipeline_depth = 2 if self._auto_depth else max(1, pipeline_depth)
        self._inflight = deque()  # (packed handle, slot_map snapshot)

    # ------------------------------------------------------------- scheduling

    def warmup(self, image_shape=None, image_dtype=np.float32):
        """Pre-execute every admit group shape plus the decode chunk on a
        scratch state, so a live serve never pays trace + program-load
        mid-flight (each admit group size is its own program; measured
        ~0.5-2 s per untraced shape inside a latency-sensitive loop).
        Chains donated scratch states — one state copy total.

        ``image_shape``: per-request pixel shape (e.g. (3, 2, 384, 384))
        to ALSO warm the multimodal admit family — the VLM admit programs
        are keyed by (group size, bucket, pixel shape), which plain warmup
        cannot know. Without this, a serve whose retirement pattern hits a
        new wave size pays a fresh compile mid-flight (measured as a
        187-467 tok/s spread on the VLM serving bench)."""
        ks, k = [], 1
        top = 1 << max(0, self.n_slots - 1).bit_length()
        while k <= top:
            ks.append(k)
            k <<= 1
        if self._wave_multiple:  # EP waves never go below the device multiple
            ks = sorted({max(k, self._wave_multiple) for k in ks})
        scratch = jax.tree.map(jnp.copy, self.state)
        if image_shape is not None:
            # run the real VLM admit path on the scratch: swap state in,
            # admit dummy image requests at every (bucket, wave size), then
            # restore — live slots/requests are untouched
            saved_state, saved_slots = self.state, list(self._slot_req)
            saved_reqs = dict(self._requests)
            self.state = scratch
            p = self.cfg["patch_size"]
            n_vis = (image_shape[-2] // p) * (image_shape[-1] // p) // self.cfg["spatial_merge_size"] ** 2
            pixels = np.zeros(image_shape, image_dtype)
            pixels_dev = jax.device_put(pixels)
            for lb in self.buckets:
                for k in [g for g in ks if g <= self.n_slots]:
                    ids = [self.cfg["image_token_id"]] * min(n_vis, lb - 1) + [1]
                    ids = (ids + [1] * lb)[:lb]
                    reqs = [_Request(-1 - j, np.asarray(ids, np.int32), 1, pixels=pixels,
                                     pixels_dev=pixels_dev)
                            for j in range(k)]
                    self._admit_group_vlm(reqs, list(range(k)))
            scratch = self.state
            self.state, self._slot_req = saved_state, saved_slots
            self._requests = saved_reqs
        for lb in self.buckets:
            for k in ks:
                pmask = np.zeros((k, lb), bool)
                pmask[:, 0] = True  # real_len >= 1 (the admit indexes len-1)
                extra = (jnp.zeros((k,), jnp.int32),) if self._lora_n else ()
                head = (self.params,) + ((self.draft_params,) if self._spec else ())
                scratch = self._admit_jit(
                    *head, scratch,
                    jnp.full((k, lb), self.pad_id, jnp.int32), jnp.asarray(pmask),
                    jnp.zeros((k,), jnp.int32), jnp.ones((k,), jnp.int32), *extra,
                )
        dextra = (jnp.asarray(self._slot_adapter),) if self._lora_n else ()
        if self._row_sampling:
            dextra = dextra + (jnp.asarray(self._slot_sample),)
        head = (self.params,) + ((self.draft_params,) if self._spec else ())
        # give every scratch row a full-chunk budget: the decode chunk
        # early-exits once all rows finish, and the warmup admits set
        # budget=1 — without this the timed chunk below would measure one
        # iteration and auto-depth would resolve against a ~chunk/64 cost.
        # Spec chunks commit up to (gamma+1) tokens per window, so their
        # token budget scales by that; and sampling over scratch-state
        # logits can emit a real EOS, so the warmup/timed chunks get a
        # sentinel eos array that cannot match (eos is a runtime arg — no
        # retrace). Budget + finished are re-armed before EVERY warmup
        # decode call: the first chunk consumes the budget, and a timed
        # chunk running on the leftovers would early-exit after ~2 rows.
        warm_budget = self.decode_chunk + 2
        if self._spec:
            warm_budget *= self.gamma + 1
        no_eos = jnp.full_like(self.eos_arr, -1)

        def _rearm(s):
            s["budget"] = jnp.full((self.n_slots,), warm_budget, jnp.int32)
            s["finished"] = jnp.zeros((self.n_slots,), bool)
            return s

        scratch, packed = self._decode_jit(*head, _rearm(scratch), no_eos, *dextra)
        np.asarray(packed)  # true host sync (block_until_ready can return early over the tunnel)
        if self._auto_depth:
            # time one FULL decode chunk vs a tiny-op dispatch round trip
            # and pick the measured-better depth (rationale at the __init__
            # pipeline_depth comment). np.asarray forces a real transfer.
            scratch = _rearm(scratch)
            t0 = time.perf_counter()
            scratch, packed = self._decode_jit(*head, scratch, no_eos, *dextra)
            np.asarray(packed)
            t_chunk = time.perf_counter() - t0
            tiny = jax.jit(lambda x: x + 1)
            z = jnp.zeros((8,), jnp.int32)
            np.asarray(tiny(z))  # compile
            rtts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(tiny(z))
                rtts.append(time.perf_counter() - t0)
            t_rtt = sorted(rtts)[1]
            self.pipeline_depth = 1 if t_chunk >= t_rtt else 2

    def _bucket_len(self, prompt_len):
        for b in self.buckets:
            if prompt_len <= b:
                return b
        if self.prefill_chunk:  # chunked-prefill admission (len → chunk multiple)
            return -(-prompt_len // self.prefill_chunk) * self.prefill_chunk
        raise ValueError(f"prompt_len {prompt_len} exceeds largest bucket {self.buckets[-1]}")

    def register_prefix(self, ids, adapter=None):
        """Prefill a shared prompt PREFIX (system prompt / few-shot header)
        once; requests submitted with ``prefix=pid`` skip recomputing it —
        their admit broadcasts the stored cache row and prefills only the
        suffix (prefix-cached TTFT scales with the suffix, not the prompt).
        One compiled admit program per distinct prefix LENGTH (static so
        cache columns stay position-aligned); prefixes are few (system
        prompts), so the compile count stays bounded. Hybrid (GDN) models
        resume exactly too: the suffix prefill seeds the depthwise conv
        from the stored taps (ops/gdn.py::causal_conv1d_seeded) and the
        recurrent state continues through ``prev_state``.

        ``adapter``: multi-LoRA — the prefix row prefills THROUGH stacked
        adapter ``adapter`` (None = base); requests using this prefix must
        submit the same adapter (its K/V are baked into the stored row) —
        the per-tenant "system prompt + adapter" shape."""
        if adapter is not None and not self._lora_n:
            raise ValueError("adapter= given but params carry no stacked adapters")
        if adapter is not None and not 0 <= adapter < self._lora_n - 1:
            raise ValueError(f"adapter {adapter} out of range [0, {self._lora_n - 1})")
        ids = np.asarray(ids, np.int32).reshape(-1)
        if "image_token_id" in self.cfg and np.any(ids == self.cfg["image_token_id"]):
            raise ValueError(
                "prefixes must be pure text: suffix MRoPE positions offset by the "
                "prefix LENGTH, which only equals its position count for text tokens"
            )
        plen = len(ids)  # NOT bucketed: one compile per registered length anyway
        if plen + min(self.buckets) >= self.max_len:
            raise ValueError(f"prefix of {plen} leaves no room in max_len {self.max_len}")
        key = (id(self.model), _freeze(self.cfg), self.max_len,
               str(self.cache_dtype), self.mesh, "prefix", plen,
               "mlora" if self._lora_n else None)
        if key not in _SERVE_JIT_CACHE:
            if self._lora_n:
                _SERVE_JIT_CACHE[key] = jax.jit(
                    partial(_prefix_lora_impl, self.model, _freeze(self.cfg), self.cfg,
                            self.max_len, self.cache_dtype, plen)
                )
            else:
                _SERVE_JIT_CACHE[key] = jax.jit(
                    partial(_prefix_impl, self.model, _freeze(self.cfg), self.cfg,
                            self.max_len, self.cache_dtype, plen)
                )
        pargs = (self.params, jnp.asarray(ids[None]))
        if self._lora_n:
            null = self._lora_n - 1
            pargs = pargs + (jnp.asarray([null if adapter is None else adapter], jnp.int32),)
        pcache = _SERVE_JIT_CACHE[key](*pargs)
        extra = ()
        if self._spec:
            # speculative engines prefill the DRAFT's prefix row too, and
            # remember the prefix's last token (the first verify window of a
            # zero-suffix... suffixes are >=1 token, so it only seeds waves)
            dkey = (id(self.draft_model), _freeze(self.draft_cfg), self.max_len,
                    str(self.cache_dtype), self.mesh, "prefix", plen)
            if dkey not in _SERVE_JIT_CACHE:
                _SERVE_JIT_CACHE[dkey] = jax.jit(
                    partial(_prefix_impl, self.draft_model, _freeze(self.draft_cfg),
                            self.draft_cfg, self.max_len, self.cache_dtype, plen)
                )
            extra = (_SERVE_JIT_CACHE[dkey](self.draft_params, jnp.asarray(ids[None])),)
        pid = len(self._prefixes)
        self._prefixes[pid] = (pcache, plen) + extra
        self._prefix_adapter[pid] = adapter
        return pid

    def submit(self, ids, max_gen, prefix=None, pixels=None, adapter=None,
               temp=None, top_k=None, top_p=None, min_p=None):
        """Queue a prompt; returns a request id. ``prefix``: id from
        ``register_prefix`` — ``ids`` is then the SUFFIX after that prefix.
        ``pixels``: image pixels for a MULTIMODAL prompt whose ids carry the
        image placeholders already expanded (the model's apply must accept
        ``image_pixels``, e.g. models/qwen3_5.py::apply); encoded once at
        admission, never re-encoded during decode. ``adapter``: stacked
        multi-LoRA adapter id for this request (None = base model).
        ``temp``/``top_k``/``top_p``/``min_p``: per-request sampler
        overrides (engine must be built with per_request_sampling=True;
        unset knobs fall back to the engine defaults)."""
        if self._spec and pixels is not None:
            raise ValueError("multimodal requests are not supported in speculative serving yet")
        if adapter is not None:
            if not self._lora_n:
                raise ValueError("adapter= given but params carry no stacked adapters (ops/lora.py::stack_adapters)")
            if not 0 <= adapter < self._lora_n - 1:
                raise ValueError(f"adapter {adapter} out of range [0, {self._lora_n - 1})")
        if self._lora_n:
            # these admit paths don't thread per-row adapter selection yet —
            # stacked params would reach linear() without an idx
            if pixels is not None and prefix is not None:
                raise ValueError("multi-LoRA does not compose with prefix+multimodal yet")
        if self._lora_n and prefix is not None and adapter != self._prefix_adapter[prefix]:
            raise ValueError(
                f"request adapter {adapter} != adapter {self._prefix_adapter[prefix]} "
                f"baked into prefix {prefix}'s stored K/V — register a prefix per adapter"
            )
        ids = np.asarray(ids, np.int32).reshape(-1)
        lb = self._bucket_len(len(ids))
        plen = self._prefixes[prefix][1] if prefix is not None else 0
        if plen + lb + max_gen > self.max_len:
            raise ValueError(
                f"prefix {plen} + bucket {lb} + max_gen {max_gen} exceeds max_len {self.max_len}"
            )
        rid = self._next_rid
        self._next_rid += 1
        sample_row = None
        if any(v is not None for v in (temp, top_k, top_p, min_p)):
            if not self._row_sampling:
                raise ValueError("per-request sampler overrides need per_request_sampling=True")
            d = self._default_sample
            sample_row = np.asarray(
                [d[0] if temp is None else temp,
                 d[1] if top_k is None else top_k,
                 d[2] if top_p is None else top_p,
                 d[3] if min_p is None else min_p], np.float32,
            )
            if sample_row[2] < 1.0 and sample_row[3] > 0.0:  # effective combo
                raise ValueError("Cannot use top_p and min_p together")
            if self._spec and sample_row[3] > 0.0:
                raise ValueError(
                    "min_p is not defined for the speculative modified-distribution scheme"
                )
        px = None if pixels is None else np.asarray(pixels)
        req = _Request(
            rid, ids, max_gen, prefix=prefix, pixels=px,
            # start the host->device pixel transfer NOW (jax transfers are
            # async): it overlaps the decode chunks running between submit
            # and this request's admit wave instead of serializing the admit
            # path — pixel feed was measured as ~85% of the multimodal
            # serving gap (text-only A/B 2383 vs 404 tok/s, round 5)
            pixels_dev=None if pixels is None else jax.device_put(px),
            adapter=adapter, sample=sample_row, t_submit=time.monotonic(),
        )
        self._requests[rid] = req
        self._queue.append(req)
        return rid

    def _admit_group(self, reqs, slots):
        """Admit len(reqs) requests into ``slots`` in one jit call, padded
        up to a power-of-two group size (bounded compile count: buckets ×
        log2(n_slots) programs) by repeating the last entry — the repeats
        target the SAME slot index with identical data, so the duplicate
        scatter writes are order-independent and no extra slot is touched.
        Shorter prompts ride the group's largest bucket (pads are masked —
        bit-identical results)."""
        lb = max(self._bucket_len(len(r.ids)) for r in reqs)
        k = 1 << (len(reqs) - 1).bit_length()  # next pow2 ≥ len(reqs)
        if self._wave_multiple:
            k = max(k, self._wave_multiple)  # explicit-EP shard_map divisibility
        prompt = np.full((k, lb), self.pad_id, np.int32)
        pmask = np.zeros((k, lb), bool)
        slot_idx = np.empty((k,), np.int32)
        budgets = np.empty((k,), np.int32)
        for j in range(k):
            r = reqs[min(j, len(reqs) - 1)]
            prompt[j, : len(r.ids)] = r.ids
            pmask[j, : len(r.ids)] = True
            slot_idx[j] = slots[min(j, len(reqs) - 1)]
            budgets[j] = r.max_gen
        args = (self.params,) + ((self.draft_params,) if self._spec else ()) + (
            self.state, jnp.asarray(prompt), jnp.asarray(pmask),
            jnp.asarray(slot_idx), jnp.asarray(budgets),
        )
        if self._lora_n:
            null = self._lora_n - 1
            adapters = np.full((k,), null, np.int32)
            for j in range(k):
                r = reqs[min(j, len(reqs) - 1)]
                adapters[j] = null if r.adapter is None else r.adapter
            args = args + (jnp.asarray(adapters),)
        self.state = self._admit_jit(*args)
        self._mark_admitted(reqs, slots)

    def _admit_group_chunked(self, reqs, slots):
        """_admit_group for prompts longer than the largest bucket: the wave
        pads to a prefill_chunk multiple and prefills through n_chunks
        sequential calls inside ONE program (static offsets — a program per
        chunk count, shared across requests). Speculative engines prefill
        BOTH pool caches this way (_admit_spec_chunked_impl)."""
        ck = self.prefill_chunk
        lb = max(self._bucket_len(len(r.ids)) for r in reqs)
        n_chunks = lb // ck
        k = 1 << (len(reqs) - 1).bit_length()
        if self._wave_multiple:
            k = max(k, self._wave_multiple)  # explicit-EP shard_map divisibility
        prompt = np.full((k, lb), self.pad_id, np.int32)
        pmask = np.zeros((k, lb), bool)
        slot_idx = np.empty((k,), np.int32)
        budgets = np.empty((k,), np.int32)
        for j in range(k):
            r = reqs[min(j, len(reqs) - 1)]
            prompt[j, : len(r.ids)] = r.ids
            pmask[j, : len(r.ids)] = True
            slot_idx[j] = slots[min(j, len(reqs) - 1)]
            budgets[j] = r.max_gen
        key = (id(self.model), _freeze(self.cfg), self.n_slots, self.max_len,
               str(self.cache_dtype), self.mesh, "admit_chunked", n_chunks, ck,
               "mlora" if self._lora_n else None,
               ("spec", id(self.draft_model), _freeze(self.draft_cfg)) if self._spec else None)
        if key not in _SERVE_JIT_CACHE:
            if self._spec:
                if self._lora_n:
                    raise ValueError("spec + chunked prefill + multi-LoRA is not wired yet")
                _SERVE_JIT_CACHE[key] = jax.jit(
                    partial(_admit_spec_chunked_impl, self.model, self.draft_model,
                            _freeze(self.cfg), self.cfg, self.draft_cfg,
                            self.n_slots, self.max_len, self.cache_dtype, n_chunks, ck),
                    donate_argnums=(2,),
                    out_shardings=self._state_shardings,
                )
            else:
                _SERVE_JIT_CACHE[key] = jax.jit(
                    partial(_admit_chunked_lora_impl if self._lora_n else _admit_chunked_impl,
                            self.model, _freeze(self.cfg), self.cfg,
                            self.n_slots, self.max_len, self.cache_dtype, n_chunks, ck),
                    donate_argnums=(1,),
                    out_shardings=self._state_shardings,
                )
        args = (self.params,) + ((self.draft_params,) if self._spec else ()) + (
            self.state, jnp.asarray(prompt), jnp.asarray(pmask),
            jnp.asarray(slot_idx), jnp.asarray(budgets),
        )
        if self._lora_n:
            null = self._lora_n - 1
            adapters = np.full((k,), null, np.int32)
            for j in range(k):
                r = reqs[min(j, len(reqs) - 1)]
                adapters[j] = null if r.adapter is None else r.adapter
            args = args + (jnp.asarray(adapters),)
        self.state = _SERVE_JIT_CACHE[key](*args)
        self._mark_admitted(reqs, slots)

    def _admit_group_prefix(self, pid, reqs, slots):
        """_admit_group for requests sharing registered prefix ``pid``:
        same pow2 wave padding, but the group cache starts as the broadcast
        prefix row and only the suffixes prefill (q_start = prefix len)."""
        pcache, plen = self._prefixes[pid][:2]
        lb = max(self._bucket_len(len(r.ids)) for r in reqs)
        k = 1 << (len(reqs) - 1).bit_length()
        if self._wave_multiple:
            k = max(k, self._wave_multiple)  # explicit-EP shard_map divisibility
        prompt = np.full((k, lb), self.pad_id, np.int32)
        pmask = np.zeros((k, lb), bool)
        slot_idx = np.empty((k,), np.int32)
        budgets = np.empty((k,), np.int32)
        for j in range(k):
            r = reqs[min(j, len(reqs) - 1)]
            prompt[j, : len(r.ids)] = r.ids
            pmask[j, : len(r.ids)] = True
            slot_idx[j] = slots[min(j, len(reqs) - 1)]
            budgets[j] = r.max_gen
        if self._spec:
            d_pcache = self._prefixes[pid][2]
            key = (id(self.model), id(self.draft_model), _freeze(self.cfg),
                   _freeze(self.draft_cfg), self.n_slots, self.max_len,
                   str(self.cache_dtype), self.mesh, "admit_spec_prefix", plen,
                   "mlora" if self._lora_n else None)
            if key not in _SERVE_JIT_CACHE:
                _SERVE_JIT_CACHE[key] = jax.jit(
                    partial(_admit_spec_prefix_lora_impl if self._lora_n
                            else _admit_spec_prefix_impl, self.model, self.draft_model,
                            _freeze(self.cfg), self.cfg, self.draft_cfg,
                            self.n_slots, self.max_len, self.cache_dtype, plen),
                    donate_argnums=(2,),
                    out_shardings=self._state_shardings,
                )
            sargs = (
                self.params, self.draft_params, self.state, pcache, d_pcache,
                jnp.asarray(prompt), jnp.asarray(pmask),
                jnp.asarray(slot_idx), jnp.asarray(budgets),
            )
            if self._lora_n:
                null = self._lora_n - 1
                a0 = self._prefix_adapter[pid]
                sargs = sargs + (jnp.asarray(
                    np.full((k,), null if a0 is None else a0, np.int32)),)
            self.state = _SERVE_JIT_CACHE[key](*sargs)
            self._mark_admitted(reqs, slots)
            return
        key = (id(self.model), _freeze(self.cfg), self.n_slots, self.max_len,
               str(self.cache_dtype), self.mesh, "admit_prefix", plen,
               "mlora" if self._lora_n else None)
        if key not in _SERVE_JIT_CACHE:
            _SERVE_JIT_CACHE[key] = jax.jit(
                partial(_admit_prefix_lora_impl if self._lora_n else _admit_prefix_impl,
                        self.model, _freeze(self.cfg), self.cfg,
                        self.n_slots, self.max_len, self.cache_dtype, plen),
                donate_argnums=(1,),
                out_shardings=self._state_shardings,
            )
        args = (
            self.params, self.state, pcache, jnp.asarray(prompt),
            jnp.asarray(pmask), jnp.asarray(slot_idx), jnp.asarray(budgets),
        )
        if self._lora_n:
            null = self._lora_n - 1
            a = self._prefix_adapter[pid]
            adapters = np.full((k,), null if a is None else a, np.int32)
            args = args + (jnp.asarray(adapters),)
        self.state = _SERVE_JIT_CACHE[key](*args)
        self._mark_admitted(reqs, slots)

    def _admit_group_vlm(self, reqs, slots):
        """_admit_group for multimodal requests: same pow2 wave padding;
        each row carries its own image (one vision encode per row, inside
        the one admit program) and host-computed 3-D MRoPE positions. All
        images in a wave must share a shape (one compiled program per
        (bucket, pixel shape))."""
        from llm_quest_tpu.models.qwen3_5 import compute_3d_position_ids, get_feeds_3d_shape

        pid = reqs[0].prefix  # step() groups waves by (shape, prefix)
        pcache, plen = self._prefixes[pid][:2] if pid is not None else (None, 0)
        lb = max(self._bucket_len(len(r.ids)) for r in reqs)
        k = 1 << (len(reqs) - 1).bit_length()
        if self._wave_multiple:
            k = max(k, self._wave_multiple)  # explicit-EP shard_map divisibility
        pshape = reqs[0].pixels.shape
        assert all(r.pixels.shape == pshape for r in reqs), "mixed image shapes in one wave"
        prompt = np.full((k, lb), self.pad_id, np.int32)
        pmask = np.zeros((k, lb), bool)
        prompt_pos = np.zeros((3, k, lb), np.int32)
        next_pos0 = np.empty((k,), np.int32)
        slot_idx = np.empty((k,), np.int32)
        budgets = np.empty((k,), np.int32)
        for j in range(k):
            r = reqs[min(j, len(reqs) - 1)]
            n = len(r.ids)
            prompt[j, :n] = r.ids
            pmask[j, :n] = True
            feeds = get_feeds_3d_shape(self.cfg, (1,) + pshape)
            # a pure-text prefix shifts every 3-D position by exactly plen
            pos = plen + np.asarray(compute_3d_position_ids(self.cfg, r.ids[None], feeds))
            prompt_pos[:, j, :n] = pos[:, 0]
            next_pos0[j] = int(pos.max()) + 1
            # bucket-pad columns continue sequentially — masked, RoPE-irrelevant
            prompt_pos[:, j, n:] = next_pos0[j] + np.arange(lb - n)
            slot_idx[j] = slots[min(j, len(reqs) - 1)]
            budgets[j] = r.max_gen
        key = (id(self.model), _freeze(self.cfg), self.n_slots, self.max_len,
               str(self.cache_dtype), self.mesh, "admit_vlm", plen if pid is not None else None,
               "mlora" if self._lora_n else None,
               None if self._pixel_transform is None else id(self._pixel_transform))
        if key not in _SERVE_JIT_CACHE:
            if pid is not None:
                _SERVE_JIT_CACHE[key] = jax.jit(
                    partial(_admit_vlm_prefix_impl, self.model, _freeze(self.cfg), self.cfg,
                            self.n_slots, self.max_len, self.cache_dtype,
                            self._pixel_transform, plen),
                    donate_argnums=(1,),
                    out_shardings=self._state_shardings,
                )
            else:
                _SERVE_JIT_CACHE[key] = jax.jit(
                    partial(_admit_vlm_lora_impl if self._lora_n else _admit_vlm_impl,
                            self.model, _freeze(self.cfg), self.cfg,
                            self.n_slots, self.max_len, self.cache_dtype,
                            self._pixel_transform),
                    donate_argnums=(1,),
                    out_shardings=self._state_shardings,
                )
        # stack the already-device-resident per-request images (pow2 pad
        # repeats the last row's array — same buffer, no re-upload)
        pixels = jnp.stack([reqs[min(j, len(reqs) - 1)].pixels_dev for j in range(k)])
        args = (self.params, self.state) + (() if pid is None else (pcache,)) + (
            jnp.asarray(prompt), jnp.asarray(pmask), pixels,
            jnp.asarray(prompt_pos), jnp.asarray(next_pos0),
            jnp.asarray(slot_idx), jnp.asarray(budgets),
        )
        if self._lora_n and pid is None:
            null = self._lora_n - 1
            adapters = np.full((k,), null, np.int32)
            for j in range(k):
                r = reqs[min(j, len(reqs) - 1)]
                adapters[j] = null if r.adapter is None else r.adapter
            args = args + (jnp.asarray(adapters),)
        self.state = _SERVE_JIT_CACHE[key](*args)
        self._mark_admitted(reqs, slots)

    def _mark_admitted(self, reqs, slots):
        now = time.monotonic()
        for r, s in zip(reqs, slots):
            self._slot_req[s] = r
            r.t_admit = now
            if self._row_sampling:
                self._slot_sample[s] = (
                    self._default_sample if r.sample is None else r.sample
                )
            if self._lora_n:
                # the ONE place per-slot adapters update — every admit path
                # (plain/prefix/chunked/vlm) funnels through here, so decode
                # chunks always see the adapter the slot was prefilled with
                self._slot_adapter[s] = (
                    self._lora_n - 1 if r.adapter is None else r.adapter
                )
        self._n_waves += 1

    def _drain_one(self):
        """Block on the OLDEST in-flight chunk, credit its tokens to the
        requests resident at its dispatch, retire finished ones. No device
        write needed to retire: the decode chunk already flagged the row
        finished (EOS or budget exhausted) — finished rows emit pad and
        stop growing their mask until an admit reuses the slot."""
        handle, smap = self._inflight.popleft()
        packed = np.asarray(handle)  # ONE transfer per chunk
        now = time.monotonic()
        lps = None
        if self._spec:
            W, g1 = self.decode_chunk, self.gamma + 1
            toks = packed[:, : W * g1].reshape(-1, W, g1)
            counts = packed[:, W * g1 : W * g1 + W]
            finished = packed[:, -1].astype(bool)
        elif self._logprobs:
            W = self.decode_chunk
            toks = packed[:, :W]
            lps = np.ascontiguousarray(packed[:, W : 2 * W]).view(np.float32)
            finished = packed[:, -1].astype(bool)
        else:
            toks, finished = packed[:, :-1], packed[:, -1].astype(bool)
        for slot, req in enumerate(smap):
            if req is None or req.done:
                continue
            if self._spec:
                for w in range(self.decode_chunk):
                    take = min(int(counts[slot, w]), req.max_gen - len(req.tokens))
                    req.tokens.extend(int(t) for t in toks[slot, w, :take])
            else:
                take = min(self.decode_chunk, req.max_gen - len(req.tokens))
                req.tokens.extend(int(t) for t in toks[slot, :take])
                if lps is not None:
                    req.logprobs.extend(float(v) for v in lps[slot, :take])
            if req.tokens and req.t_first == 0.0:
                # drain-time stamp: includes pipeline lag (depth-1 = true TTFT)
                req.t_first = now
            if finished[slot] or len(req.tokens) >= req.max_gen:
                req.done = True
                req.t_done = now
                if self._slot_req[slot] is req:
                    self._slot_req[slot] = None

    def step(self):
        """One scheduler iteration: complete the oldest in-flight chunk when
        the pipeline is full, refill freed slots, dispatch the next chunk.
        Returns True if any work remains."""
        while len(self._inflight) >= self.pipeline_depth:
            self._drain_one()
        free = [s for s in range(self.n_slots) if self._slot_req[s] is None]
        if free and self._queue:
            take = [self._queue.popleft() for _ in range(min(len(free), len(self._queue)))]
            # one admit wave per kind: plain (None), per registered prefix,
            # or multimodal grouped by image shape; dict keeps FIFO order
            groups = {}
            for r in take:
                if r.pixels is not None:
                    gkey = ("vlm", r.pixels.shape, r.prefix)
                elif r.prefix is None and len(r.ids) > self.buckets[-1]:
                    gkey = ("chunked", self._bucket_len(len(r.ids)) // self.prefill_chunk)
                else:
                    gkey = r.prefix
                groups.setdefault(gkey, []).append(r)
            for gkey, reqs in groups.items():
                slots_for, free = free[: len(reqs)], free[len(reqs):]
                if isinstance(gkey, tuple) and gkey[0] == "vlm":
                    self._admit_group_vlm(reqs, slots_for)
                elif isinstance(gkey, tuple):
                    self._admit_group_chunked(reqs, slots_for)
                elif gkey is None:
                    self._admit_group(reqs, slots_for)
                else:
                    self._admit_group_prefix(gkey, reqs, slots_for)
        live = sum(r is not None for r in self._slot_req)
        if live:
            dargs = (self.params,) + ((self.draft_params,) if self._spec else ()) + (
                self.state, self.eos_arr)
            if self._lora_n:
                dargs = dargs + (jnp.asarray(self._slot_adapter),)
            if self._row_sampling:
                dargs = dargs + (jnp.asarray(self._slot_sample),)
            self.state, packed = self._decode_jit(*dargs)
            self._inflight.append((packed, tuple(self._slot_req)))
            self._n_chunks += 1
            self._busy_slot_steps += live
            return True
        if self._inflight:  # nothing live to dispatch — wind the pipeline down
            self._drain_one()
            return True
        return bool(self._queue)

    def cancel(self, rid):
        """Cancel request ``rid``: a queued request never admits; a resident
        one retires host-side — its slot frees for the next admit wave and
        any tokens from already-dispatched chunks are dropped. (The device
        keeps decoding the row until the slot is overwritten — retirement
        is a host decision, no device control write.) Returns True if the
        request was still live."""
        req = self._requests.get(rid)
        if req is None or req.done:
            return False
        try:
            self._queue.remove(req)
        except ValueError:
            pass  # already admitted (or in flight) — free its slot below
        req.done = True
        req.t_done = time.monotonic()
        for slot, r in enumerate(self._slot_req):
            if r is req:
                self._slot_req[slot] = None
        return True

    def result(self, rid):
        """Tokens committed so far for request ``rid`` (a copy) and whether
        it has retired: ``(tokens, done)``."""
        req = self._requests[rid]
        return list(req.tokens), req.done

    def request_logprobs(self, rid):
        """Per-token logprobs of request ``rid``'s committed tokens (raw
        model log-softmax; engine built with return_logprobs=True), aligned
        with its token list (post-EOS trimming applies to both)."""
        if not self._logprobs:
            raise ValueError("engine was not built with return_logprobs=True")
        req = self._requests[rid]
        return req.logprobs[: len(req.tokens)]

    def stats(self):
        """Serving observability (host-side, no device traffic): request
        latency percentiles, queue wait, TTFT, slot utilization, and
        effective generated-token throughput. TTFT/latency stamps are taken
        when the chunk containing the token DRAINS — with pipeline_depth>1
        they include up to (depth-1) chunks of pipeline lag (set depth=1 to
        measure true latency).

        Returns a flat dict; percentile entries are None until at least one
        request finished."""
        done = [r for r in self._requests.values() if r.done]
        out = {
            "requests_submitted": len(self._requests),
            "requests_completed": len(done),
            "tokens_generated": sum(len(r.tokens) for r in self._requests.values()),
            "admit_waves": self._n_waves,
            "decode_chunks": self._n_chunks,
            "slot_utilization": (
                self._busy_slot_steps / (self._n_chunks * self.n_slots)
                if self._n_chunks else 0.0
            ),
        }
        if done:
            import statistics

            ttft = [r.t_first - r.t_submit for r in done if r.t_first]
            lat = [r.t_done - r.t_submit for r in done]
            wait = [r.t_admit - r.t_submit for r in done]
            span = max(r.t_done for r in done) - min(r.t_submit for r in done)
            out.update(
                ttft_p50_s=statistics.median(ttft) if ttft else None,
                latency_p50_s=statistics.median(lat),
                latency_max_s=max(lat),
                queue_wait_p50_s=statistics.median(wait),
                gen_tok_per_s=sum(len(r.tokens) for r in done) / span if span > 0 else None,
            )
        return out

    def serve(self, prompts):
        """Serve a batch of (ids, max_gen) or (ids, max_gen, prefix_id)
        tuples to completion; returns the generated token lists in
        submission order (EOS included, post-EOS pads trimmed)."""
        rids = [self.submit(*req) for req in prompts]
        while self.step():
            pass
        outs = []
        eos_set = set(np.asarray(self.eos_arr).tolist())
        for rid in rids:
            toks = self._requests[rid].tokens
            for i, t in enumerate(toks):
                if t in eos_set:
                    toks = toks[: i + 1]
                    break
            outs.append(toks)
        return outs
