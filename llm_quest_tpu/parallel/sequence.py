"""Sequence/context parallelism: attention over a sequence-sharded axis.

Green-field for the TPU build (SURVEY §2.1/§5.7: the reference scales context
algorithmically, never across devices). This is the all-gather-KV form
(Ulysses-lite): queries stay sequence-sharded — each device computes
attention for its own s/n_dev query slice — while keys/values are
all-gathered over the ``seq`` axis. Activation memory for q/scores scales
1/n_dev; KV is replicated per step. ``ring_attention`` streams KV chunks
via ppermute instead (1/n_dev KV memory too), and ``ring_flash_attention``
additionally runs each shard's contribution through the flash kernel with
exact logsumexp block combination — no materialized scores anywhere.

Causality is preserved with absolute positions: device i's queries occupy
positions [i·s_loc, (i+1)·s_loc).
"""

from functools import partial

import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import PartitionSpec as P

from llm_quest_tpu.ops.attention import sdpa
from llm_quest_tpu.ops.masks import causal_mask

_REPLICATED4 = P(None, None, None, None)


def sequence_parallel_attention(mesh, axis, q, k, v, *, causal=True):
    """q/k/v: (b, h, s, d) GLOBAL arrays (sharded or shardable along s over
    ``axis``). Returns (b, h, s, d) attention output, sequence-sharded the
    same way."""
    n_dev = mesh.shape[axis]
    s = q.shape[2]
    assert s % n_dev == 0
    s_loc = s // n_dev

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, None, axis, None),) * 3,
        out_specs=P(None, None, axis, None),
        check_vma=False,
    )
    def run(q_loc, k_loc, v_loc):
        idx = lax.axis_index(axis)
        k_full = lax.all_gather(k_loc, axis, axis=2, tiled=True)  # (b, h, s, d)
        v_full = lax.all_gather(v_loc, axis, axis=2, tiled=True)
        mask = causal_mask(s_loc, s, q_start=idx * s_loc) if causal else None
        return sdpa(q_loc, k_full, v_full, mask=mask)

    return run(q, k, v)


def ring_attention(mesh, axis, q, k, v, *, causal=True, scale=None):
    """Ring attention: KV chunks stream around the ring via ppermute while
    each device accumulates flash-style online softmax statistics for its
    local query shard — activation AND KV memory scale 1/n_dev (the
    all-gather form above replicates KV). SURVEY §5.7's "genuinely new axis".

    q/k/v: (b, h, s, d) global arrays sharded along s over ``axis``.
    Returns (b, h, s, d) sequence-sharded output.
    """
    n_dev = mesh.shape[axis]
    s = q.shape[2]
    d = q.shape[3]
    assert s % n_dev == 0
    s_loc = s // n_dev
    if scale is None:
        scale = d**-0.5
    neg = -0.5 * jnp.finfo(jnp.float32).max
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, None, axis, None),) * 3,
        out_specs=P(None, None, axis, None),
        check_vma=False,
    )
    def run(q_loc, k_loc, v_loc):
        idx = lax.axis_index(axis)
        q32 = q_loc.astype(jnp.float32) * scale
        b, h = q32.shape[:2]
        q_pos = idx * s_loc + jnp.arange(s_loc)

        m = jnp.full((b, h, s_loc, 1), -jnp.inf, jnp.float32)
        l = jnp.zeros((b, h, s_loc, 1), jnp.float32)
        acc = jnp.zeros((b, h, s_loc, q32.shape[-1]), jnp.float32)

        def block_update(m, l, acc, k_blk, v_blk, t):
            src = (idx - t) % n_dev  # which device's chunk we hold this step
            k_pos = src * s_loc + jnp.arange(s_loc)
            scores = jnp.einsum(
                "bhqd,bhkd->bhqk", q32, k_blk.astype(jnp.float32), preferred_element_type=jnp.float32
            )
            if causal:
                scores = jnp.where(k_pos[None, None, None, :] > q_pos[None, None, :, None], neg, scores)

            m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
            p = jnp.exp(scores - m_new)
            alpha_corr = jnp.exp(m - m_new)
            l = l * alpha_corr + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha_corr + jnp.einsum(
                "bhqk,bhkd->bhqd", p, v_blk.astype(jnp.float32), preferred_element_type=jnp.float32
            )
            return m_new, l, acc

        def step(carry, t):
            m, l, acc, k_blk, v_blk = carry
            # issue the ring transfer FIRST: the collective-permute has no
            # dependency on this step's math, so XLA's latency-hiding
            # scheduler overlaps the ICI transfer with the attention compute
            # (permute-after-compute serializes them)
            k_nxt = lax.ppermute(k_blk, axis, perm)
            v_nxt = lax.ppermute(v_blk, axis, perm)
            m, l, acc = block_update(m, l, acc, k_blk, v_blk, t)
            return (m, l, acc, k_nxt, v_nxt), None

        # n_dev−1 steps WITH transfer; the final held block needs no ppermute
        (m, l, acc, k_last, v_last), _ = lax.scan(
            step, (m, l, acc, k_loc, v_loc), jnp.arange(n_dev - 1)
        )
        m, l, acc = block_update(m, l, acc, k_last, v_last, jnp.int32(n_dev - 1))
        return (acc / jnp.maximum(l, 1e-30)).astype(q_loc.dtype)

    return run(q, k, v)


def ring_flash_attention(mesh, axis, q, k, v, *, causal=True, scale=None, interpret=False):
    """Ring attention with PER-SHARD FLASH KERNELS: KV blocks stream around
    the ring via ppermute (issued before the block's math so XLA overlaps the
    ICI transfer with compute) while each shard's contribution is computed by
    the blockwise flash kernel — no (s_loc, s_loc) score tensor is ever
    materialized, unlike ``ring_attention`` above.

    Blocks combine exactly through the returned logsumexp:
        lse = logaddexp(lse_acc, lse_blk)
        out = out_acc·exp(lse_acc − lse) + out_blk·exp(lse_blk − lse)
    Causality by block position: past blocks attend fully, the diagonal block
    runs the causal kernel, FUTURE blocks skip the kernel entirely (a cond
    branch returns (0, −inf) — no wasted launches). The scan runs n_dev−1
    transfer steps; the final held block is combined without a dead ppermute.

    Differentiable end-to-end: ``flash_attention_with_lse`` carries a
    custom_vjp whose backward folds the lse cotangent into the recompute
    kernels (d lse/d s = p), so sequence-parallel TRAINING can run through
    this form directly.

    q/k/v: (b, h, s, d) / (b, h, s, dv) global arrays sharded along s over
    ``axis``. Returns (b, h, s, dv) sequence-sharded output.
    """
    from llm_quest_tpu.kernels.flash_attention import flash_attention_with_lse

    n_dev = mesh.shape[axis]
    s = q.shape[2]
    assert s % n_dev == 0
    if scale is None:
        scale = q.shape[-1] ** -0.5
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, None, axis, None),) * 3,
        out_specs=P(None, None, axis, None),
        check_vma=False,
    )
    def run(q_loc, k_loc, v_loc):
        idx = lax.axis_index(axis)
        b, h, s_loc, _ = q_loc.shape
        dv = v_loc.shape[3]

        def block(k_blk, v_blk, t):
            """(out_blk fp32 (b,h,s_loc,dv), lse_blk fp32) for the chunk held
            at ring step t — skipping the kernel for future chunks."""
            src = (idx - t) % n_dev

            def skip():
                return (
                    jnp.zeros((b, h, s_loc, dv), jnp.float32),
                    jnp.full((b, h, s_loc), -jnp.inf, jnp.float32),
                )

            def compute():
                if causal:
                    o, l = lax.cond(
                        src == idx,
                        lambda: flash_attention_with_lse(
                            q_loc, k_blk, v_blk, causal=True, scale=scale, interpret=interpret
                        ),
                        lambda: flash_attention_with_lse(
                            q_loc, k_blk, v_blk, causal=False, scale=scale, interpret=interpret
                        ),
                    )
                else:
                    o, l = flash_attention_with_lse(
                        q_loc, k_blk, v_blk, causal=False, scale=scale, interpret=interpret
                    )
                return o.astype(jnp.float32), l

            if not causal:
                return compute()
            return lax.cond(src > idx, skip, compute)

        def combine(out_acc, lse_acc, out_blk, lse_blk):
            lse_new = jnp.logaddexp(lse_acc, lse_blk)
            w_acc = jnp.exp(lse_acc - lse_new)[..., None]
            w_blk = jnp.exp(lse_blk - lse_new)[..., None]
            return out_acc * w_acc + out_blk * w_blk, lse_new

        out0 = jnp.zeros((b, h, s_loc, dv), jnp.float32)
        lse0 = jnp.full((b, h, s_loc), -jnp.inf, jnp.float32)

        def step(carry, t):
            out_acc, lse_acc, k_blk, v_blk = carry
            # transfer first — overlaps with the flash compute below
            k_nxt = lax.ppermute(k_blk, axis, perm)
            v_nxt = lax.ppermute(v_blk, axis, perm)
            out_blk, lse_blk = block(k_blk, v_blk, t)
            out_acc, lse_acc = combine(out_acc, lse_acc, out_blk, lse_blk)
            return (out_acc, lse_acc, k_nxt, v_nxt), None

        # n_dev−1 steps WITH transfer, then the final held block without one
        (out, lse, k_last, v_last), _ = lax.scan(
            step, (out0, lse0, k_loc, v_loc), jnp.arange(n_dev - 1)
        )
        out_blk, lse_blk = block(k_last, v_last, jnp.int32(n_dev - 1))
        out, _ = combine(out, lse, out_blk, lse_blk)
        return out.astype(q_loc.dtype)

    return run(q, k, v)


def gdn_sequence_parallel(
    mesh, axis, q, k, v, beta, alpha,
    *, chunk_size=64, kernel_chunk_size=128, use_kernel=True, prev_state=None,
):
    """Sequence parallelism for the GATED DELTA RULE (LASP-style): extends
    context parallelism to the linear-attention layers of the hybrid models
    (Qwen3-Next / Qwen3.5), whose recurrence — unlike softmax attention —
    cannot stream KV around a ring. The key fact (ops/gdn.py::
    gdn_chunk_affine) is that the chunked state update is AFFINE in the
    incoming state, S_out = S_in @ T + C with T a tiny (dk, dk) matrix per
    head, so shards can work independently and compose:

      pass A (parallel): each shard computes its (T_shard, C_shard) from its
        local k/v/β/α — no communication;
      exchange: one all_gather of (T, C) over the ``axis`` ring — tiny
        payload, b·h·(dk² + dv·dk) floats, vs all-gathering s·(dk+dv) KV;
      prefix-compose: each shard folds the PRECEDING shards' affine maps into
        its true incoming state S_in(i) = (…(S₀·T₀+C₀)·T₁+C₁…) — an
        n_dev-step loop on tiny matrices, identical on every device;
      pass B (parallel): each shard runs the normal chunked/Pallas-kernel
        form seeded with its S_in — outputs come out sequence-sharded.

    Differentiable end-to-end (plain jnp/lax throughout, and pass B reuses
    gated_delta_rule_auto's custom_vjp kernel path on TPU), so hybrid-model
    context-parallel TRAINING runs through this form directly.

    q/k: (b, h, s, dk) pre-repeated to v heads; v: (b, h, s, dv);
    beta/alpha: (b, h, s) — all GLOBAL arrays sharded (or shardable) along s
    over ``axis``. prev_state: (b, h, dv, dk) fp32 replicated, or None.
    Returns (out (b, h, s, dv) sequence-sharded, final_state replicated).
    """
    from llm_quest_tpu.ops.gdn import gated_delta_rule_auto, gdn_shard_affine

    n_dev = mesh.shape[axis]
    b, h, s, dk = k.shape
    dv = v.shape[-1]
    assert s % n_dev == 0, f"seq {s} must divide over {n_dev} devices"
    if prev_state is None:
        prev_state = jnp.zeros((b, h, dv, dk), jnp.float32)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            (P(None, None, axis, None),) * 3
            + (P(None, None, axis),) * 2
            + (_REPLICATED4,)
        ),
        out_specs=(P(None, None, axis, None), _REPLICATED4),
        check_vma=False,
    )
    def run(q_loc, k_loc, v_loc, b_loc, a_loc, s0):
        idx = lax.axis_index(axis)
        # pass A: local affine map of this shard (state-only — no q matmuls)
        t_shard, c_shard = gdn_shard_affine(
            k_loc, v_loc, b_loc, a_loc, chunk_size=chunk_size
        )
        t_all = lax.all_gather(t_shard, axis)  # (n_dev, b, h, dk, dk)
        c_all = lax.all_gather(c_shard, axis)  # (n_dev, b, h, dv, dk)

        # prefix-compose the affine maps of shards < idx into S_in
        def body(j, state):
            nxt = jnp.einsum("bhvd,bhde->bhve", state, t_all[j]) + c_all[j]
            return jnp.where(j < idx, nxt, state)

        s_in = lax.fori_loop(0, n_dev - 1, body, s0.astype(jnp.float32))

        # pass B: the ordinary single-device fast path, seeded with S_in
        out_loc, final_loc = gated_delta_rule_auto(
            q_loc, k_loc, v_loc, b_loc, a_loc, prev_state=s_in,
            chunk_size=chunk_size, kernel_chunk_size=kernel_chunk_size,
            use_kernel=use_kernel,
        )
        # the LAST shard's final state is the global one
        final = lax.psum(
            jnp.where(idx == n_dev - 1, final_loc, jnp.zeros_like(final_loc)), axis
        )
        return out_loc, final

    return run(q, k, v, beta, alpha, prev_state)
