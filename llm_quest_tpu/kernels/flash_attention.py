"""Flash attention (fwd + bwd) as Pallas TPU kernels.

Online-softmax blockwise attention: the grid is (batch·head, q-block,
k-block) with the k dimension innermost, so each program streams one
(block_q, block_k) score tile through VMEM — the (sq, sk) score matrix is
never materialized and KV lives in VMEM one block at a time (the whole-KV
VMEM design this replaces stopped fitting at exactly the sequence lengths
where flash attention matters). Running max / sum / output accumulators
persist in VMEM scratch across the sequential k iterations.

Features, matching the reference's per-architecture attention variants with
one kernel (reference: gpt/gpt_attention.py:151-215 causal SDPA,
llama3_to_gemma3/gemma3_attention.py:49-128 sliding window + softcap,
xiaomi/mimo_v2_flash_attention.py:69-127 attention sinks):
- causal masking, with k blocks past the diagonal skipped via a clamped
  index_map (no DMA, no compute);
- sliding windows (Gemma/MiMo SWA), with k blocks before the window skipped
  the same way — O(s·w) work, beating the reference's strided torch trick;
- per-head attention sinks, folded into the softmax normalizer at the last
  k block (exact — the sink contributes probability mass but no value);
- score softcapping (Gemma);
- (b, sk) key-validity padding masks;
- GQA through an index-mapped kv head (no materialized repeat);
- a full backward pass (jax.custom_vjp): saved logsumexp + recompute-based
  dq / dk / dv kernels (FlashAttention-2 style), so ``use_flash`` models
  train without the O(s²) softmax residuals.

ops/attention.py::sdpa is the correctness oracle (tests/test_flash_attention.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.5 * float(jnp.finfo(jnp.float32).max)  # finfo.min/2 semantics
LANE = 128  # VMEM lane width; scratch column pad


def _ceil_to(x, m):
    return -(-x // m) * m


def _block_visible(kb, qb, *, block_q, block_k, causal, window_size, q_start=0):
    """Whether k block kb can contribute to q block qb at all. ``q_start``
    is the static absolute position of query row 0 (cached-prefill offset)."""
    vis = jnp.bool_(True)
    if causal:
        vis = vis & (kb * block_k <= q_start + qb * block_q + block_q - 1)
    if window_size is not None:
        # lowest k position any row of this q block may attend to
        vis = vis & ((kb + 1) * block_k - 1 > q_start + qb * block_q - window_size)
    return vis


def _kv_index_map(group, block_q, block_k, causal, window_size, q_start=0):
    """Clamp the k-block index to the visible band so skipped iterations
    re-request the previous block (Mosaic skips the DMA when the block index
    repeats) instead of fetching data the kernel won't read."""

    def index_map(bh, qb, kb):
        kc = kb
        if causal:
            kc = jnp.minimum(kc, (q_start + qb * block_q + block_q - 1) // block_k)
        if window_size is not None:
            kc = jnp.maximum(kc, (q_start + qb * block_q - window_size + 1) // block_k)
            kc = jnp.maximum(kc, 0)
        return (bh // group, kc, 0)

    return index_map


def _score_mask(q_off, k_off, block_q, block_k, sk, causal, window_size):
    """True where the score must be masked out."""
    q_pos = q_off + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    k_pos = k_off + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    mask = k_pos >= sk  # zero-padded tail keys
    if causal:
        mask = mask | (k_pos > q_pos)
    if window_size is not None:
        mask = mask | (k_pos <= q_pos - window_size)
    return mask


# ------------------------------------------------------------------ forward


def _fwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, sink_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
    *, sk, block_q, block_k, nk, causal, window_size, scale, softcap, hq, q_start=0,
):
    bh = pl.program_id(0)
    qb = pl.program_id(1)
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(_block_visible(kb, qb, block_q=block_q, block_k=block_k,
                            causal=causal, window_size=window_size, q_start=q_start))
    def _():
        # dots run on native (bf16) inputs with fp32 MXU accumulation; the
        # scale and softmax happen in fp32
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        if softcap is not None:
            s = softcap * jnp.tanh(s / softcap)
        if bias_ref is not None:
            s = s + bias_ref[0]
        s = jnp.where(
            _score_mask(q_start + qb * block_q, kb * block_k, block_q, block_k, sk, causal, window_size),
            NEG_INF, s,
        )

        m_prev = m_scr[:, :1]
        l_prev = l_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True), l_scr.shape)
        acc_scr[:] = acc_scr[:] * alpha + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )

    @pl.when(kb == nk - 1)
    def _():
        m = m_scr[:, :1]
        l = l_scr[:, :1]
        if sink_ref is not None:
            # the sink is one extra logit per (head, row): it joins the
            # normalizer but contributes no value
            h = bh % hq
            l = l + jnp.exp(sink_ref[h] - m)
        o_ref[0] = (acc_scr[:] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        lse_ref[0] = jnp.broadcast_to(m + jnp.log(jnp.maximum(l, 1e-30)), lse_ref[0].shape)


# ----------------------------------------------------------------- backward
#
# FlashAttention-2 backward with recompute. Residuals: q, k, v, bias, lse and
# delta = rowsum(dO ⊙ O). For each recomputed tile:
#   p  = exp(s - lse)                    (s includes scale/softcap/bias/mask)
#   dv += pᵀ @ dO
#   dp = dO @ vᵀ
#   ds = p ⊙ (dp - delta)                (⊙ softcap chain rule if enabled)
#   dq += ds @ k · scale ; dk += dsᵀ @ q · scale


def _recompute_p(q, k, lse, bias, qb, kb, *,
                 block_q, block_k, sk, causal, window_size, scale, softcap, q_start=0):
    s_raw = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    if softcap is not None:
        t = jnp.tanh(s_raw / softcap)
        s = softcap * t
    else:
        s = s_raw
    if bias is not None:
        s = s + bias
    mask = _score_mask(q_start + qb * block_q, kb * block_k, block_q, block_k, sk, causal, window_size)
    s = jnp.where(mask, NEG_INF, s)
    p = jnp.exp(s - lse)  # rows with all-masked scores have lse such that p≈0
    if softcap is not None:
        return p, (1.0 - t * t)
    return p, None


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_scr,
    *, sk, block_q, block_k, nk, causal, window_size, scale, softcap, q_start=0,
):
    qb = pl.program_id(1)
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    @pl.when(_block_visible(kb, qb, block_q=block_q, block_k=block_k,
                            causal=causal, window_size=window_size, q_start=q_start))
    def _():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        lse = lse_ref[0][:, :1]
        delta = delta_ref[0][:, :1]
        bias = bias_ref[0] if bias_ref is not None else None

        p, capgrad = _recompute_p(
            q, k, lse, bias, qb, kb,
            block_q=block_q, block_k=block_k, sk=sk,
            causal=causal, window_size=window_size, scale=scale, softcap=softcap,
            q_start=q_start,
        )
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        if capgrad is not None:
            ds = ds * capgrad
        dq_scr[:] = dq_scr[:] + jnp.dot(
            ds.astype(k.dtype), k, preferred_element_type=jnp.float32
        ) * scale

    @pl.when(kb == nk - 1)
    def _():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref, dk_scr, dv_scr,
    *, sk, block_q, block_k, nq, causal, window_size, scale, softcap, q_start=0,
):
    kb = pl.program_id(1)
    qb = pl.program_id(2)

    @pl.when(qb == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    @pl.when(_block_visible(kb, qb, block_q=block_q, block_k=block_k,
                            causal=causal, window_size=window_size, q_start=q_start))
    def _():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        lse = lse_ref[0][:, :1]
        delta = delta_ref[0][:, :1]
        bias = bias_ref[0] if bias_ref is not None else None

        p, capgrad = _recompute_p(
            q, k, lse, bias, qb, kb,
            block_q=block_q, block_k=block_k, sk=sk,
            causal=causal, window_size=window_size, scale=scale, softcap=softcap,
            q_start=q_start,
        )
        dv_scr[:] = dv_scr[:] + jnp.dot(
            p.astype(do.dtype).T, do, preferred_element_type=jnp.float32
        )
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        if capgrad is not None:
            ds = ds * capgrad
        dk_scr[:] = dk_scr[:] + jnp.dot(
            ds.astype(q.dtype).T, q, preferred_element_type=jnp.float32
        ) * scale

    @pl.when(qb == nq - 1)
    def _():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _q_index_map_for_dkv(block_q, block_k, causal, window_size, q_start=0):
    """Clamp the q-block index to the band visible from k block kb."""

    def index_map(bh, kb, qb):
        qc = qb
        if causal:
            qc = jnp.maximum(qc, (kb * block_k - q_start) // block_q)
            qc = jnp.maximum(qc, 0)
        if window_size is not None:
            # highest q that can see the block's LAST key: k_last + window - 1
            last_q = (kb + 1) * block_k - 1 + window_size - 1 - q_start
            qc = jnp.minimum(qc, jnp.maximum(last_q // block_q, 0))
        return (bh, qc, 0)

    return index_map


# ----------------------------------------------------------------- wrappers


def _pad_seq(x, target, axis):
    pad = target - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _prepare(q, k, v, attn_mask, block_q, block_k):
    """Flatten heads, pad seq dims to block multiples and d to a lane multiple."""
    b, hq, sq, d = q.shape
    hkv, sk, dv = k.shape[1], k.shape[2], v.shape[-1]
    sq_p, sk_p = _ceil_to(sq, block_q), _ceil_to(sk, block_k)
    d_p, dv_p = _ceil_to(d, LANE), _ceil_to(dv, LANE)

    q = _pad_seq(_pad_seq(q, sq_p, 2), d_p, 3).reshape(b * hq, sq_p, d_p)
    k = _pad_seq(_pad_seq(k, sk_p, 2), d_p, 3).reshape(b * hkv, sk_p, d_p)
    v = _pad_seq(_pad_seq(v, sk_p, 2), dv_p, 3).reshape(b * hkv, sk_p, dv_p)

    bias = None
    if attn_mask is not None:
        bias = jnp.where(attn_mask.astype(bool), 0.0, NEG_INF).astype(jnp.float32)
        bias = _pad_seq(bias, sk_p, 1)[:, None, :]  # (b, 1, sk_p): the middle
        # singleton keeps the (1, 1, block_k) block tile-legal on real Mosaic
        # lowering (a 2-D (1, block_k) block has an illegal sublane dim)
    return q, k, v, bias, (b, hq, hkv, sq, sk, d, dv, sq_p, sk_p, d_p, dv_p)


def _fwd(q, k, v, attn_mask, sink, *, causal, window_size, scale, softcap,
         block_q, block_k, interpret, q_start=0):
    q3, k3, v3, bias, dims = _prepare(q, k, v, attn_mask, block_q, block_k)
    b, hq, hkv, sq, sk, d, dv, sq_p, sk_p, d_p, dv_p = dims
    group = hq // hkv
    nq, nk = sq_p // block_q, sk_p // block_k

    kv_map = _kv_index_map(group, block_q, block_k, causal, window_size, q_start)
    in_specs = [
        pl.BlockSpec((1, block_q, d_p), lambda bh, qb, kb: (bh, qb, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d_p), kv_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, dv_p), kv_map, memory_space=pltpu.VMEM),
    ]
    args = [q3, k3, v3]
    if bias is not None:
        in_specs.append(pl.BlockSpec(
            (1, 1, block_k),
            lambda bh, qb, kb, hq=hq: (bh // hq, 0, kv_map(bh * 0, qb, kb)[1]),
            memory_space=pltpu.VMEM,
        ))
        args.append(bias)
    if sink is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(sink.astype(jnp.float32))

    def kernel(*refs):
        idx = 3
        bias_ref = sink_ref = None
        if bias is not None:
            bias_ref = refs[idx]
            idx += 1
        if sink is not None:
            sink_ref = refs[idx]
            idx += 1
        o_ref, lse_ref = refs[idx], refs[idx + 1]
        m_scr, l_scr, acc_scr = refs[idx + 2], refs[idx + 3], refs[idx + 4]
        _fwd_kernel(
            refs[0], refs[1], refs[2], bias_ref, sink_ref, o_ref, lse_ref,
            m_scr, l_scr, acc_scr,
            sk=sk, block_q=block_q, block_k=block_k, nk=nk, causal=causal,
            window_size=window_size, scale=scale, softcap=softcap, hq=hq,
            q_start=q_start,
        )

    out, lse = pl.pallas_call(
        kernel,
        grid=(b * hq, nq, nk),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, block_q, dv_p), lambda bh, qb, kb: (bh, qb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, LANE), lambda bh, qb, kb: (bh, qb, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * hq, sq_p, dv_p), q.dtype),
            jax.ShapeDtypeStruct((b * hq, sq_p, LANE), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, LANE), jnp.float32),
            pltpu.VMEM((block_q, LANE), jnp.float32),
            pltpu.VMEM((block_q, dv_p), jnp.float32),
        ],
        interpret=interpret,
    )(*args)

    out4 = out.reshape(b, hq, sq_p, dv_p)[:, :, :sq, :dv]
    return out4, (lse[:, :, :1], dims)


def _bwd(q, k, v, attn_mask, sink, o, lse3, g, *, causal, window_size, scale,
         softcap, block_q, block_k, interpret, delta_shift=None, q_start=0):
    q3, k3, v3, bias, dims = _prepare(q, k, v, attn_mask, block_q, block_k)
    b, hq, hkv, sq, sk, d, dv, sq_p, sk_p, d_p, dv_p = dims
    group = hq // hkv
    nq, nk = sq_p // block_q, sk_p // block_k

    do = _pad_seq(_pad_seq(g, sq_p, 2), dv_p, 3).reshape(b * hq, sq_p, dv_p)
    # delta = rowsum(dO ⊙ O); padded rows are zero. A logsumexp cotangent
    # g_lse folds in exactly as a delta shift: d lse/d s_ij = p_ij, so
    # ds = p·(dp − (δ − g_lse)).
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    if delta_shift is not None:
        delta = delta - delta_shift.astype(jnp.float32)
    delta = _pad_seq(delta.reshape(b * hq, sq), sq_p, 1)
    delta3 = jnp.broadcast_to(delta[..., None], (b * hq, sq_p, LANE))
    lse_b = jnp.broadcast_to(lse3, (b * hq, sq_p, LANE))

    kv_map = _kv_index_map(group, block_q, block_k, causal, window_size, q_start)
    q_map = lambda bh, qb, kb: (bh, qb, 0)

    # --- dq: grid (bh, nq, nk), k innermost ---
    dq_specs = [
        pl.BlockSpec((1, block_q, d_p), q_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d_p), kv_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, dv_p), kv_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_q, dv_p), q_map, memory_space=pltpu.VMEM),  # do
        pl.BlockSpec((1, block_q, LANE), q_map, memory_space=pltpu.VMEM),  # lse
        pl.BlockSpec((1, block_q, LANE), q_map, memory_space=pltpu.VMEM),  # delta
    ]
    dq_args = [q3, k3, v3, do, lse_b, delta3]
    if bias is not None:
        dq_specs.insert(3, pl.BlockSpec(
            (1, 1, block_k),
            lambda bh, qb, kb, hq=hq: (bh // hq, 0, kv_map(bh * 0, qb, kb)[1]),
            memory_space=pltpu.VMEM,
        ))
        dq_args.insert(3, bias)

    def dq_kernel(*refs):
        if bias is not None:
            q_r, k_r, v_r, b_r, do_r, lse_r, dl_r, dq_r, scr = refs
        else:
            q_r, k_r, v_r, do_r, lse_r, dl_r, dq_r, scr = refs
            b_r = None
        _bwd_dq_kernel(
            q_r, k_r, v_r, b_r, do_r, lse_r, dl_r, dq_r, scr,
            sk=sk, block_q=block_q, block_k=block_k, nk=nk, causal=causal,
            window_size=window_size, scale=scale, softcap=softcap, q_start=q_start,
        )

    dq = pl.pallas_call(
        dq_kernel,
        grid=(b * hq, nq, nk),
        in_specs=dq_specs,
        out_specs=pl.BlockSpec((1, block_q, d_p), lambda bh, qb, kb: (bh, qb, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * hq, sq_p, d_p), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d_p), jnp.float32)],
        interpret=interpret,
    )(*dq_args)

    # --- dk/dv: grid (bh over q-heads, nk, nq), q innermost; GQA head groups
    # accumulate into per-q-head dk/dv then sum over the group in XLA ---
    kv_map_b = lambda bh, kb, qb, group=group: (bh // group, kb, 0)
    q_map_b = _q_index_map_for_dkv(block_q, block_k, causal, window_size, q_start)
    dkv_specs = [
        pl.BlockSpec((1, block_q, d_p), q_map_b, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d_p), lambda bh, kb, qb: kv_map_b(bh, kb, qb), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, dv_p), lambda bh, kb, qb: kv_map_b(bh, kb, qb), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_q, dv_p), q_map_b, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_q, LANE), q_map_b, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_q, LANE), q_map_b, memory_space=pltpu.VMEM),
    ]
    dkv_args = [q3, k3, v3, do, lse_b, delta3]
    if bias is not None:
        dkv_specs.insert(3, pl.BlockSpec(
            (1, 1, block_k), lambda bh, kb, qb, hq=hq: (bh // hq, 0, kb), memory_space=pltpu.VMEM
        ))
        dkv_args.insert(3, bias)

    def dkv_kernel(*refs):
        if bias is not None:
            q_r, k_r, v_r, b_r, do_r, lse_r, dl_r, dk_r, dv_r, dks, dvs = refs
        else:
            q_r, k_r, v_r, do_r, lse_r, dl_r, dk_r, dv_r, dks, dvs = refs
            b_r = None
        _bwd_dkv_kernel(
            q_r, k_r, v_r, b_r, do_r, lse_r, dl_r, dk_r, dv_r, dks, dvs,
            sk=sk, block_q=block_q, block_k=block_k, nq=nq, causal=causal,
            window_size=window_size, scale=scale, softcap=softcap, q_start=q_start,
        )

    dk_h, dv_h = pl.pallas_call(
        dkv_kernel,
        grid=(b * hq, nk, nq),
        in_specs=dkv_specs,
        out_specs=[
            pl.BlockSpec((1, block_k, d_p), lambda bh, kb, qb: (bh, kb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dv_p), lambda bh, kb, qb: (bh, kb, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * hq, sk_p, d_p), q.dtype),
            jax.ShapeDtypeStruct((b * hq, sk_p, dv_p), q.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d_p), jnp.float32),
            pltpu.VMEM((block_k, dv_p), jnp.float32),
        ],
        interpret=interpret,
    )(*dkv_args)

    dq4 = dq.reshape(b, hq, sq_p, d_p)[:, :, :sq, :d]
    dk4 = dk_h.reshape(b, hkv, group, sk_p, d_p).sum(axis=2)[:, :, :sk, :d].astype(k.dtype)
    dv4 = dv_h.reshape(b, hkv, group, sk_p, dv_p).sum(axis=2)[:, :, :sk, :dv].astype(v.dtype)

    dsink = None
    if sink is not None:
        # out = Σ p_i v_i with normalizer incl. exp(sink); d out/d sink =
        # -p_sink · out  ⇒  dsink_h = -Σ_rows exp(sink_h - lse_row)·delta_row
        lse_rows = lse3.reshape(b, hq, sq_p)[:, :, :sq]
        delta_rows = delta.reshape(b, hq, sq_p)[:, :, :sq]
        p_sink = jnp.exp(sink.astype(jnp.float32)[None, :, None] - lse_rows)
        dsink = -(p_sink * delta_rows).sum(axis=(0, 2)).astype(sink.dtype)

    return dq4.astype(q.dtype), dk4, dv4, dsink


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12),
)
def _flash_core(q, k, v, attn_mask, sink,
                causal, window_size, scale, softcap, block_q, block_k, interpret,
                q_start):
    out, _ = _fwd(q, k, v, attn_mask, sink, causal=causal, window_size=window_size,
                  scale=scale, softcap=softcap, block_q=block_q, block_k=block_k,
                  interpret=interpret, q_start=q_start)
    return out


def _flash_core_fwd(q, k, v, attn_mask, sink,
                    causal, window_size, scale, softcap, block_q, block_k, interpret,
                    q_start):
    out, (lse3, _) = _fwd(q, k, v, attn_mask, sink, causal=causal,
                          window_size=window_size, scale=scale, softcap=softcap,
                          block_q=block_q, block_k=block_k, interpret=interpret,
                          q_start=q_start)
    return out, (q, k, v, attn_mask, sink, out, lse3)


def _flash_core_bwd(causal, window_size, scale, softcap, block_q, block_k, interpret,
                    q_start, residuals, g):
    q, k, v, attn_mask, sink, out, lse3 = residuals
    dq, dk, dv, dsink = _bwd(
        q, k, v, attn_mask, sink, out, lse3, g,
        causal=causal, window_size=window_size, scale=scale, softcap=softcap,
        block_q=block_q, block_k=block_k, interpret=interpret, q_start=q_start,
    )
    return dq, dk, dv, None, dsink


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def flash_attention(
    q,
    k,
    v,
    *,
    attn_mask=None,
    sink=None,
    causal=True,
    window_size=None,
    scale=None,
    softcap=None,
    block_q=512,
    block_k=1024,
    interpret=False,
    q_start=0,
):
    """Blockwise flash attention, differentiable.

    Args:
        q: (b, hq, sq, d); k: (b, hkv, sk, d); v: (b, hkv, sk, dv) —
            hq % hkv == 0 (GQA via index mapping).
        attn_mask: optional (b, sk) bool key-validity mask (True = real).
        sink: optional (hq,) per-head sink logits (MiMo-V2) — extra softmax
            mass, no value contribution.
        causal: apply causal masking. ``q_start`` (STATIC int) is the
            absolute position of query row 0 — nonzero for prefill into a
            pre-allocated cache where sq < sk and keys occupy [0, q_start+sq)
            of the max_len key buffer (positions beyond are causally masked).
        window_size: sliding-window width (keys within [q-w+1, q]).
        softcap: Gemma-style score softcapping.

    Block defaults (512, 1024) are the measured v5e optimum at the s=2048
    train shape — fwd+bwd 7.07 → 5.01 ms vs (256, 512) (fewer grid steps,
    same VMEM fit; blocks clamp down for short sequences below). A
    data-dependent lax.cond skipping _score_mask on interior tiles was
    tried and REGRESSED to 7.19 ms — Mosaic pipelines the straight-line
    mask better than it predicates the branch.

    Returns (b, hq, sq, dv) in q.dtype.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    block_q = min(block_q, _ceil_to(q.shape[2], 128))
    block_k = min(block_k, _ceil_to(k.shape[2], 128))
    return _flash_core(q, k, v, attn_mask, sink,
                       causal, window_size, float(scale), softcap,
                       block_q, block_k, interpret, int(q_start))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_lse_core(q, k, v, causal, scale, block_q, block_k, interpret):
    out, (lse3, _) = _fwd(
        q, k, v, None, None, causal=causal, window_size=None, scale=scale,
        softcap=None, block_q=block_q, block_k=block_k, interpret=interpret,
    )
    b, hq, sq, _ = q.shape
    return out, lse3[:, :sq, 0].reshape(b, hq, sq)


def _flash_lse_fwd(q, k, v, causal, scale, block_q, block_k, interpret):
    out, (lse3, _) = _fwd(
        q, k, v, None, None, causal=causal, window_size=None, scale=scale,
        softcap=None, block_q=block_q, block_k=block_k, interpret=interpret,
    )
    b, hq, sq, _ = q.shape
    lse = lse3[:, :sq, 0].reshape(b, hq, sq)
    return (out, lse), (q, k, v, out, lse3)


def _flash_lse_bwd(causal, scale, block_q, block_k, interpret, residuals, cts):
    q, k, v, out, lse3 = residuals
    g_out, g_lse = cts
    dq, dk, dv, _ = _bwd(
        q, k, v, None, None, out, lse3, g_out,
        causal=causal, window_size=None, scale=scale, softcap=None,
        block_q=block_q, block_k=block_k, interpret=interpret, delta_shift=g_lse,
    )
    return dq, dk, dv


_flash_lse_core.defvjp(_flash_lse_fwd, _flash_lse_bwd)


def flash_attention_with_lse(
    q, k, v, *, causal=False, scale=None, block_q=512, block_k=1024, interpret=False
):
    """Flash attention that ALSO returns the per-row logsumexp — DIFFERENTIABLE
    through both outputs (the lse cotangent folds into the recompute backward
    as a delta shift, since d lse/d s_ij = p_ij).

    Returns (out (b, h, s, dv), lse (b, h, s) fp32). The lse makes partial
    attention results exactly combinable across KV shards:
        lse_tot = logaddexp(lse_a, lse_b)
        out_tot = out_a·exp(lse_a − lse_tot) + out_b·exp(lse_b − lse_tot)
    — the block-combination rule ring attention needs (parallel/sequence.py),
    so sequence-parallel TRAINING can run through ring_flash_attention.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    block_q = min(block_q, _ceil_to(q.shape[2], 128))
    block_k = min(block_k, _ceil_to(k.shape[2], 128))
    return _flash_lse_core(q, k, v, causal, float(scale), block_q, block_k, interpret)
