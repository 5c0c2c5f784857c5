"""Flash-decode kernel over an int8-quantized KV cache.

Why: cached decode at long context is KV-bandwidth-bound — every step
re-reads the whole (b, h, S, d) K and V. Storing the cache int8 (per-
(position, head) symmetric scales, quantized once at write time in
inference/cache.py) halves those bytes, but only if the int8→bf16 convert
happens in VMEM as the blocks stream. XLA materializes dequantized copies
for exactly this pattern (measured for ragged_dot expert stacks —
kernels/quantized_gmm.py), so the dequant lives in-kernel here.

Dequantization is EXACT through reassociation, never materialized:
- K scales multiply score columns:  s_j = (q · k_q_j) * k_s_j
- V scales fold into the probabilities:  out = Σ_j (p_j · v_s_j) v_q_j
so the (S, d) tensors only ever exist in int8.

Shape contract (decode: ONE query position per sequence):
- q (b, hq, 1, d); GQA is reshaped to (b·hkv, g, d) so each program's score
  dot serves the whole q-head group of one kv head — rows pad to 8 sublanes.
- k_q/v_q (b, hkv, S, d) int8 in NATURAL row-major layout; d and dv must be
  128-multiples (true of every serving config: qwen3 d=128, qwen3.5 d=256)
  so int8 blocks are (32, 128)-tile-legal without padding bytes.
- k_s/v_s (b, hkv, S) fp32; bias (b, S) additive fp32 (0 / NEG_INF) carrying
  validity+causality — the dense decode mask the models already build.

Grid: (b·hkv, S/block_k), k blocks innermost with running max/sum/output
scratch across them (online softmax, flash_attention.py conventions).

Reference: the torch reference has no KV quantization (its cache is
utils.py:409-531, fp chunk-growing); this is TPU-first serving work.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_quest_tpu.kernels.flash_attention import NEG_INF, LANE

_G_PAD = 8  # sublane pad for the q-head-group rows


def _kernel(q_ref, k_ref, ks_ref, v_ref, vs_ref, bias_ref, o_ref,
            m_scr, l_scr, acc_scr, *, nk, scale):
    kb = pl.program_id(1)

    @pl.when(kb == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                      # (G, d)
    k = k_ref[0]                      # (block_k, d) int8
    ks = ks_ref[0]                    # (1, block_k) f32
    s = jnp.dot(q, k.astype(q.dtype).T, preferred_element_type=jnp.float32)
    s = s * (ks * scale) + bias_ref[0]  # (G, block_k); bias carries NEG_INF

    m_prev = m_scr[:, :1]
    l_prev = l_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True), l_scr.shape)
    v = v_ref[0]                      # (block_k, dv) int8
    pv = (p * vs_ref[0]).astype(q.dtype)  # v scales fold into p — exact
    acc_scr[...] = acc_scr[...] * alpha + jnp.dot(
        pv, v.astype(q.dtype), preferred_element_type=jnp.float32
    )

    @pl.when(kb == nk - 1)
    def _():
        o_ref[0] = (acc_scr[...] / jnp.maximum(l_scr[:, :1], 1e-30)).astype(o_ref.dtype)


def supports_flash_decode(q, k_q, *, sink=None, softcap=None):
    """Routing guard: single query step, int8 cache, tile-legal head dims."""
    return (
        k_q.dtype == jnp.int8
        and q.shape[2] == 1
        and q.shape[-1] % LANE == 0
        and sink is None
        and softcap is None
        and q.shape[1] % k_q.shape[1] == 0
    )


@functools.partial(jax.jit, static_argnames=("scale", "block_k", "interpret"))
def flash_decode(q, k_q, k_s, v_q, v_s, bias, *, scale=None, block_k=512, interpret=False):
    """One decode step of attention against an int8 KV cache.

    q (b, hq, 1, d); k_q/v_q (b, hkv, S, d|dv) int8; k_s/v_s (b, hkv, S)
    fp32; bias (b, S) additive fp32 (0 valid / NEG_INF masked). Returns
    (b, hq, 1, dv) in q.dtype. Exact vs dequantize-then-sdpa up to fp
    association (tests/test_flash_decode.py).
    """
    b, hq, sq, d = q.shape
    _, hkv, S, dv = v_q.shape
    assert sq == 1 and hq % hkv == 0, (q.shape, v_q.shape)
    assert d % LANE == 0 and dv % LANE == 0, (d, dv)
    g = hq // hkv
    if scale is None:
        scale = d ** -0.5

    S_p = -(-S // block_k) * block_k
    if S_p != S:
        pad = [(0, 0), (0, 0), (0, S_p - S)]
        k_q = jnp.pad(k_q, pad + [(0, 0)])
        v_q = jnp.pad(v_q, pad + [(0, 0)])
        k_s = jnp.pad(k_s, pad)
        v_s = jnp.pad(v_s, pad)
        bias = jnp.pad(bias, [(0, 0), (0, S_p - S)], constant_values=NEG_INF)
    nk = S_p // block_k

    # (b, hq, 1, d) → (b·hkv, G, d): q head i attends kv head i // g
    q3 = q.reshape(b * hkv, g, d)
    if g < _G_PAD:
        q3 = jnp.pad(q3, [(0, 0), (0, _G_PAD - g), (0, 0)])
    G = q3.shape[1]
    k3 = k_q.reshape(b * hkv, S_p, d)
    v3 = v_q.reshape(b * hkv, S_p, dv)
    ks3 = k_s.reshape(b * hkv, 1, S_p).astype(jnp.float32)
    vs3 = v_s.reshape(b * hkv, 1, S_p).astype(jnp.float32)
    bias3 = bias.reshape(b, 1, S_p).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel, nk=nk, scale=float(scale)),
        grid=(b * hkv, nk),
        in_specs=[
            pl.BlockSpec((1, G, d), lambda bh, kb: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, kb: (bh, kb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k), lambda bh, kb: (bh, 0, kb), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dv), lambda bh, kb: (bh, kb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k), lambda bh, kb: (bh, 0, kb), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k), lambda bh, kb, hkv=hkv: (bh // hkv, 0, kb), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G, dv), lambda bh, kb: (bh, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * hkv, G, dv), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((G, LANE), jnp.float32),
            pltpu.VMEM((G, LANE), jnp.float32),
            pltpu.VMEM((G, dv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q3, k3, ks3, v3, vs3, bias3)

    return out[:, :g, :].reshape(b, hq, 1, dv)
