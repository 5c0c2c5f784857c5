"""Fused multi-head attention kernel for SHORT sequences (ViT-class).

flash_attention.py tiles long sequences; for s ≲ 512 its per-(bh, q-block)
program count makes launch overhead dominate (measured: 82ms vs XLA's 46ms
for ViT-B). This kernel inverts the decomposition: ONE program per batch
element computes ALL heads with the entire (h, s, s) score tensor resident
in VMEM — one softmax pass, no HBM round-trip for scores, batched MXU
matmuls over the head dimension.

VMEM budget: h·s²·4B fp32 scores (ViT-B: 12·208²·4 ≈ 2.1 MB) + q/k/v/o.
Use only when that fits (~s ≤ 512 for 12 heads).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.5 * float(jnp.finfo(jnp.float32).max)


def _fused_mha_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, causal, s_real):
    """q/k/v_ref: (1, h, s_pad, d) VMEM blocks for one batch element."""
    q = q_ref[0].astype(jnp.float32) * scale  # (h, s, d)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)

    # batched over heads on the MXU
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (h, s, s)

    s_pad = scores.shape[-1]
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 1)
    mask = k_pos >= s_real  # padded keys
    if causal:
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 0)
        mask = mask | (k_pos > q_pos)
    scores = jnp.where(mask[None], NEG_INF, scores)

    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)

    out = jax.lax.dot_general(
        p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (h, s, d)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "scale", "interpret"))
def fused_mha(q, k, v, *, causal=False, scale=None, interpret=False):
    """One-shot fused MHA. q/k/v: (b, h, s, d), equal head counts.
    Returns (b, h, s, d) in q.dtype."""
    b, h, s, d = q.shape
    if scale is None:
        scale = d**-0.5
    s_pad = -(-s // 8) * 8  # sublane alignment
    if s_pad != s:
        pad = ((0, 0), (0, 0), (0, s_pad - s), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)

    out = pl.pallas_call(
        functools.partial(_fused_mha_kernel, scale=scale, causal=causal, s_real=s),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, s_pad, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, s_pad, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, s_pad, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, s_pad, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, d), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out[:, :, :s, :]
