"""Flash-attention Pallas kernel vs XLA sdpa oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_quest_tpu.kernels.flash_attention import NEG_INF, flash_attention
from llm_quest_tpu.ops.attention import sdpa
from llm_quest_tpu.ops.masks import causal_mask

INTERPRET = jax.default_backend() != "tpu"


@pytest.fixture(scope="module")
def qkv():
    b, hq, hkv, s, d = 2, 4, 2, 200, 64  # non-multiple-of-block seq, GQA
    q = jax.random.normal(jax.random.PRNGKey(0), (b, hq, s, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, hkv, s, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, hkv, s, d))
    return q, k, v


def test_causal(qkv):
    q, k, v = qkv
    s = q.shape[2]
    ref = sdpa(q, k, v, mask=causal_mask(s))
    out = flash_attention(q, k, v, causal=True, interpret=INTERPRET)
    assert float(jnp.abs(ref - out).max()) < 2e-5


def test_padding_mask(qkv):
    q, k, v = qkv
    s = q.shape[2]
    pad = jnp.asarray(np.random.default_rng(0).random((2, s)) > 0.2)
    ref = sdpa(q, k, v, mask=causal_mask(s, attn_mask=pad))
    bias = jnp.where(pad, 0.0, NEG_INF)
    out = flash_attention(q, k, v, padding_bias=bias, causal=True, interpret=INTERPRET)
    assert float(jnp.abs(ref - out).max()) < 2e-5


def test_sliding_window(qkv):
    q, k, v = qkv
    s = q.shape[2]
    ref = sdpa(q, k, v, mask=causal_mask(s, window_size=32))
    out = flash_attention(q, k, v, causal=True, window_size=32, interpret=INTERPRET)
    assert float(jnp.abs(ref - out).max()) < 2e-5


def test_bidirectional_and_softcap(qkv):
    q, k, v = qkv
    ref = sdpa(q, k, v)
    out = flash_attention(q, k, v, causal=False, interpret=INTERPRET)
    assert float(jnp.abs(ref - out).max()) < 2e-5

    s = q.shape[2]
    ref_cap = sdpa(q, k, v, mask=causal_mask(s), softcap=30.0)
    out_cap = flash_attention(q, k, v, causal=True, softcap=30.0, interpret=INTERPRET)
    assert float(jnp.abs(ref_cap - out_cap).max()) < 2e-5


def test_small_sequence_blocks():
    """Sequence smaller than the default block size."""
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 17, 32))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 17, 32))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 17, 32))
    ref = sdpa(q, k, v, mask=causal_mask(17))
    out = flash_attention(q, k, v, causal=True, interpret=INTERPRET)
    assert float(jnp.abs(ref - out).max()) < 2e-5


def test_fused_mha_short_seq():
    """Fused short-sequence MHA kernel vs sdpa oracle."""
    from llm_quest_tpu.kernels.fused_mha import fused_mha

    b, h, s, d = 2, 4, 197, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, s, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, s, d))
    assert float(jnp.abs(sdpa(q, k, v) - fused_mha(q, k, v, interpret=INTERPRET)).max()) < 2e-5
    ref_c = sdpa(q, k, v, mask=causal_mask(s))
    assert float(jnp.abs(ref_c - fused_mha(q, k, v, causal=True, interpret=INTERPRET)).max()) < 2e-5
