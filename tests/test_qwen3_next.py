"""Qwen3-Next tests: GDN recurrence, hybrid layout, cached decode parity."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from llm_quest_tpu.inference import generate as gen
from llm_quest_tpu.models import qwen3_next as qnext
from llm_quest_tpu.ops import gdn as gdn_ops

TINY = {
    "vocab_size": 128,
    "context_length": 64,
    "emb_dim": 32,
    "n_layers": 4,
    "linear_sdpa_ratio": 2,  # GDN, GA, GDN, GA
    "n_heads": 4,
    "head_dim": 8,
    "num_kv_groups": 2,
    "partial_rope_factor": 0.25,
    "rope_base": 10_000,
    "linear_num_qk_heads": 2,
    "linear_num_value_heads": 4,
    "linear_qk_head_dim": 8,
    "linear_value_head_dim": 8,
    "linear_conv_kernel_size": 4,
    "moe_hidden_dim": 64,
    "shared_expert_hidden_dim": 64,
    "num_experts": 4,
    "top_k": 2,
    "aux_loss_coef": 0.001,
    "tie_embeddings": False,
    "p_dropout": 0.0,
    "dtype": jnp.float32,
}


def test_hybrid_layout():
    assert qnext.gdn_layer_indices(TINY) == [0, 2]
    assert qnext.ga_layer_indices(TINY) == [1, 3]


def test_gdn_scan_matches_naive_loop():
    """lax.scan recurrence == straightforward per-step numpy recurrence."""
    rng = np.random.default_rng(0)
    b, h, s, dk, dv = 2, 3, 8, 4, 5
    q = rng.normal(size=(b, h, s, dk)).astype(np.float32)
    k = rng.normal(size=(b, h, s, dk)).astype(np.float32)
    v = rng.normal(size=(b, h, s, dv)).astype(np.float32)
    beta = rng.uniform(0, 1, size=(b, h, s)).astype(np.float32)
    alpha = rng.uniform(0, 1, size=(b, h, s)).astype(np.float32)

    out, state = gdn_ops.gated_delta_rule(*map(jnp.asarray, (q, k, v, beta, alpha)))

    # naive reference recurrence (mirrors qwen3_next_attention.py:140-158)
    scale = dk**-0.5
    S = np.zeros((b, h, dv, dk), np.float32)
    want = np.zeros((b, h, s, dv), np.float32)
    for t in range(s):
        gated = alpha[:, :, t, None, None] * S
        v_old = np.einsum("bhvk,bhk->bhv", gated, k[:, :, t])
        delta = beta[:, :, t, None] * (v[:, :, t] - v_old)
        S = gated + delta[..., :, None] * k[:, :, t][..., None, :]
        want[:, :, t] = np.einsum("bhvk,bhk->bhv", S, q[:, :, t] * scale)

    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state), S, atol=1e-5)


def test_gdn_step_matches_scan():
    """Sequential single-step decode == full-sequence scan."""
    rng = np.random.default_rng(1)
    b, h, s, dk, dv = 1, 2, 6, 4, 4
    args = [
        jnp.asarray(rng.normal(size=(b, h, s, dk)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, h, s, dk)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, h, s, dv)), jnp.float32),
        jnp.asarray(rng.uniform(0, 1, size=(b, h, s)), jnp.float32),
        jnp.asarray(rng.uniform(0, 1, size=(b, h, s)), jnp.float32),
    ]
    out_scan, state_scan = gdn_ops.gated_delta_rule(*args)

    state = jnp.zeros((b, h, dv, dk), jnp.float32)
    outs = []
    for t in range(s):
        o, state = gdn_ops.gated_delta_rule_step(
            args[0][:, :, t], args[1][:, :, t], args[2][:, :, t], args[3][:, :, t], args[4][:, :, t], state
        )
        outs.append(o)
    out_steps = jnp.stack(outs, axis=2)
    assert jnp.allclose(out_scan, out_steps, atol=1e-5)
    assert jnp.allclose(state_scan, state, atol=1e-5)


def test_causal_conv_update_matches_full():
    rng = np.random.default_rng(2)
    b, s, c, ksz = 2, 7, 6, 4
    x = jnp.asarray(rng.normal(size=(b, s, c)), jnp.float32)
    params = gdn_ops.init_conv1d(jax.random.PRNGKey(0), c, ksz)
    full = gdn_ops.causal_conv1d(params, x)

    state = jnp.zeros((b, ksz - 1, c), jnp.float32)
    outs = []
    for t in range(s):
        o, state = gdn_ops.causal_conv1d_update(params, x[:, t], state)
        outs.append(o)
    stepped = jnp.stack(outs, axis=1)
    assert jnp.allclose(full, stepped, atol=1e-5)
    # conv_state_from_prefill == rolling state after the full pass
    assert jnp.allclose(gdn_ops.conv_state_from_prefill(x, ksz), state, atol=1e-6)


@pytest.mark.slow
def test_forward_and_training_aux():
    params = qnext.init(jax.random.PRNGKey(0), TINY)
    x = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, 128)
    logits, cache, aux = qnext.apply(params, TINY, x, training=True)
    assert logits.shape == (2, 10, 128)
    assert "moe_loss" in aux and len(aux["gate_probas"]) == 4
    assert jnp.all(jnp.isfinite(logits))


@pytest.mark.slow
def test_cached_decode_matches_uncached():
    params = qnext.init(jax.random.PRNGKey(0), TINY)
    prompt = jax.random.randint(jax.random.PRNGKey(2), (1, 6), 0, 128)
    cached = gen.generate_kv_cache(qnext, params, TINY, prompt, max_gen=8, temp=0.0, eos_ids=-1, pad_id=0)
    uncached = gen.generate_loop_uncached(qnext, params, TINY, prompt, max_gen=8, temp=0.0)
    assert cached["sequences"][0].tolist() == uncached[0].tolist()


def test_gdn_masking_zeroes_padded_tokens():
    """Padded tokens are zeroed at GDN input (reference: :351-353)."""
    params = qnext.init(jax.random.PRNGKey(0), TINY)
    x = jax.random.randint(jax.random.PRNGKey(3), (1, 8), 0, 128)
    mask_full = jnp.ones((1, 8), bool)
    logits_full, _, _ = qnext.apply(params, TINY, x, attn_mask=mask_full)

    # appending pad tokens after the real ones must not change their logits
    x_pad = jnp.concatenate([x, jnp.zeros((1, 2), jnp.int32)], axis=1)
    mask_pad = jnp.concatenate([mask_full, jnp.zeros((1, 2), bool)], axis=1)
    logits_pad, _, _ = qnext.apply(params, TINY, x_pad, attn_mask=mask_pad)
    assert jnp.allclose(logits_full, logits_pad[:, :8], atol=1e-4)


def test_chunked_gdn_matches_scan_oracle():
    """Chunked-parallel gated delta rule == scan recurrence (normalized-key
    domain, the only one GDN operates in)."""
    rng = np.random.default_rng(5)
    b, h, s, dk, dv = 2, 3, 130, 16, 24
    q = gdn_ops.l2_norm_clamp(jnp.asarray(rng.normal(size=(b, h, s, dk)), jnp.float32))
    k = gdn_ops.l2_norm_clamp(jnp.asarray(rng.normal(size=(b, h, s, dk)), jnp.float32))
    v = jnp.asarray(rng.normal(size=(b, h, s, dv)), jnp.float32)
    beta = jnp.asarray(rng.uniform(0, 1, size=(b, h, s)), jnp.float32)
    alpha = jnp.asarray(rng.uniform(0.001, 1, size=(b, h, s)), jnp.float32)
    S0 = jnp.asarray(rng.normal(size=(b, h, dv, dk)), jnp.float32)

    ref_o, ref_s = gdn_ops.gated_delta_rule(q, k, v, beta, alpha, prev_state=S0)
    for cs in (16, 64):
        o, st = gdn_ops.gated_delta_rule_chunked(q, k, v, beta, alpha, prev_state=S0, chunk_size=cs)
        assert float(jnp.abs(ref_o - o).max()) < 1e-4, cs
        assert float(jnp.abs(ref_s - st).max()) < 1e-4, cs


@pytest.mark.slow
def test_model_chunked_path_matches_scan_path():
    """Long-sequence forward (chunked GDN) == forced-scan forward."""
    params = qnext.init(jax.random.PRNGKey(0), TINY)
    x = jax.random.randint(jax.random.PRNGKey(9), (1, 40), 0, 128)
    cfg_chunked = dict(TINY, gdn_chunk_size=16)  # 40 >= 2*16 → chunked
    cfg_scan = dict(TINY, gdn_chunk_size=1024)  # forces scan
    lc, _, _ = qnext.apply(params, cfg_chunked, x)
    ls, _, _ = qnext.apply(params, cfg_scan, x)
    assert float(jnp.abs(lc - ls).max()) < 1e-3
