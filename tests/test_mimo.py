"""MiMo-V2-Flash tests: hybrid layout, sink attention, shrinking-slice MTP."""

import pytest

import jax
import jax.numpy as jnp

from llm_quest_tpu.inference import generate as gen
from llm_quest_tpu.models import mimo_v2_flash as mimo
from llm_quest_tpu.ops.attention import sdpa

TINY = {
    "vocab_size": 128,
    "context_length": 64,
    "emb_dim": 32,
    "n_layers": 6,
    "n_heads": 4,
    "num_swa_kv_groups": 4,
    "num_ga_kv_groups": 2,
    "head_dim": 12,
    "value_head_dim": 8,
    "hidden_dim": 64,
    "window_size": 4,
    "hybrid_ratio": 3,
    "rope_base": 10_000,
    "rope_base_ga": 640_000,
    "partial_rope_factor": 0.33,
    "mtp_depth": 2,
    "mtp_loss_coeff": 0.3,
    "num_experts": 4,
    "top_k": 2,
    "num_shared_experts": 0,
    "moe_scaling_factor": 1,
    "moe_bias_update_rate": 1e-3,
    "dtype": jnp.float32,
}


def test_hybrid_layout():
    # layer0 GA; then SWA unless (i+1)%3==0
    assert [mimo.is_swa_layer(TINY, i) for i in range(6)] == [False, True, False, True, True, False]
    assert [mimo.is_moe_layer(TINY, i) for i in range(6)] == [False, True, True, True, True, True]


def test_sink_only_on_swa_layers():
    params = mimo.init(jax.random.PRNGKey(0), TINY)
    assert "sink" not in params["blocks"][0]["att"]  # GA layer
    assert "sink" in params["blocks"][1]["att"]  # SWA layer
    assert params["blocks"][1]["att"]["sink"].shape == (4,)


def test_sink_reduces_attention_mass():
    """Softmax with a sink column: output is a strict downscale of no-sink
    attention for single-key case (sink absorbs probability mass)."""
    q = jnp.ones((1, 2, 1, 4))
    k = jnp.ones((1, 2, 1, 4))
    v = jnp.ones((1, 2, 1, 3))
    no_sink = sdpa(q, k, v)
    with_sink = sdpa(q, k, v, sink=jnp.zeros((2,)))
    assert jnp.all(with_sink < no_sink)
    assert jnp.all(with_sink > 0)


def test_value_head_dim_decoupled():
    params = mimo.init(jax.random.PRNGKey(0), TINY)
    att = params["blocks"][1]["att"]  # SWA: 4 kv groups
    assert att["wq"]["w"].shape == (32, 4 * 12)
    assert att["wk"]["w"].shape == (32, 4 * 12)
    assert att["wv"]["w"].shape == (32, 4 * 8)
    assert att["out_proj"]["w"].shape == (4 * 8, 32)
    ga = params["blocks"][0]["att"]  # GA: 2 kv groups
    assert ga["wk"]["w"].shape == (32, 2 * 12)


@pytest.mark.slow
def test_forward_and_loss():
    params = mimo.init(jax.random.PRNGKey(0), TINY)
    x = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, 128)
    logits, _, aux = mimo.apply(params, TINY, x)
    assert logits.shape == (2, 12, 128)
    assert len(aux["moe_counts"]) == 5  # layers 1..5

    targets = jnp.roll(x, -1, axis=-1)
    total, _ = mimo.loss(params, TINY, x, targets)
    main_only, _ = mimo.loss(params, TINY, x, targets, training=False)
    assert float(main_only) < float(total)

    grads = jax.grad(lambda p: mimo.loss(p, TINY, x, targets)[0])(params)
    g_mtp = grads["mtp"][0]["down_proj"]["w"]
    assert float(jnp.abs(g_mtp).max()) > 0
    g_sink = grads["blocks"][1]["att"]["sink"]
    assert float(jnp.abs(g_sink).max()) > 0


@pytest.mark.slow
def test_cached_decode_matches_uncached():
    params = mimo.init(jax.random.PRNGKey(0), TINY)
    prompt = jax.random.randint(jax.random.PRNGKey(2), (1, 5), 0, 128)
    cached = gen.generate_kv_cache(mimo, params, TINY, prompt, max_gen=6, temp=0.0, eos_ids=-1, pad_id=0)
    uncached = gen.generate_loop_uncached(mimo, params, TINY, prompt, max_gen=6, temp=0.0)
    assert cached["sequences"][0].tolist() == uncached[0].tolist()
