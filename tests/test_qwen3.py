"""Qwen3 dense/MoE model tests (tiny configs)."""

import jax
import jax.numpy as jnp
import pytest

from llm_quest_tpu.inference import generate as gen
from llm_quest_tpu.models import qwen3

DENSE_TINY = {
    "model_type": "dense",
    "vocab_size": 128,
    "context_length": 64,
    "emb_dim": 48,
    "n_layers": 2,
    "n_heads": 4,
    "num_kv_groups": 2,
    "head_dim": 16,  # decoupled: n_heads*head_dim=64 != emb_dim=48
    "hidden_dim": 96,
    "rope_base": 10_000,
    "tie_embeddings": True,
    "dtype": jnp.float32,
}

MOE_TINY = {
    **DENSE_TINY,
    "model_type": "moe",
    "tie_embeddings": False,
    "moe_hidden_dim": 64,
    "num_experts": 4,
    "top_k": 2,
    "aux_loss_coef": 0.001,
}


@pytest.mark.parametrize("cfg", [DENSE_TINY, MOE_TINY])
def test_forward_shapes(cfg):
    params = qwen3.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, cfg["vocab_size"])
    logits, cache, aux = qwen3.apply(params, cfg, x, training=True)
    assert logits.shape == (2, 10, cfg["vocab_size"])
    assert jnp.all(jnp.isfinite(logits))
    if cfg["model_type"] == "moe":
        assert "moe_loss" in aux and aux["moe_loss"] > 0
        assert len(aux["gate_probas"]) == cfg["n_layers"]


def test_head_dim_decoupled():
    params = qwen3.init(jax.random.PRNGKey(0), DENSE_TINY)
    att = params["blocks"][0]["att"]
    assert att["wq"]["w"].shape == (48, 64)
    assert att["wk"]["w"].shape == (48, 32)
    assert att["out_proj"]["w"].shape == (64, 48)


@pytest.mark.slow
@pytest.mark.parametrize("cfg", [DENSE_TINY, MOE_TINY])
def test_cache_matches_uncached(cfg):
    params = qwen3.init(jax.random.PRNGKey(0), cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(2), (1, 6), 0, cfg["vocab_size"])
    cached = gen.generate_kv_cache(qwen3, params, cfg, prompt, max_gen=8, temp=0.0, eos_ids=-1, pad_id=0)
    uncached = gen.generate_loop_uncached(qwen3, params, cfg, prompt, max_gen=8, temp=0.0)
    assert cached["sequences"][0].tolist() == uncached[0].tolist()


def test_moe_gate_replay_reproduces_logits():
    params = qwen3.init(jax.random.PRNGKey(0), MOE_TINY)
    x = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 128)
    logits1, _, aux = qwen3.apply(params, MOE_TINY, x)
    logits2, _, _ = qwen3.apply(params, MOE_TINY, x, gate_probas=aux["gate_probas"])
    assert jnp.allclose(logits1, logits2, atol=1e-6)


@pytest.mark.slow
def test_gradient_checkpointing_same_output():
    cfg = dict(DENSE_TINY, gradient_checkpointing=True)
    params = qwen3.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 128)
    targets = jnp.roll(x, -1, axis=-1)

    def loss(p, use_ckpt):
        c = dict(cfg, gradient_checkpointing=use_ckpt)
        logits, _, _ = qwen3.apply(p, c, x, training=True)
        from llm_quest_tpu.ops.losses import cross_entropy

        return cross_entropy(logits.reshape(-1, 128), targets.reshape(-1))

    g_plain = jax.grad(lambda p: loss(p, False))(params)
    g_ckpt = jax.grad(lambda p: loss(p, True))(params)
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), g_plain, g_ckpt)
    assert max(jax.tree.leaves(diffs)) < 1e-5


@pytest.mark.slow
def test_remat_policy_dots_same_grads():
    """cfg["remat_policy"]="dots" changes WHAT the backward saves, never the math."""
    cfg = dict(DENSE_TINY, gradient_checkpointing=True)
    params = qwen3.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 128)
    targets = jnp.roll(x, -1, axis=-1)

    def loss(p, policy):
        c = dict(cfg, remat_policy=policy)
        logits, _, _ = qwen3.apply(p, c, x, training=True)
        from llm_quest_tpu.ops.losses import cross_entropy

        return cross_entropy(logits.reshape(-1, 128), targets.reshape(-1))

    g_full = jax.grad(lambda p: loss(p, "full"))(params)
    for policy in ("dots", "none"):
        g_p = jax.grad(lambda p: loss(p, policy))(params)
        diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), g_full, g_p)
        assert max(jax.tree.leaves(diffs)) < 1e-5, policy


def test_left_pad_batched_generation():
    """Left-padded batched decode — semantics of generate.py:368-469."""
    cfg = DENSE_TINY
    params = qwen3.init(jax.random.PRNGKey(0), cfg)
    # row0: 4 real tokens left-padded by 2; row1: 6 real tokens
    ids = jnp.asarray([[0, 0, 5, 6, 7, 8], [1, 2, 3, 4, 5, 6]], dtype=jnp.int32)
    mask = jnp.asarray([[False, False, True, True, True, True], [True] * 6])
    out = gen.generate_batched_kv_cache(
        qwen3, params, cfg, ids, mask, max_gen=4, temp=0.0, eos_ids=-1, pad_id=0, left_pad=True
    )
    # unpadded row must match the single-row decode of the same prompt
    single = gen.generate_kv_cache(qwen3, params, cfg, ids[1:2], max_gen=4, temp=0.0, eos_ids=-1, pad_id=0)
    assert out["sequences"][1, 6:].tolist() == single["sequences"][0, 6:].tolist()
