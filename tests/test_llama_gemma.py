"""Llama-3.2 and Gemma-3 unit tests (tiny configs)."""

import jax
import jax.numpy as jnp
import pytest

from llm_quest_tpu.inference import generate as gen
from llm_quest_tpu.models import gemma3, llama3
from llm_quest_tpu.ops.masks import causal_mask, swa_causal_mask_table

LLAMA_TINY = {
    "vocab_size": 128,
    "context_length": 64,
    "emb_dim": 64,
    "n_heads": 4,
    "n_layers": 2,
    "num_kv_groups": 2,
    "hidden_dim": 128,
    "rope_base": 10_000,
    "dtype": jnp.float32,
}

GEMMA_TINY = {
    **LLAMA_TINY,
    "window_size": 8,
    "local_global_att_ratio": 1,  # alternate SWA / global
}


@pytest.mark.parametrize("model,cfg", [(llama3, LLAMA_TINY), (gemma3, GEMMA_TINY)])
def test_forward_shapes(model, cfg):
    params = model.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, cfg["vocab_size"])
    logits, cache, aux = model.apply(params, cfg, x)
    assert logits.shape == (2, 10, cfg["vocab_size"])
    assert cache is None
    assert jnp.all(jnp.isfinite(logits))


@pytest.mark.parametrize("model,cfg", [(llama3, LLAMA_TINY), (gemma3, GEMMA_TINY)])
def test_weight_tying(model, cfg):
    """Output head reuses the embedding table — grads flow to one tensor."""
    params = model.init(jax.random.PRNGKey(0), cfg)
    assert "out" not in params  # tied: no separate head params


@pytest.mark.slow
@pytest.mark.parametrize("model,cfg", [(llama3, LLAMA_TINY), (gemma3, GEMMA_TINY)])
def test_cache_matches_uncached(model, cfg):
    """Greedy decode with KV cache == uncached full-recompute decode."""
    params = model.init(jax.random.PRNGKey(0), cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(2), (1, 6), 0, cfg["vocab_size"])

    cached = gen.generate_kv_cache(model, params, cfg, prompt, max_gen=8, temp=0.0, eos_ids=-1, pad_id=0)
    uncached = gen.generate_loop_uncached(model, params, cfg, prompt, max_gen=8, temp=0.0)

    assert cached["sequences"][0].tolist() == uncached[0].tolist()


def test_gemma_swa_layer_alternation():
    # ratio=1 → every 2nd layer global
    cfg = dict(GEMMA_TINY, n_layers=4, local_global_att_ratio=1)
    assert [gemma3.is_swa_layer(cfg, i) for i in range(4)] == [True, False, True, False]
    # ratio=0 → all global
    cfg0 = dict(cfg, local_global_att_ratio=0)
    assert not any(gemma3.is_swa_layer(cfg0, i) for i in range(4))
    # window_size=0 → all global
    cfgw = dict(cfg, window_size=0)
    assert not any(gemma3.is_swa_layer(cfgw, i) for i in range(4))


def test_swa_mask_matches_table():
    """Fused iota window mask == materialized reference-style table."""
    s, w = 16, 5
    fused = causal_mask(s, s, window_size=w)[0, 0]
    table = swa_causal_mask_table(s, w)
    assert jnp.array_equal(fused, table)


def test_llama_train_step_reduces_loss():
    import optax

    from llm_quest_tpu.training.engine import make_optimizer, make_train_step

    cfg = LLAMA_TINY
    params = llama3.init(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(1e-3)
    opt_state = optimizer.init(params)
    step = make_train_step(llama3, cfg, optimizer)

    x = jax.random.randint(jax.random.PRNGKey(3), (4, 16), 0, cfg["vocab_size"])
    batch = {"input_ids": x, "targets": jnp.roll(x, -1, axis=-1)}
    rng = jax.random.PRNGKey(0)

    params, opt_state, loss0 = step(params, opt_state, batch, rng)  # donated: thread state through
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, batch, rng)
    assert float(loss) < float(loss0)
