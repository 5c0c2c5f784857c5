"""Speculative decoding: losslessness vs plain greedy decode, acceptance accounting."""

import jax
import jax.numpy as jnp
import pytest

from llm_quest_tpu.inference import generate as gen
from llm_quest_tpu.inference.spec_decoding import speculative_generate
from llm_quest_tpu.models import gpt2

TARGET = {
    "vocab_size": 128,
    "context_length": 128,
    "emb_dim": 64,
    "n_heads": 4,
    "n_layers": 3,
    "drop_rate": 0.0,
    "qkv_bias": False,
}
DRAFT = {**TARGET, "n_layers": 1, "emb_dim": 32}


@pytest.fixture(scope="module")
def models():
    return (
        gpt2.init(jax.random.PRNGKey(0), TARGET),
        gpt2.init(jax.random.PRNGKey(1), DRAFT),
    )


@pytest.mark.slow
@pytest.mark.parametrize("gamma", [1, 2, 4])
def test_greedy_spec_matches_plain_greedy(models, gamma):
    """The speculative guarantee: greedy output == target-only greedy output."""
    target_params, draft_params = models
    prompt = jax.random.randint(jax.random.PRNGKey(2), (1, 5), 0, 128)

    plain = gen.generate_kv_cache(gpt2, target_params, TARGET, prompt, max_gen=12, temp=0.0, eos_ids=-1, pad_id=0)
    spec = speculative_generate(
        gpt2, target_params, TARGET, gpt2, draft_params, DRAFT, prompt,
        max_gen=12, draft_max_gen=gamma, temp=0.0,
    )
    assert int(spec["num_generated"]) == 12
    assert spec["sequences"][0].tolist() == plain["sequences"][0].tolist()


@pytest.mark.slow
def test_perfect_draft_accepts_everything(models):
    """Draft == target → all γ accepted + bonus each step → ~max_gen/(γ+1) steps."""
    target_params, _ = models
    prompt = jax.random.randint(jax.random.PRNGKey(3), (1, 4), 0, 128)
    gamma, max_gen = 4, 15
    out = speculative_generate(
        gpt2, target_params, TARGET, gpt2, target_params, TARGET, prompt,
        max_gen=max_gen, draft_max_gen=gamma, temp=0.0,
    )
    assert int(out["num_generated"]) == max_gen
    assert int(out["num_steps"]) == -(-max_gen // (gamma + 1))  # ceil


@pytest.mark.slow
def test_eos_stops_generation(models):
    target_params, draft_params = models
    prompt = jax.random.randint(jax.random.PRNGKey(4), (1, 5), 0, 128)
    plain = gen.generate_kv_cache(gpt2, target_params, TARGET, prompt, max_gen=12, temp=0.0, eos_ids=-1, pad_id=0)
    # pick the 3rd greedy token as "eos" so the loop must stop there
    eos = int(plain["sequences"][0, 5 + 2])
    out = speculative_generate(
        gpt2, target_params, TARGET, gpt2, draft_params, DRAFT, prompt,
        max_gen=12, draft_max_gen=2, temp=0.0, eos_id=eos,
    )
    n = int(out["num_generated"])
    committed = out["sequences"][0, 5 : 5 + n].tolist()
    assert committed[-1] == eos
    assert committed == plain["sequences"][0, 5 : 5 + n].tolist()


@pytest.mark.slow
def test_stochastic_spec_runs_and_is_plausible(models):
    """Stochastic path: correct shapes, tokens in-vocab, steps ≤ tokens."""
    target_params, draft_params = models
    prompt = jax.random.randint(jax.random.PRNGKey(5), (1, 5), 0, 128)
    out = speculative_generate(
        gpt2, target_params, TARGET, gpt2, draft_params, DRAFT, prompt,
        max_gen=10, draft_max_gen=3, temp=0.8, top_k=40, rng=jax.random.PRNGKey(7),
    )
    assert int(out["num_generated"]) == 10
    toks = out["sequences"][0, 5:15]
    assert jnp.all((toks >= 0) & (toks < 128))
    assert int(out["num_steps"]) <= 10
