"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import pytest

from llm_quest_tpu.models import gpt2
from llm_quest_tpu.parallel import create_mesh, shard_params, sharding_rules_gpt2
from llm_quest_tpu.parallel.sharding import param_specs

TINY = {
    "vocab_size": 256,
    "context_length": 64,
    "emb_dim": 128,
    "n_heads": 4,
    "n_layers": 2,
    "drop_rate": 0.0,
    "qkv_bias": False,
}


@pytest.fixture(scope="module")
def mesh8():
    if jax.device_count() < 8:
        pytest.skip("needs 8 (virtual) devices")
    return create_mesh(8, model_parallel=2)


def test_param_specs_match_rules():
    params = gpt2.init(jax.random.PRNGKey(0), TINY)
    specs = param_specs(params, sharding_rules_gpt2)
    assert specs["blocks"][0]["att"]["wq"]["w"] == jax.sharding.PartitionSpec(None, "model")
    assert specs["blocks"][0]["att"]["out_proj"]["w"] == jax.sharding.PartitionSpec("model", None)
    assert specs["tok_emb"]["w"] == jax.sharding.PartitionSpec("model", None)
    # norms replicated
    assert specs["final_ln"]["scale"] == jax.sharding.PartitionSpec()


def test_sharded_forward_matches_single_device(mesh8):
    params = gpt2.init(jax.random.PRNGKey(0), TINY)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0, 256)

    ref_logits, _, _ = gpt2.apply(params, TINY, tokens)

    with mesh8:
        sharded = shard_params(params, mesh8, sharding_rules_gpt2)

        @jax.jit
        def fwd(p, t):
            logits, _, _ = gpt2.apply(p, TINY, t)
            return logits

        out = fwd(sharded, tokens)

    assert jnp.allclose(ref_logits, out, atol=1e-4)


def test_dryrun_multichip():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(jax.device_count())
