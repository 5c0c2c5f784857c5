"""DeepSeek-V3 tests: MLA, MTP loss chain, MoE bias updates, MTP collator."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from llm_quest_tpu.data.datasets import collate_function_mtp
from llm_quest_tpu.inference import generate as gen
from llm_quest_tpu.models import deepseek_v3 as dsv3

TINY = {
    "vocab_size": 128,
    "context_length": 64,
    "emb_dim": 48,
    "n_heads": 4,
    "n_layers": 4,
    "hidden_dim": 96,
    "num_ffn": 2,
    "num_experts": 4,
    "num_shared_experts": 1,
    "top_k": 1,
    "moe_scaling_factor": 1,
    "moe_bias_update_rate": 1e-3,
    "mtp_depth": 2,
    "mtp_loss_coeff": 0.2,
    "rope_base": 10_000,
    "q_rank": 64,
    "dtype": jnp.float32,
}


@pytest.mark.slow
def test_forward_shapes_and_moe_layout():
    params = dsv3.init(jax.random.PRNGKey(0), TINY)
    # first num_ffn layers dense, rest MoE
    assert "ffn" in params["blocks"][0] and "ffn" in params["blocks"][1]
    assert "moe" in params["blocks"][2] and "moe" in params["blocks"][3]
    x = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, 128)
    logits, cache, aux = dsv3.apply(params, TINY, x)
    assert logits.shape == (2, 10, 128)
    assert aux["hidden"].shape == (2, 10, 48)
    assert len(aux["moe_counts"]) == 2
    assert jnp.all(jnp.isfinite(logits))


def test_mla_shapes():
    hd, dhd = dsv3.head_dims(TINY)
    assert (hd, dhd) == (12, 6)
    params = dsv3.init(jax.random.PRNGKey(0), TINY)
    att = params["blocks"][0]["att"]
    assert att["wq_down"]["w"].shape == (48, 64)  # q_rank override
    assert att["wkv_down"]["w"].shape == (48, 4 * hd)
    assert att["wk_decoup"]["w"].shape == (48, dhd)


@pytest.mark.slow
def test_mtp_loss_and_grads():
    params = dsv3.init(jax.random.PRNGKey(0), TINY)
    batch = [[1, 2, 3, 4, 5, 6], [7, 8, 9, 10]]
    coll = collate_function_mtp(batch, mtp_depth=2, pad_token_id=0)
    x = jnp.asarray(coll["input_ids"])
    y = jnp.asarray(coll["targets"])
    sx = [jnp.asarray(a) for a in coll["shifted_inputs"]]
    sy = [jnp.asarray(a) for a in coll["shifted_targets"]]

    def loss_fn(p):
        l, _ = dsv3.loss(p, TINY, x, y, sx, sy)
        return l

    total, grads = jax.value_and_grad(loss_fn)(params)
    assert jnp.isfinite(total)
    # MTP modules receive gradients (they would not if logits came from the
    # down-projected input only — the reference divergence we fixed)
    g_mtp = grads["mtp"][0]["trf_block"]["att"]["wq_down"]["w"]
    assert float(jnp.abs(g_mtp).max()) > 0

    # loss without MTP < full loss structure check
    main_only, _ = dsv3.loss(params, TINY, x, y, training=False)
    assert float(main_only) < float(total)


def test_mtp_collator_matches_reference_vectors():
    """Hand vectors from reference deepseek_model.py:144-177."""
    batch = [[1, 2, 3, 4, 5, 50256], [6, 7, 8, 50256], [9, 10, 11, 12, 50256]]
    coll = collate_function_mtp(batch, mtp_depth=2)
    # base targets: shifted with one trailing pad then -100
    np.testing.assert_array_equal(
        coll["targets"],
        [[2, 3, 4, 5, 50256, 50256], [7, 8, 50256, 50256, -100, -100], [10, 11, 12, 50256, 50256, -100]],
    )
    np.testing.assert_array_equal(
        coll["shifted_inputs"][0][0], [2, 3, 4, 5, 50256, 50256]
    )
    np.testing.assert_array_equal(
        coll["shifted_targets"][0][0], [3, 4, 5, 50256, 50256, -100]
    )
    np.testing.assert_array_equal(
        coll["shifted_inputs"][1][0], [3, 4, 5, 50256, 50256, 50256]
    )


@pytest.mark.slow
def test_bias_update_changes_only_moe_biases():
    params = dsv3.init(jax.random.PRNGKey(0), TINY)
    x = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 128)
    _, _, aux = dsv3.apply(params, TINY, x)
    new = dsv3.update_moe_biases(params, TINY, aux["moe_counts"])
    assert not jnp.allclose(new["blocks"][2]["moe"]["biases"], params["blocks"][2]["moe"]["biases"])
    assert jnp.allclose(new["blocks"][2]["moe"]["gate_w"], params["blocks"][2]["moe"]["gate_w"])


@pytest.mark.slow
def test_cached_decode_matches_uncached():
    params = dsv3.init(jax.random.PRNGKey(0), TINY)
    prompt = jax.random.randint(jax.random.PRNGKey(2), (1, 5), 0, 128)
    cached = gen.generate_kv_cache(dsv3, params, TINY, prompt, max_gen=6, temp=0.0, eos_ids=-1, pad_id=0)
    uncached = gen.generate_loop_uncached(dsv3, params, TINY, prompt, max_gen=6, temp=0.0)
    assert cached["sequences"][0].tolist() == uncached[0].tolist()


@pytest.mark.slow
def test_deepseek_mtp_train_step():
    """Full deepseek engine step: loss drops AND the MoE biases move
    (non-gradient state folded after the optimizer step)."""
    from llm_quest_tpu.training.engine import make_optimizer
    from llm_quest_tpu.training.mtp_engine import make_deepseek_train_step

    params = dsv3.init(jax.random.PRNGKey(0), TINY)
    optimizer = make_optimizer(1e-3)
    opt_state = optimizer.init(params)
    step = make_deepseek_train_step(TINY, optimizer)

    batch_raw = [[1, 2, 3, 4, 5, 6, 7, 8], [7, 8, 9, 10, 11, 12]]
    coll = collate_function_mtp(batch_raw, mtp_depth=2, pad_token_id=0)
    batch = {
        "input_ids": jnp.asarray(coll["input_ids"]),
        "targets": jnp.asarray(coll["targets"]),
        "shifted_inputs": [jnp.asarray(a) for a in coll["shifted_inputs"]],
        "shifted_targets": [jnp.asarray(a) for a in coll["shifted_targets"]],
    }
    rng = jax.random.PRNGKey(0)
    biases0 = params["blocks"][2]["moe"]["biases"] + 0  # copy: params get donated

    params, opt_state, loss0 = step(params, opt_state, batch, rng)
    assert not jnp.allclose(params["blocks"][2]["moe"]["biases"], biases0)
    for _ in range(4):
        params, opt_state, loss = step(params, opt_state, batch, rng)
    assert float(loss) < float(loss0)


@pytest.mark.slow
def test_mimo_mtp_train_step():
    from llm_quest_tpu.models import mimo_v2_flash as mimo
    from llm_quest_tpu.training.engine import make_optimizer
    from llm_quest_tpu.training.mtp_engine import make_mimo_train_step

    cfg = {
        "vocab_size": 128, "context_length": 64, "emb_dim": 32, "n_layers": 3, "n_heads": 4,
        "num_swa_kv_groups": 4, "num_ga_kv_groups": 2, "head_dim": 12, "value_head_dim": 8,
        "hidden_dim": 64, "window_size": 4, "hybrid_ratio": 3, "rope_base": 10_000,
        "rope_base_ga": 640_000, "partial_rope_factor": 0.33, "mtp_depth": 1,
        "mtp_loss_coeff": 0.3, "num_experts": 4, "top_k": 2, "num_shared_experts": 0,
        "moe_scaling_factor": 1, "moe_bias_update_rate": 1e-3, "dtype": jnp.float32,
    }
    params = mimo.init(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(1e-3)
    opt_state = optimizer.init(params)
    step = make_mimo_train_step(cfg, optimizer)

    x = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, 128)
    batch = {"input_ids": x, "targets": jnp.roll(x, -1, -1)}
    rng = jax.random.PRNGKey(0)
    params, opt_state, loss0 = step(params, opt_state, batch, rng)
    for _ in range(4):
        params, opt_state, loss = step(params, opt_state, batch, rng)
    assert float(loss) < float(loss0)
