"""Weight-interop tests with synthetic HF-shaped state dicts (no network)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from llm_quest_tpu.models import gpt2, qwen3, qwen3_5
from llm_quest_tpu.weights import interop


def test_flatten_unflatten_roundtrip():
    params = {"a": {"b": jnp.ones((2, 3)), "c": [jnp.zeros((4,)), jnp.ones((1,))]}}
    flat = interop.flatten_params(params)
    assert set(flat) == {"a/b", "a/c/0", "a/c/1"}
    new = interop.unflatten_into(params, {"a/c/0": np.full((4,), 7.0)})
    assert jnp.allclose(new["a"]["c"][0], 7.0)
    assert jnp.allclose(new["a"]["b"], 1.0)  # untouched


def test_convert_weights_rules_and_transpose():
    target = {"blocks/0/att/wq/w": jnp.zeros((8, 4))}
    src = {"model.layers.0.self_attn.q_proj.weight": np.arange(32.0).reshape(4, 8)}
    rules = [("model.layers.", "blocks/"), (".self_attn.q_proj.weight", "/att/wq/w", True)]
    out = interop.convert_weights(src, target, rules, log=lambda *_: None)
    assert out["blocks/0/att/wq/w"].shape == (8, 4)
    np.testing.assert_array_equal(out["blocks/0/att/wq/w"], np.arange(32.0).reshape(4, 8).T)


def test_gpt2_hf_loading_with_fused_qkv_split():
    cfg = {"vocab_size": 64, "context_length": 32, "emb_dim": 16, "n_heads": 2, "n_layers": 1,
           "drop_rate": 0.0, "qkv_bias": True}
    params = gpt2.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)

    state = {
        "wte.weight": rng.normal(size=(64, 16)).astype(np.float32),
        "wpe.weight": rng.normal(size=(32, 16)).astype(np.float32),
        "ln_f.weight": np.ones(16, np.float32),
        "ln_f.bias": np.zeros(16, np.float32),
        "h.0.attn.c_attn.weight": rng.normal(size=(16, 48)).astype(np.float32),
        "h.0.attn.c_attn.bias": rng.normal(size=(48,)).astype(np.float32),
        "h.0.attn.c_proj.weight": rng.normal(size=(16, 16)).astype(np.float32),
        "h.0.attn.c_proj.bias": rng.normal(size=(16,)).astype(np.float32),
        "h.0.mlp.c_fc.weight": rng.normal(size=(16, 64)).astype(np.float32),
        "h.0.mlp.c_fc.bias": rng.normal(size=(64,)).astype(np.float32),
        "h.0.mlp.c_proj.weight": rng.normal(size=(64, 16)).astype(np.float32),
        "h.0.mlp.c_proj.bias": rng.normal(size=(16,)).astype(np.float32),
        "h.0.ln_1.weight": np.ones(16, np.float32),
        "h.0.ln_1.bias": np.zeros(16, np.float32),
        "h.0.ln_2.weight": np.ones(16, np.float32),
        "h.0.ln_2.bias": np.zeros(16, np.float32),
    }
    logs = []
    loaded = interop.load_hf_gpt2(params, state, log=logs.append)
    # fused qkv split correctness
    np.testing.assert_allclose(loaded["blocks"][0]["att"]["wq"]["w"], state["h.0.attn.c_attn.weight"][:, :16])
    np.testing.assert_allclose(loaded["blocks"][0]["att"]["wv"]["w"], state["h.0.attn.c_attn.weight"][:, 32:])
    np.testing.assert_allclose(loaded["blocks"][0]["att"]["wk"]["b"], state["h.0.attn.c_attn.bias"][16:32])
    # tied out head
    np.testing.assert_allclose(loaded["out"]["w"], state["wte.weight"].T)
    assert "Loaded" in logs[0]
    # forward still works with loaded weights
    logits, _, _ = gpt2.apply(loaded, cfg, jnp.zeros((1, 4), jnp.int32))
    assert jnp.all(jnp.isfinite(logits))


def test_qwen3_moe_expert_stacking():
    cfg = {
        "model_type": "moe", "vocab_size": 32, "context_length": 16, "emb_dim": 8, "n_layers": 1,
        "n_heads": 2, "num_kv_groups": 1, "head_dim": 4, "moe_hidden_dim": 12, "num_experts": 2,
        "top_k": 1, "aux_loss_coef": 0.001, "rope_base": 10_000, "tie_embeddings": True,
        "dtype": jnp.float32,
    }
    params = qwen3.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)

    def lin(o, i):
        return rng.normal(size=(o, i)).astype(np.float32)

    state = {
        "model.embed_tokens.weight": lin(32, 8),
        "model.norm.weight": np.ones(8, np.float32),
        "model.layers.0.self_attn.q_proj.weight": lin(8, 8),
        "model.layers.0.self_attn.k_proj.weight": lin(4, 8),
        "model.layers.0.self_attn.v_proj.weight": lin(4, 8),
        "model.layers.0.self_attn.o_proj.weight": lin(8, 8),
        "model.layers.0.self_attn.q_norm.weight": np.ones(4, np.float32),
        "model.layers.0.self_attn.k_norm.weight": np.ones(4, np.float32),
        "model.layers.0.input_layernorm.weight": np.ones(8, np.float32),
        "model.layers.0.post_attention_layernorm.weight": np.ones(8, np.float32),
        "model.layers.0.mlp.gate.weight": lin(2, 8),
        "model.layers.0.mlp.experts.0.gate_proj.weight": lin(12, 8),
        "model.layers.0.mlp.experts.0.up_proj.weight": lin(12, 8),
        "model.layers.0.mlp.experts.0.down_proj.weight": lin(8, 12),
        "model.layers.0.mlp.experts.1.gate_proj.weight": lin(12, 8),
        "model.layers.0.mlp.experts.1.up_proj.weight": lin(12, 8),
        "model.layers.0.mlp.experts.1.down_proj.weight": lin(8, 12),
    }
    loaded = interop.load_hf_qwen3(params, cfg, state, log=lambda *_: None)
    moe = loaded["blocks"][0]["moe"]
    assert moe["experts"]["lin1"].shape == (2, 8, 12)
    np.testing.assert_allclose(moe["experts"]["gate"][1], state["model.layers.0.mlp.experts.1.gate_proj.weight"].T)
    np.testing.assert_allclose(moe["gate_w"], state["model.layers.0.mlp.gate.weight"].T)
    logits, _, _ = qwen3.apply(loaded, cfg, jnp.zeros((1, 4), jnp.int32))
    assert jnp.all(jnp.isfinite(logits))


@pytest.mark.slow
def test_qwen3_5_vlm_loading():
    cfg = {
        "vocab_size": 64, "emb_dim": 16, "hidden_dim": 32, "n_layers": 2, "linear_sdpa_ratio": 2,
        "n_heads": 2, "num_kv_groups": 1, "head_dim": 8, "rope_base": 10_000,
        "partial_rope_factor": 0.25, "context_length": 32, "linear_num_qk_heads": 1,
        "linear_num_value_heads": 2, "linear_qk_head_dim": 4, "linear_value_head_dim": 4,
        "linear_conv_kernel_size": 3, "tie_embeddings": True, "dtype": jnp.float32,
        "mrope_section": [1, 1, 0],
        "vision_n_layers": 1, "vision_emb_dim": 8, "vision_hidden_dim": 16, "vision_num_heads": 2,
        "llm_d_in": 16, "in_channels": 3, "patch_size": 4, "spatial_merge_size": 2,
        "temporal_patch_size": 2, "num_position_embeddings": 16, "img_width": 8, "img_height": 8,
        "vision_rope_base": 10_000, "image_token_id": 60,
    }
    params = qwen3_5.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)

    def lin(o, i):
        return rng.normal(size=(o, i)).astype(np.float32)

    d_qk, d_vg, fused = 4, 8, 16
    state = {
        # text: layer 0 = GDN, layer 1 = attention
        "model.language_model.embed_tokens.weight": lin(64, 16),
        "model.language_model.norm.weight": np.ones(16, np.float32),
        "model.language_model.layers.0.linear_attn.A_log": np.zeros(2, np.float32),
        "model.language_model.layers.0.linear_attn.dt_bias": np.ones(2, np.float32),
        "model.language_model.layers.0.linear_attn.in_proj_qkv.weight": lin(fused, 16),
        "model.language_model.layers.0.linear_attn.in_proj_z.weight": lin(d_vg, 16),
        "model.language_model.layers.0.linear_attn.in_proj_b.weight": lin(2, 16),
        "model.language_model.layers.0.linear_attn.in_proj_a.weight": lin(2, 16),
        "model.language_model.layers.0.linear_attn.conv1d.weight": rng.normal(size=(fused, 1, 3)).astype(np.float32),
        "model.language_model.layers.0.linear_attn.norm.weight": np.ones(4, np.float32),
        "model.language_model.layers.0.linear_attn.out_proj.weight": lin(16, d_vg),
        "model.language_model.layers.1.self_attn.q_proj.weight": lin(32, 16),  # fused q+gate
        "model.language_model.layers.1.self_attn.k_proj.weight": lin(8, 16),
        "model.language_model.layers.1.self_attn.v_proj.weight": lin(8, 16),
        "model.language_model.layers.1.self_attn.o_proj.weight": lin(16, 16),
        "model.language_model.layers.1.self_attn.q_norm.weight": np.zeros(8, np.float32),
        "model.language_model.layers.1.self_attn.k_norm.weight": np.zeros(8, np.float32),
        # vision
        "model.visual.patch_embed.proj.weight": rng.normal(size=(8, 3, 2, 4, 4)).astype(np.float32),
        "model.visual.patch_embed.proj.bias": np.zeros(8, np.float32),
        "model.visual.pos_embed.weight": lin(16, 8),
        "model.visual.blocks.0.attn.qkv.weight": lin(24, 8),
        "model.visual.blocks.0.attn.qkv.bias": np.zeros(24, np.float32),
        "model.visual.merger.linear_fc2.weight": lin(16, 32),
        "model.visual.merger.linear_fc2.bias": np.zeros(16, np.float32),
    }
    loaded = interop.load_hf_qwen3_5_vlm(params, cfg, state, log=lambda *_: None)
    np.testing.assert_allclose(
        loaded["text"]["blocks"][0]["att"]["conv1d"]["w"],
        state["model.language_model.layers.0.linear_attn.conv1d.weight"][:, 0, :],
    )
    np.testing.assert_allclose(
        loaded["text"]["blocks"][1]["att"]["wqg"]["w"],
        state["model.language_model.layers.1.self_attn.q_proj.weight"].T,
    )
    np.testing.assert_allclose(
        loaded["vision"]["merge"]["lin2"]["w"], state["model.visual.merger.linear_fc2.weight"].T
    )
    # partially-loaded model still runs
    logits, _, _ = qwen3_5.apply_text(loaded["text"], cfg, jnp.zeros((1, 4), jnp.int32))
    assert jnp.all(jnp.isfinite(logits))
