"""Model configurations.

Plain-dict configs whose keys form the de-facto schema, matching the reference
key semantics one-for-one (reference: config.py:22-416) so that reference
configs map directly onto this framework. Dtypes are jnp dtypes instead of
torch dtypes.
"""

from pathlib import Path

import jax.numpy as jnp

# ----------- OG CONFIGS -----------

GPT_CONFIG_124M = {
    "vocab_size": 50257,
    "context_length": 1024,
    "emb_dim": 768,
    "n_heads": 12,
    "n_layers": 12,
    "drop_rate": 0.0,
    "qkv_bias": True,
}

LLAMA32_SMALL_CONFIG_1B = {
    "vocab_size": 128_256,
    "context_length": 131_072,
    "emb_dim": 2048,
    "n_heads": 32,
    "n_layers": 16,
    "hidden_dim": 8192,
    "num_kv_groups": 8,
    "rope_base": 500_000,
    "rope_freq": {
        "factor": 32.0,
        "alpha": 1.0,
        "beta": 4.0,
        "original_context_length": 8192,
    },
    "dtype": jnp.bfloat16,
}

# ----------- CUSTOM (small training) CONFIGS -----------

GPT_SMALL_CONFIG = {
    "vocab_size": 50304,  # multiple of 64/128 → MXU/VPU-friendly lane tiling
    "context_length": 256,
    "emb_dim": 768,
    "n_heads": 12,
    "n_layers": 12,
    "drop_rate": 0.0,
    "qkv_bias": False,
}

LLAMA32_SMALL_CONFIG = {
    "vocab_size": 50304,
    "context_length": 512,
    "emb_dim": 768,
    "n_heads": 12,
    "n_layers": 12,
    "num_kv_groups": 4,
    "hidden_dim": 4 * 768,
    "rope_base": 10_000,
    # YaRN / NTK-by-parts context-extension hparams (reference: config.py:76-82)
    "rope_freq": {
        "factor": 32.0,
        "alpha": 1.0,
        "beta": 32.0,
        "og_ctx_len": 4096,
        "ctx_len": 8192,
    },
    "dtype": jnp.float32,
}

GEMMA3_SMALL_CONFIG = {
    "vocab_size": 50304,
    "context_length": 512,
    "emb_dim": 768,
    "n_heads": 12,
    "n_layers": 12,
    "num_kv_groups": 6,
    "hidden_dim": 4 * 768,
    "window_size": 3,
    # 0 → all global attn; n_layers → all SWA; else alternate every Nth layer global
    "local_global_att_ratio": 5,
    "rope_base": 10_000,
    "rope_freq": {
        "factor": 32.0,
        "alpha": 1.0,
        "beta": 32.0,
        "og_ctx_len": 4096,
        "ctx_len": 8192,
    },
    "logits_softcap": 30.0,
    "dtype": jnp.float32,
}

DEEPSEEK_SMALL_CONFIG = {
    "vocab_size": 50304,
    "context_length": 512,
    "emb_dim": 768,
    "n_heads": 12,
    "n_layers": 12,
    "hidden_dim": 4 * 768,
    "num_ffn": 3,  # first layers dense FFN, remaining MoE (reference: config.py:116)
    "num_experts": 8,
    "num_shared_experts": 1,
    "top_k": 3,
    "moe_scaling_factor": "auto",  # "auto" → width scaled by 1/(top_k + num_shared)
    "moe_bias_update_rate": 1e-3,
    "mtp_depth": 2,
    "mtp_loss_coeff": 0.2,
    "rope_base": 10_000,
    "rope_freq": {
        "factor": 32.0,
        "alpha": 1.0,
        "beta": 32.0,
        "og_ctx_len": 4096,
        "ctx_len": 8192,
    },
    "dtype": jnp.float32,
}

MIMO_V2_SMALL_CONFIG = {
    "vocab_size": 50304,
    "context_length": 512,
    "emb_dim": 768,
    "n_layers": 12,
    "n_heads": 12,
    "num_swa_kv_groups": 4,
    "num_ga_kv_groups": 2,
    "head_dim": 64,
    "value_head_dim": 32,
    "hidden_dim": 4 * 768,
    "window_size": 128,
    "hybrid_ratio": 6,  # every 6th layer global attention; layer 0 also GA
    "rope_base": 10_000,
    "rope_base_ga": 640_000,
    "partial_rope_factor": 0.33,
    "mtp_depth": 2,
    "mtp_loss_coeff": 0.3,
    "num_experts": 8,
    "top_k": 2,
    "num_shared_experts": 0,
    "moe_scaling_factor": 1.0,
    "moe_bias_update_rate": 1e-3,
    "dtype": jnp.float32,
}

VIT_BASE_CONFIG = {
    "img_width": 224,
    "img_height": 224,
    "patch_size": 16,
    "num_channels": 3,
    "emb_dim": 768,
    "n_layers": 12,
    "n_heads": 12,
    "drop_rate": 0.1,
    "qkv_bias": True,
    "num_classes": 100,
}

TINY_VIT_CONFIG = {
    "img_width": 32,
    "img_height": 32,
    "patch_size": 4,
    "num_channels": 3,
    "emb_dim": 256,
    "n_layers": 12,
    "n_heads": 8,
    "drop_rate": 0.3,
    "qkv_bias": True,
    "num_classes": 10,
}


def gpt2_config_creator(gpt_size):
    """GPT-2 family configs (reference: config.py:189-214).

    gpt_size: "gpt_s" (124M) | "gpt_m" (355M) | "gpt_l" (774M) | "gpt_xl" (1558M)
    """
    model_configs = {
        "gpt_s": {"emb_dim": 768, "n_layers": 12, "n_heads": 12, "qkv_bias": True},
        "gpt_m": {"emb_dim": 1024, "n_layers": 24, "n_heads": 16, "qkv_bias": True},
        "gpt_l": {"emb_dim": 1280, "n_layers": 36, "n_heads": 20, "qkv_bias": True},
        "gpt_xl": {"emb_dim": 1600, "n_layers": 48, "n_heads": 25, "qkv_bias": True},
    }
    new_config = GPT_CONFIG_124M.copy()
    new_config.update(model_configs[gpt_size])
    return new_config


def qwen3_config_creator(model_size="0.6B", base_model=True):
    """Qwen3 dense/MoE configs mirroring HF config.json values
    (reference: config.py:217-324)."""
    base_config = {
        "vocab_size": 151_936,
        "rope_base": 1_000_000,
        "head_dim": 128,
        "dtype": jnp.bfloat16,
        "model_path": f"Qwen/Qwen3-{model_size}{'-Base' if base_model else ''}",
    }
    configs = {
        "temp_dense": {
            **base_config,
            "model_type": "dense",
            "emb_dim": 896,
            "n_layers": 12,
            "n_heads": 8,
            "num_kv_groups": 4,
            "hidden_dim": 4 * 896,
            "context_length": 512,
            "tie_embeddings": True,
        },
        "0.6B": {
            **base_config,
            "model_type": "dense",
            "emb_dim": 1024,
            "n_layers": 28,
            "n_heads": 16,
            "num_kv_groups": 8,
            "hidden_dim": 3072,
            "context_length": 40_960,
            "tie_embeddings": True,
        },
        "1.7B": {
            **base_config,
            "model_type": "dense",
            "emb_dim": 2048,
            "n_layers": 28,
            "n_heads": 16,
            "num_kv_groups": 8,
            "hidden_dim": 6144,
            "context_length": 40_960,
            "tie_embeddings": True,
        },
        "4B": {
            **base_config,
            "model_type": "dense",
            "emb_dim": 2560,
            "n_layers": 36,
            "n_heads": 32,
            "num_kv_groups": 8,
            "hidden_dim": 9728,
            "context_length": 40_960,
            "tie_embeddings": True,
        },
        "temp_moe": {
            **base_config,
            "model_type": "moe",
            "emb_dim": 896,
            "n_layers": 12,
            "n_heads": 8,
            "num_kv_groups": 4,
            "moe_hidden_dim": 4 * 896,
            "context_length": 512,
            "tie_embeddings": False,
            "num_experts": 16,
            "top_k": 4,
            "aux_loss_coef": 0.001,
        },
        "30B-A3B": {
            **base_config,
            "model_type": "moe",
            "emb_dim": 2048,
            "n_layers": 48,
            "n_heads": 32,
            "num_kv_groups": 4,
            "hidden_dim": 6144,
            "moe_hidden_dim": 768,
            "context_length": 40_960,
            "tie_embeddings": False,
            "num_experts": 128,
            "top_k": 8,
            "aux_loss_coef": 0.001,
        },
    }
    if model_size not in configs:
        raise ValueError(f"Unknown model size: {model_size}. Available sizes: {list(configs.keys())}")
    return configs[model_size]


QWEN3_NEXT_SMALL_CONFIG = {
    "vocab_size": 151_936,
    "rope_base": 10_000,
    "partial_rope_factor": 0.25,
    "n_layers": 8,
    "linear_sdpa_ratio": 4,  # GatedAttention every 4th block (3:1 hybrid)
    "dtype": jnp.bfloat16,
    "tie_embeddings": False,
    "emb_dim": 896,
    # gated attention
    "head_dim": 64,
    "n_heads": 8,
    "num_kv_groups": 4,
    "context_length": 512,
    # gated deltanet
    "linear_num_qk_heads": 4,
    "linear_num_value_heads": 8,
    "linear_qk_head_dim": 64,
    "linear_value_head_dim": 64,
    "linear_conv_kernel_size": 4,
    # moe
    "re_init_router_weights": True,
    "moe_hidden_dim": 4 * 896,
    "shared_expert_hidden_dim": 4 * 896,
    "num_experts": 8,
    "top_k": 2,
    "aux_loss_coef": 0.001,
    # training
    "p_dropout": 0.1,
}

# Qwen3.5-0.8B Vision + Text config (reference: config.py:361-416)
QWEN3_5_08B_CONFIG = {
    # ------ Text config keys ------
    "model_path": "Qwen/Qwen3.5-0.8B",
    "vocab_size": 248_320,
    "emb_dim": 1024,
    "hidden_dim": 3584,
    "n_layers": 24,
    "linear_sdpa_ratio": 4,
    "n_heads": 8,
    "num_kv_groups": 2,
    "head_dim": 256,
    "rope_base": 10_000_000,
    "partial_rope_factor": 0.25,
    "context_length": 8192,
    # GDN
    "linear_num_qk_heads": 16,
    "linear_num_value_heads": 16,
    "linear_qk_head_dim": 128,
    "linear_value_head_dim": 128,
    "linear_conv_kernel_size": 4,
    "tie_embeddings": True,
    "dtype": jnp.bfloat16,
    "p_dropout": 0.0,
    "training": False,
    # interleaved 3D (T, H, W) MRoPE sections; sum == head_dim * partial_rope_factor / 2
    "mrope_section": [11, 11, 10],
    # ------ Vision config keys ------
    "vision_n_layers": 12,
    "vision_emb_dim": 768,
    "vision_hidden_act": "gelu_pytorch_tanh",
    "vision_hidden_dim": 3072,
    "vision_num_heads": 12,
    "llm_d_in": 1024,
    "in_channels": 3,
    "patch_size": 16,
    "spatial_merge_size": 2,
    "temporal_patch_size": 2,
    "num_position_embeddings": 2304,
    "img_width": 384,
    "img_height": 384,
    "vision_rope_base": 10_000,
    # Special token IDs
    "image_token_id": 248056,
    "vision_start_token_id": 248053,
    "vision_end_token_id": 248054,
    "video_token_id": 248057,
    "image_mean": [0.5, 0.5, 0.5],
    "image_std": [0.5, 0.5, 0.5],
}

# ----------- ALIGNMENT -----------

# RPT toggle: add a phantom reward anchor (r=0) in GRPO z-score advantages to
# avoid std=0 when all rewards in a group share a sign (reference: config.py:419-425)
use_phantom_reward = False

# ----------- PATHS -----------

root_dir = Path(__file__).resolve().parent.parent

data_dir = root_dir / "data"
checkpoint_dir = root_dir / "checkpoints"

the_verdict_path = data_dir / "the-verdict.txt"
fineweb_train = data_dir / "fineweb_sample" / "train_fineweb.jsonl.gz"
fineweb_val = data_dir / "fineweb_sample" / "val_fineweb.jsonl.gz"

spam_train_path = data_dir / "spam_processed" / "train.csv"
spam_val_path = data_dir / "spam_processed" / "validation.csv"
spam_test_path = data_dir / "spam_processed" / "test.csv"

instruct_train_path = data_dir / "instruction_processed" / "train_set.json"
instruct_val_path = data_dir / "instruction_processed" / "val_set.json"
instruct_test_path = data_dir / "instruction_processed" / "test_set.json"

instruct_preference_train_path = data_dir / "instruct_preference_processed" / "train_set.json"
instruct_preference_val_path = data_dir / "instruct_preference_processed" / "val_set.json"
instruct_preference_test_path = data_dir / "instruct_preference_processed" / "test_set.json"

reasoning_train_path = data_dir / "gsm8k_processed" / "gsm8k_train.jsonl"
reasoning_val_path = data_dir / "gsm8k_processed" / "gsm8k_test.jsonl"


def model_dtype(cfg):
    """Resolve a config's parameter/computation dtype (default fp32)."""
    return cfg.get("dtype", jnp.float32)
