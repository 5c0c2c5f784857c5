"""Qwen3.5 VLM multimodal generation entry script
(reference: qwen/qwen3_5/qwen3_5_generate_multimodal.py).

Pipeline: preprocess image (resize→normalize→temporal-duplicate→5D) →
expand image placeholders in the prompt → encode ONCE → hybrid-cache scan
decode (the reference re-encodes every step; see models/qwen3_5.py).

With HF weights/tokenizer present it loads Qwen3.5-0.8B; otherwise it runs a
random-weight smoke configuration end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np

from llm_quest_tpu import config
from llm_quest_tpu.models import qwen3_5

MAX_GEN = 32
TEMP = 0.0


def preprocess_image(image_hw3, cfg):
    """resize(assumed done) → normalize → temporal duplicate → (1, c, t, h, w)
    (reference: qwen3_5_generate_multimodal.py:38-46)."""
    img = image_hw3.astype(np.float32) / 255.0
    mean = np.asarray(cfg["image_mean"], np.float32)
    std = np.asarray(cfg["image_std"], np.float32)
    img = (img - mean) / std
    img = img.transpose(2, 0, 1)  # (c, h, w)
    img = np.stack([img] * cfg["temporal_patch_size"], axis=1)  # duplicate frames
    return img[None]  # (1, c, t, h, w)


def expand_placeholders(prompt_ids, cfg, num_vision_tokens):
    """vision_start + image_token × N + vision_end injected into the prompt
    (reference: :60-76)."""
    return (
        prompt_ids
        + [cfg["vision_start_token_id"]]
        + [cfg["image_token_id"]] * num_vision_tokens
        + [cfg["vision_end_token_id"]]
    )


if __name__ == "__main__":
    try:
        cfg = dict(config.QWEN3_5_08B_CONFIG)
        params = qwen3_5.init(jax.random.PRNGKey(0), cfg)
        from llm_quest_tpu.weights.interop import download_hf_weights, load_hf_qwen3_5_vlm

        state = download_hf_weights(cfg["model_path"])
        params = load_hf_qwen3_5_vlm(params, cfg, state)
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(cfg["model_path"])
        prompt_ids = tok.encode("Describe this image.")
        eos = tok.eos_token_id
    except Exception as e:  # offline smoke config
        print(f"(HF weights unavailable: {e}) — running random-weight smoke config")
        cfg = dict(
            config.QWEN3_5_08B_CONFIG,
            vocab_size=512, emb_dim=64, hidden_dim=128, n_layers=4, n_heads=4, num_kv_groups=2,
            head_dim=16, linear_num_qk_heads=2, linear_num_value_heads=4, linear_qk_head_dim=8,
            linear_value_head_dim=8, vision_n_layers=2, vision_emb_dim=32, vision_hidden_dim=64,
            vision_num_heads=2, llm_d_in=64, img_width=64, img_height=64, num_position_embeddings=64,
            context_length=512, mrope_section=[1, 1, 0], dtype=jnp.float32,
            image_token_id=500, vision_start_token_id=501, vision_end_token_id=502,
        )
        params = qwen3_5.init(jax.random.PRNGKey(0), cfg)
        prompt_ids = [1, 2, 3, 4]
        eos = -1

    image = np.random.default_rng(0).integers(0, 255, size=(cfg["img_height"], cfg["img_width"], 3))
    pixels = jnp.asarray(preprocess_image(image, cfg))

    nh, nw = qwen3_5.n_patches_hw(cfg)
    n_merged = (nh // cfg["spatial_merge_size"]) * (nw // cfg["spatial_merge_size"])
    ids = jnp.asarray([expand_placeholders(list(prompt_ids), cfg, n_merged)], jnp.int32)

    out = qwen3_5.generate_multimodal(params, cfg, ids, pixels, max_gen=MAX_GEN, temp=TEMP, eos_ids=eos, pad_id=0)
    print("generated ids:", out["sequences"][0, ids.shape[1]:].tolist())
