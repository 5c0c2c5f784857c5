"""Qwen3.5 text-only generation with the hybrid cache
(reference: qwen/qwen3_5/qwen3_5_generate_text_only.py).

Demonstrates the hybrid (KV + conv + recurrent) cache path through the
generic whole-generation jitted decode engine. With HF weights present it
loads Qwen3.5-0.8B; otherwise a random-weight smoke config runs end-to-end.
"""

import jax
import jax.numpy as jnp

from llm_quest_tpu import config
from llm_quest_tpu.inference import generate as gen
from llm_quest_tpu.models import qwen3_5

MAX_GEN = 32
TEMP = 0.0
TOP_K = None


class TextModel:
    apply = staticmethod(qwen3_5.apply_text)
    init_cache = staticmethod(qwen3_5.init_cache)


if __name__ == "__main__":
    # random-weight smoke config (same structure as QWEN3_5_08B_CONFIG); with
    # local HF weights, swap in weights/interop.py::load_hf_qwen3_5_vlm and
    # the real tokenizer exactly as scripts/qwen3_5_generate_multimodal.py does
    cfg = dict(
        config.QWEN3_5_08B_CONFIG, vocab_size=512, emb_dim=64, hidden_dim=128,
        n_layers=4, n_heads=4, num_kv_groups=2, head_dim=16, context_length=256,
        linear_num_qk_heads=2, linear_num_value_heads=4, linear_qk_head_dim=8,
        linear_value_head_dim=8, mrope_section=[1, 1, 0], dtype=jnp.float32,
    )
    params = qwen3_5.init_text(jax.random.PRNGKey(0), cfg)
    prompt = jnp.asarray([[11, 42, 7, 99, 23, 5]])

    out = gen.generate_kv_cache(
        TextModel, params, cfg, prompt, max_gen=MAX_GEN, temp=TEMP, top_k=TOP_K, eos_ids=-1, pad_id=0
    )
    print("generated ids:", out["sequences"][0, prompt.shape[1]:].tolist())
