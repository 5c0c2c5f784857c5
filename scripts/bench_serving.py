"""Serving-style decode throughput sweep on the real chip.

Batched cached decode (the production serving shape) across batch sizes for
two architectures the reference targets:
- Qwen3.5-0.8B text (hybrid FusedGDN/MRoPE — the BASELINE.json decode path)
- Qwen3-MoE (sparse experts through the ragged-dot dispatch)

Prints per-batch tokens/sec/chip and per-sequence latency, then one JSON
summary line. The whole generation runs as one jitted program per shape
(inference/generate.py's jit cache), so numbers are tunnel-safe.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/llm_quest_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from llm_quest_tpu import config  # noqa: E402
from llm_quest_tpu.inference import generate as gen  # noqa: E402
from llm_quest_tpu.models import qwen3, qwen3_5  # noqa: E402

PROMPT_LEN = 32
MAX_GEN = 64
BATCHES = [int(b) for b in os.environ.get("SERVE_BATCHES", "1,8,32,128").split(",")]

QWEN3_MOE_CFG = {
    "model_type": "moe", "vocab_size": 32_000, "context_length": 256, "emb_dim": 1024,
    "n_layers": 12, "n_heads": 16, "num_kv_groups": 8, "head_dim": 64, "hidden_dim": 2816,
    "moe_hidden_dim": 704, "num_experts": 16, "top_k": 4,
    "aux_loss_coef": 0.001, "re_init_router_weights": False, "rope_base": 10_000,
    "tie_embeddings": True, "qk_norm": True, "dtype": jnp.bfloat16,
}


class Qwen35Text:
    apply = staticmethod(qwen3_5.apply_text)
    init_cache = staticmethod(qwen3_5.init_cache)


def sweep(name, model, params, cfg):
    rows = {}
    for b in BATCHES:
        prompt = jax.random.randint(jax.random.PRNGKey(1), (b, PROMPT_LEN), 0, 1000)

        def run():
            out = gen.generate_kv_cache(
                model, params, cfg, prompt, max_gen=MAX_GEN, temp=0.0, eos_ids=-1, pad_id=0
            )
            return int(out["sequences"][0, -1])

        run()  # compile
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
        tok_s = b * MAX_GEN / dt
        ms_seq = dt * 1e3
        rows[f"b{b}"] = {"tok_s": round(tok_s, 1), "latency_ms": round(ms_seq, 1)}
        print(f"{name} b={b:4d}: {tok_s:9.1f} tok/s/chip   {ms_seq:7.1f} ms for {MAX_GEN} tok/seq", flush=True)
    return rows


def main():
    cfg35 = dict(config.QWEN3_5_08B_CONFIG, dtype=jnp.bfloat16)
    p35 = qwen3_5.init_text(jax.random.PRNGKey(0), cfg35)
    r35 = sweep("qwen3.5-0.8B ", Qwen35Text, p35, cfg35)
    del p35

    pmoe = qwen3.init(jax.random.PRNGKey(0), QWEN3_MOE_CFG)
    rmoe = sweep("qwen3-moe-1B ", qwen3, pmoe, QWEN3_MOE_CFG)

    print(json.dumps({"qwen3_5_text": r35, "qwen3_moe": rmoe}), flush=True)


if __name__ == "__main__":
    main()
