"""Long-prompt TTFT: flash cached-prefill vs materialized-scores sdpa.

Round-2 VERDICT (Weak #6): the flash router required sq == sk, so prefill
into a pre-allocated max_len cache — exactly where long-prompt TTFT is
decided — always materialized (s, max_len) scores. Round 3 threads a static
q_start through the kernel; this script measures prefill+first-token latency
for the Qwen3.5-0.8B hybrid text model at growing prompt lengths, flash
prefill ON vs OFF.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_ttft_long_prompt.py
"""

import statistics
import time

import jax
import jax.numpy as jnp

from llm_quest_tpu import config
from llm_quest_tpu.inference import generate as gen
from llm_quest_tpu.models import qwen3_5

PROMPTS = (1024, 2048, 4096)
REPS = 9


class TextModel:
    apply = staticmethod(qwen3_5.apply_text)
    init_cache = staticmethod(qwen3_5.init_cache)


def ttft(params, cfg, prompt):
    def first_token():
        out = gen.generate_kv_cache(
            TextModel, params, cfg, prompt, max_gen=1, temp=0.0, eos_ids=-1, pad_id=0
        )
        return int(out["sequences"][0, -1])

    tok = first_token()  # compile
    samples = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        first_token()
        samples.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(samples), tok


def ttft_dense(params, cfg, prompt):
    from llm_quest_tpu.models import qwen3

    def first_token():
        out = gen.generate_kv_cache(
            qwen3, params, cfg, prompt, max_gen=1, temp=0.0, eos_ids=-1, pad_id=0
        )
        return int(out["sequences"][0, -1])

    tok = first_token()
    samples = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        first_token()
        samples.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(samples), tok


def main():
    assert jax.default_backend() == "tpu", jax.devices()
    base = dict(config.QWEN3_5_08B_CONFIG, dtype=jnp.bfloat16)
    params = qwen3_5.init_text(jax.random.PRNGKey(0), base)

    print("Qwen3.5-0.8B hybrid (6/24 attention layers):", flush=True)
    print(f"{'prompt':>8} {'sdpa-prefill':>14} {'flash-prefill':>14} {'speedup':>9}", flush=True)
    for plen in PROMPTS:
        cfg_len = dict(base, context_length=plen + 8)
        prompt = jax.random.randint(jax.random.PRNGKey(1), (1, plen), 0, 1000)
        t_sdpa, tok_a = ttft(params, dict(cfg_len, use_flash=False), prompt)
        t_flash, tok_b = ttft(params, dict(cfg_len, use_flash=True), prompt)
        match = "token-match" if tok_a == tok_b else f"TOKEN MISMATCH {tok_a}!={tok_b}"
        print(f"{plen:8d} {t_sdpa:11.1f} ms {t_flash:11.1f} ms {t_sdpa/t_flash:8.2f}x  ({match})",
              flush=True)

    # dense-attention model: every layer prefills through attention — the
    # shape class where flash cached-prefill actually decides TTFT
    from llm_quest_tpu.models import qwen3

    dense = {
        "model_type": "dense", "vocab_size": 32_000, "context_length": 8192 + 8,
        "emb_dim": 1024, "hidden_dim": 3072, "n_layers": 16, "n_heads": 16,
        "num_kv_groups": 8, "head_dim": 64, "rope_base": 1_000_000,
        "tie_embeddings": True, "dtype": jnp.bfloat16,
    }
    dparams = qwen3.init(jax.random.PRNGKey(2), dense)
    print("\nQwen3-dense ~400M (16/16 attention layers):", flush=True)
    print(f"{'prompt':>8} {'sdpa-prefill':>14} {'flash-prefill':>14} {'speedup':>9}", flush=True)
    for plen in (2048, 4096, 8192):
        cfg_len = dict(dense, context_length=plen + 8)
        prompt = jax.random.randint(jax.random.PRNGKey(1), (1, plen), 0, 32_000)
        t_sdpa, tok_a = ttft_dense(dparams, dict(cfg_len, use_flash=False), prompt)
        t_flash, tok_b = ttft_dense(dparams, dict(cfg_len, use_flash=True), prompt)
        match = "token-match" if tok_a == tok_b else f"TOKEN MISMATCH {tok_a}!={tok_b}"
        print(f"{plen:8d} {t_sdpa:11.1f} ms {t_flash:11.1f} ms {t_sdpa/t_flash:8.2f}x  ({match})",
              flush=True)


if __name__ == "__main__":
    main()
