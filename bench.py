"""Headline benchmark — prints ONE JSON line for the driver.

Current headline: GPT-2 124M batched KV-cache decode throughput (tokens/sec)
on one chip, greedy. vs_baseline compares against the reference's best
published tokens/sec on its own hardware (47.3 tok/s avg speculative-decoding
throughput, speculative_decoding/README.md:67 — the only tok/s it publishes).

Upgraded to the BASELINE.json north-star metrics (ViT images/sec/chip,
Qwen3.5 VLM decode tok/s/chip) as those paths land.
"""

import json
import time

import jax
import jax.numpy as jnp


def bench_gpt2_decode(batch=8, prompt_len=32, max_gen=128):
    from llm_quest_tpu.config import GPT_CONFIG_124M
    from llm_quest_tpu.inference import generate as gen
    from llm_quest_tpu.models import gpt2

    cfg = dict(GPT_CONFIG_124M)
    cfg["dtype"] = jnp.bfloat16
    params = gpt2.init(jax.random.PRNGKey(0), cfg)

    prompt = jnp.ones((batch, prompt_len), dtype=jnp.int32)
    mask = jnp.ones((batch, prompt_len), dtype=bool)

    def run():
        out = gen.generate_batched_kv_cache(
            gpt2, params, cfg, prompt, mask, max_gen=max_gen, temp=0.0, eos_ids=-1, pad_id=50256
        )
        jax.block_until_ready(out["sequences"])
        return out

    run()  # compile
    n_iters = 3
    t0 = time.perf_counter()
    for _ in range(n_iters):
        run()
    dt = (time.perf_counter() - t0) / n_iters
    return batch * max_gen / dt


if __name__ == "__main__":
    tok_s = bench_gpt2_decode()
    baseline = 47.3  # reference speculative_decoding/README.md:67
    print(
        json.dumps(
            {
                "metric": "gpt2_124m_decode_tok_s_chip",
                "value": round(tok_s, 1),
                "unit": "tokens/sec/chip",
                "vs_baseline": round(tok_s / baseline, 2),
            }
        )
    )
