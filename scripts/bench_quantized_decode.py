"""Weight-only int8 decode throughput vs bf16 on the real chip.

Small-batch cached decode re-reads every weight per token, so it is
HBM-bandwidth-bound: int8 weights (ops/quantization.py) halve the weight
bytes and should lift tokens/sec toward the bytes ratio until the batch is
large enough that the MXU (not HBM) is the limit. This script measures that
curve on Qwen3.5-0.8B text (the BASELINE.json decode path) and prints one
JSON summary line.

The quantized checkpoint runs through the UNCHANGED model/engine — the
int8 dispatch lives entirely in ops.linear.linear.
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
from llm_quest_tpu.models import qwen3_5  # noqa: E402
from llm_quest_tpu.ops.quantization import (  # noqa: E402
    quantize_params_int8,
    quantized_byte_fraction,
)

PROMPT_LEN = 32
MAX_GEN = 64
BATCHES = [int(b) for b in os.environ.get("QUANT_BATCHES", "1,8,32").split(",")]
BLOCK = os.environ.get("QUANT_BLOCK")  # e.g. 128 for sub-channel scales
BITS = int(os.environ.get("QUANT_BITS", "8"))  # 8 | 4 (s4 packs 2/byte in HBM)
WHICH = os.environ.get("QUANT_MODEL", "qwen3_5")  # qwen3_5 | moe
# per-row int8 tok_emb (tied-head models stream the table per token through
# the head matmul — the largest single matrix at 248,320 vocab)
QUANT_EMB = os.environ.get("QUANT_EMB", "1") == "1"

# same 1B-ish MoE as scripts/bench_serving.py — tests the ragged_dot int8
# path (per-expert scales, row-indexed epilogue) at serving scale
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
        best = min(
            (lambda t0: (run(), time.perf_counter() - t0)[1])(time.perf_counter())
            for _ in range(3)
        )
        tok_s = b * MAX_GEN / best
        rows[f"b{b}"] = {"tok_s": round(tok_s, 1), "latency_ms": round(best * 1e3, 1)}
        print(f"{name} b={b:4d}: {tok_s:9.1f} tok/s/chip   {best * 1e3:7.1f} ms", flush=True)
    return rows


def main():
    if WHICH == "moe":
        from llm_quest_tpu.models import qwen3

        name, model, cfg = "qwen3-moe-1B", qwen3, QWEN3_MOE_CFG
        params = qwen3.init(jax.random.PRNGKey(0), cfg)
    else:
        name, model = "qwen3_5-0.8B-text", Qwen35Text
        cfg = dict(config.QWEN3_5_08B_CONFIG, dtype=jnp.bfloat16)
        params = qwen3_5.init_text(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)
    block = int(BLOCK) if BLOCK else None
    params_q = quantize_params_int8(
        params, block_size=block, quantize_embeddings=QUANT_EMB, bits=BITS
    )
    frac = quantized_byte_fraction(params_q, params)
    print(f"quantized param bytes = {frac:.3f}× bf16", flush=True)

    r_fp = sweep("bf16", model, params, cfg)
    r_q = sweep("int8", model, params_q, cfg)
    speedups = {k: round(r_q[k]["tok_s"] / r_fp[k]["tok_s"], 3) for k in r_fp}
    print(json.dumps({
        "model": name, "block_size": block,
        "byte_fraction": round(frac, 3), "bf16": r_fp, "int8": r_q,
        "speedup": speedups,
    }), flush=True)


if __name__ == "__main__":
    main()
