"""Int8 KV cache: long-context decode throughput vs the bf16 cache.

Decode at long context re-reads the whole (L, b, hkv, S, d) K/V every step;
int8 KV (inference/cache.py quant="int8" + kernels/flash_decode.py) halves
those bytes AND halves the cache HBM footprint (2x the serving slots fit).
This measures where it matters: a dense model with the cache nearly full.

Method: generate with max_gen=G and max_gen=1 from the same long prompt;
the difference isolates G-1 decode steps from the (shared) prefill, robust
to the tunnel RTT. Decode-only tok/s and ms/step are reported per context.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/llm_quest_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from llm_quest_tpu.inference import generate as gen  # noqa: E402
from llm_quest_tpu.models import qwen3  # noqa: E402

B = int(os.environ.get("KVQ_BATCH", "8"))
GEN = 64
CONTEXTS = [int(s) for s in os.environ.get("KVQ_CONTEXTS", "2048,4096,8192").split(",")]

# dense ~430M: emb 1024, 16 layers, GQA 8/4, head_dim 128 (kernel-native)
CFG = {
    "vocab_size": 32_000, "context_length": 8192, "emb_dim": 1024,
    "n_layers": 16, "n_heads": 8, "num_kv_groups": 4, "head_dim": 128,
    "hidden_dim": 3072, "rope_base": 500_000, "tie_embeddings": True,
    "qk_norm": True, "dtype": jnp.bfloat16,
}


def run_once(params, cfg, prompt, attn, max_gen):
    out = gen.generate_batched_kv_cache(
        qwen3, params, cfg, prompt, attn, max_gen=max_gen, temp=0.0,
        eos_ids=-1, pad_id=0,
    )
    return int(out["sequences"][0, -1])


def decode_time(params, cfg, prompt, attn):
    run_once(params, cfg, prompt, attn, 1)       # compile both shapes
    run_once(params, cfg, prompt, attn, GEN)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run_once(params, cfg, prompt, attn, 1)
        mid = time.perf_counter()
        run_once(params, cfg, prompt, attn, GEN)
        end = time.perf_counter()
        best = min(best, (end - mid) - (mid - t0))
    return best / (GEN - 1)  # s per decode step


def cache_bytes(cfg, b, max_len):
    c = qwen3.init_cache(cfg, b, max_len)
    tot = 0
    for x in jax.tree.leaves(c):
        tot += x.size * (0.5 if x.dtype in (jnp.int4,) else x.dtype.itemsize)
    return tot


def chip_parity():
    """Real-Mosaic lowering check: kernel vs dequantize-then-sdpa in bf16."""
    import numpy as np

    from llm_quest_tpu.kernels.flash_attention import NEG_INF
    from llm_quest_tpu.kernels.flash_decode import flash_decode

    rng = np.random.default_rng(0)
    b, hq, hkv, S, d = 4, 8, 4, 2048, 128
    q = jnp.asarray(rng.standard_normal((b, hq, 1, d)), jnp.bfloat16)
    k_q = jnp.asarray(rng.integers(-127, 128, (b, hkv, S, d)), jnp.int8)
    v_q = jnp.asarray(rng.integers(-127, 128, (b, hkv, S, d)), jnp.int8)
    k_s = jnp.asarray(rng.uniform(0.005, 0.02, (b, hkv, S)), jnp.float32)
    v_s = jnp.asarray(rng.uniform(0.005, 0.02, (b, hkv, S)), jnp.float32)
    valid = np.zeros((b, S), bool)
    valid[:, :1500] = True
    bias = jnp.where(jnp.asarray(valid), 0.0, NEG_INF).astype(jnp.float32)

    got = flash_decode(q, k_q, k_s, v_q, v_s, bias)
    k = k_q.astype(jnp.float32) * k_s[..., None]
    v = v_q.astype(jnp.float32) * v_s[..., None]
    g = hq // hkv
    s = jnp.einsum("bhqd,bhsd->bhqs", q.astype(jnp.float32),
                   jnp.repeat(k, g, axis=1)) * d**-0.5 + bias[:, None, None, :]
    ref = jnp.einsum("bhqs,bhsd->bhqd", jax.nn.softmax(s, -1), jnp.repeat(v, g, axis=1))
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref)))
    print({"chip_parity_max_err": round(err, 4), "ok": err < 0.05}, flush=True)
    assert err < 0.05, err


def main():
    chip_parity()
    params = qwen3.init(jax.random.PRNGKey(0), CFG)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)
    results = {}
    for S in CONTEXTS:
        plen = S - GEN
        prompt = jax.random.randint(jax.random.PRNGKey(1), (B, plen), 1, 1000)
        attn = jnp.ones((B, plen), bool)
        row = {}
        for name, cfg in (("bf16", dict(CFG)), ("int8", dict(CFG, kv_quant="int8"))):
            cfg = dict(cfg, context_length=S)
            step_s = decode_time(params, cfg, prompt, attn)
            row[name] = {
                "ms_step": round(step_s * 1e3, 2),
                "tok_s": round(B / step_s, 1),
                "cache_mb": round(cache_bytes(cfg, B, S) / 2**20, 1),
            }
            print(S, name, row[name], flush=True)
        row["speedup"] = round(row["bf16"]["ms_step"] / row["int8"]["ms_step"], 3)
        results[f"S{S}"] = row
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
