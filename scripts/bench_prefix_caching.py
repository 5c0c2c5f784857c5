"""Prefix caching: time-to-first-token with a long shared system prompt.

A registered prefix (inference/serving.py::register_prefix) is prefilled
once; each request then prefills only its suffix, so admit cost — the TTFT
driver for long system prompts — should scale with the suffix, not the
prompt. This measures admit+first-token latency for suffix-only requests
against full-prompt requests at several prefix lengths, on the dense ~430M
qwen3 config (the bench_int8_kv model).

Method: pipeline_depth=1 engines (true latency stamps), decode_chunk=1, one
request per measurement, median of REPS; the one-off register_prefix cost is
reported separately. Host-clock TTFT includes the tunnel RTT both ways, so
the SPEEDUP column is the robust number.
"""

import json
import os
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/llm_quest_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from llm_quest_tpu.inference.serving import ContinuousBatchingEngine  # noqa: E402
from llm_quest_tpu.models import qwen3  # noqa: E402

SUFFIX = int(os.environ.get("PFX_SUFFIX", "32"))
PREFIXES = [int(s) for s in os.environ.get("PFX_LENS", "1024,2048,4096").split(",")]
REPS = int(os.environ.get("PFX_REPS", "5"))
CFG = {
    "vocab_size": 32_000, "context_length": 8192, "emb_dim": 1024,
    "n_layers": 16, "n_heads": 8, "num_kv_groups": 4, "head_dim": 128,
    "hidden_dim": 3072, "rope_base": 500_000, "tie_embeddings": True,
    "qk_norm": True, "dtype": jnp.bfloat16,
}
if os.environ.get("PFX_TINY"):  # CPU smoke: tiny model, tiny lengths
    CFG.update(vocab_size=256, emb_dim=64, n_layers=2, hidden_dim=128,
               context_length=256, dtype=jnp.float32)
    PREFIXES = [16, 32]


def ttft_once(engine, ids, prefix=None):
    rid = engine.submit(ids, 2, prefix=prefix)
    while engine.step():
        pass
    r = engine._requests[rid]
    assert r.done and len(r.tokens) == 2
    return r.t_first - r.t_submit


def measure(plen):
    rng = np.random.default_rng(0)
    prefix = rng.integers(1, 1000, size=plen).tolist()
    suffix = rng.integers(1, 1000, size=SUFFIX).tolist()
    max_len = plen + SUFFIX + 32

    eng = ContinuousBatchingEngine(
        qwen3, params, CFG, n_slots=2, max_len=max_len, decode_chunk=1,
        prefill_buckets=(SUFFIX, plen + SUFFIX), temp=0.0, eos_ids=-1, pad_id=0,
        pipeline_depth=1,
    )
    t0 = time.perf_counter()
    pid = eng.register_prefix(prefix)
    register_s = time.perf_counter() - t0

    full = prefix + suffix
    ttft_once(eng, full)  # compile full-prompt path
    ttft_once(eng, suffix, prefix=pid)  # compile suffix path
    with_prefix = statistics.median(ttft_once(eng, suffix, prefix=pid) for _ in range(REPS))
    without = statistics.median(ttft_once(eng, full) for _ in range(REPS))
    row = {
        "ttft_full_ms": round(without * 1e3, 1),
        "ttft_prefix_ms": round(with_prefix * 1e3, 1),
        "speedup": round(without / with_prefix, 2),
        "register_once_s": round(register_s, 2),
    }
    print(plen, row, flush=True)
    return row


if __name__ == "__main__":
    params = qwen3.init(jax.random.PRNGKey(0), CFG)
    params = jax.tree.map(
        lambda x: x.astype(CFG["dtype"]) if x.dtype == jnp.float32 else x, params
    )
    print(json.dumps({f"P{p}": measure(p) for p in PREFIXES}), flush=True)
