"""Long-prompt TTFT THROUGH THE SERVING ENGINE under a busy pool.

bench_ttft_long_prompt.py measures single-request prefill latency; this
measures the production question (VERDICT r3 #6): a 4k/8k-token prompt is
submitted while the pool is busy decoding short requests — how long until
its first token? The long prompt admits through CHUNKED-PREFILL admission
(prefill_chunk-sized pieces, one compiled program per chunk count), so this
also smokes the chunk-count compile behavior at real scale.

Reports p50/p95 TTFT over REPS submissions for each prompt length, the
busy-pool baseline throughput, and the first-compile wall time of each
chunked-admit program (the "pathological compile blowup" check).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_serving_ttft_long.py
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

from llm_quest_tpu import config  # noqa: E402
from llm_quest_tpu.inference.serving import ContinuousBatchingEngine  # noqa: E402
from llm_quest_tpu.models import qwen3_5  # noqa: E402

PROMPTS = [int(p) for p in os.environ.get("TL_PROMPTS", "4096,8192").split(",")]
N_SLOTS = int(os.environ.get("TL_SLOTS", "16"))
CHUNK = int(os.environ.get("TL_CHUNK", "16"))
PREFILL_CHUNK = int(os.environ.get("TL_PREFILL_CHUNK", "512"))
REPS = int(os.environ.get("TL_REPS", "5"))


class TextModel:
    apply = staticmethod(qwen3_5.apply_text)
    init_cache = staticmethod(qwen3_5.init_cache)


def main():
    cfg = dict(config.QWEN3_5_08B_CONFIG, dtype=jnp.bfloat16)
    params = qwen3_5.init_text(jax.random.PRNGKey(0), cfg)
    max_len = max(PROMPTS) + 128

    eng = ContinuousBatchingEngine(
        TextModel, params, cfg, n_slots=N_SLOTS, max_len=max_len,
        decode_chunk=CHUNK, prefill_buckets=(32,), prefill_chunk=PREFILL_CHUNK,
        temp=0.0, eos_ids=-1, pad_id=0,
    )
    rng = np.random.default_rng(0)

    def short_req():
        return (rng.integers(1, 1000, size=32).tolist(), 64)

    # steady busy pool: keep ~N_SLOTS-1 short requests decoding at all times
    eng.serve([short_req() for _ in range(N_SLOTS)])  # warm short programs

    results = {}
    for plen in PROMPTS:
        long_ids = rng.integers(1, 1000, size=plen).tolist()
        # first submission compiles the n_chunks admit program — time it
        t0 = time.perf_counter()
        eng.serve([(long_ids, 8)])
        compile_s = time.perf_counter() - t0

        ttfts = []
        for _ in range(REPS):
            for _ in range(N_SLOTS - 1):
                eng.submit(*short_req())
            rid = eng.submit(long_ids, 8)
            while eng.step():
                pass
            r = eng._requests[rid]
            ttfts.append(r.t_first - r.t_submit)
        ttfts.sort()
        results[f"{plen}"] = {
            "ttft_p50_ms": round(ttfts[len(ttfts) // 2] * 1e3, 1),
            "ttft_p95_ms": round(ttfts[max(0, int(len(ttfts) * 0.95) - 1)] * 1e3, 1),
            "n_chunks": -(-plen // PREFILL_CHUNK),
            "first_compile_s": round(compile_s, 1),
        }
        print(json.dumps({f"prompt_{plen}": results[f"{plen}"]}), flush=True)

    print(json.dumps({
        "busy_pool": f"{N_SLOTS - 1} short reqs decoding",
        "prefill_chunk": PREFILL_CHUNK,
        "results": results,
    }))


if __name__ == "__main__":
    main()
