"""Continuous-batching serving demo (L6 entry script).

Serves a heterogeneous workload through inference/serving.py on whatever
backend is available (one TPU chip, or CPU), demonstrating the engine's
production surface in one place:

- slot-pool scheduling with mid-flight admission (more requests than slots)
- a registered shared prefix (system prompt) reused across requests
- per-request sampling (greedy and stochastic traffic in one pool)
- per-token logprobs for one request
- request cancellation
- the stats() observability readout

The reference has no serving engine; its closest artifact is the left-pad
batched loop (llm_quest/generate.py:360-469). Everything here is synthetic
and offline — swap in real weights via weights/interop.py for a live model.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from llm_quest_tpu.inference.serving import ContinuousBatchingEngine
from llm_quest_tpu.models import qwen3

VOCAB = 512
CFG = {
    "model_type": "dense", "vocab_size": VOCAB, "context_length": 256,
    "emb_dim": 256, "n_layers": 4, "n_heads": 8, "num_kv_groups": 4,
    "head_dim": 32, "hidden_dim": 512, "rope_base": 10_000.0,
    "tie_embeddings": False, "dtype": jnp.bfloat16,
}
N_SLOTS = 8
MAX_LEN = 192
DECODE_CHUNK = 16
N_REQUESTS = 24


def main():
    print("devices:", jax.devices())
    params = qwen3.init(jax.random.PRNGKey(0), CFG)
    engine = ContinuousBatchingEngine(
        qwen3, params, CFG, n_slots=N_SLOTS, max_len=MAX_LEN,
        decode_chunk=DECODE_CHUNK, prefill_buckets=(16, 32), temp=0.8,
        top_k=40, eos_ids=-1, pad_id=0,
        per_request_sampling=True, return_logprobs=True,
    )

    system_prompt = list(range(5, 21))  # 16-token shared prefix
    pid = engine.register_prefix(system_prompt)

    rng = np.random.default_rng(0)
    rids = []
    for i in range(N_REQUESTS):
        ids = rng.integers(1, VOCAB, size=int(rng.integers(4, 17))).tolist()
        kw = {}
        if i % 3 == 0:
            kw["temp"] = 0.0  # greedy request in the stochastic pool
        if i % 4 == 0:
            kw["prefix"] = pid  # rides the cached system prompt
        rids.append(engine.submit(ids, int(rng.integers(16, 49)), **kw))

    victim = rids[N_REQUESTS // 2]
    t0 = time.perf_counter()
    steps = 0
    while engine.step():
        steps += 1
        if steps == 3:
            engine.cancel(victim)  # mid-flight cancellation
    dt = time.perf_counter() - t0

    results = {r: engine.result(r) for r in rids}
    done = [r for r, (_, d) in results.items() if d]
    total = sum(len(t) for t, _ in results.values())
    print(f"served {len(done)}/{N_REQUESTS} requests, {total} tokens "
          f"in {dt:.2f}s ({total / dt:.0f} tok/s)")
    print(f"cancelled request {victim}: "
          f"{len(results[victim][0])} tokens before the cut")
    lp = engine.request_logprobs(rids[0])
    print(f"request {rids[0]} logprobs (first 5): {[round(x, 3) for x in lp[:5]]}")
    for k, v in engine.stats().items():
        print(f"  {k}: {v:.4g}" if isinstance(v, float) else f"  {k}: {v}")


if __name__ == "__main__":
    main()
