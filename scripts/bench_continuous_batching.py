"""Continuous batching vs batch-synchronous serving on the real chip.

Workload: N requests with a FIXED prompt bucket and HETEROGENEOUS generation
lengths (uniform in [GEN_MIN, GEN_MAX]) — the shape production serving
actually sees. The batch-synchronous engine must run every batch to its
longest member (head-of-line blocking: finished rows burn decode steps
emitting pad); the continuous engine retires each request at ITS length and
refills the slot from the queue.

Metric: USEFUL tokens/sec — only tokens requests asked for count.

Note on the axon tunnel: the continuous engine pays one ~35 ms host RTT per
decode chunk plus one per admission (b=1 prefill), which a local PCIe host
would not; DECODE_CHUNK trades scheduling granularity against that RTT.
Numbers here therefore UNDERSTATE the on-host win.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/llm_quest_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from llm_quest_tpu.inference import generate as gen  # noqa: E402
from llm_quest_tpu.inference.serving import ContinuousBatchingEngine  # noqa: E402
from llm_quest_tpu.models import qwen3  # noqa: E402

CFG = {
    "model_type": "dense", "vocab_size": 32_000, "context_length": 512, "emb_dim": 1024,
    "n_layers": 12, "n_heads": 16, "num_kv_groups": 8, "head_dim": 64, "hidden_dim": 2816,
    "rope_base": 10_000, "tie_embeddings": True, "qk_norm": True, "dtype": jnp.bfloat16,
}

N_REQ = int(os.environ.get("CB_REQUESTS", 64))
N_SLOTS = int(os.environ.get("CB_SLOTS", 32))  # measured best (COVERAGE.md sweep)
PROMPT_LEN = 32
GEN_MIN, GEN_MAX = 8, 128
DECODE_CHUNK = int(os.environ.get("CB_CHUNK", 32))
MAX_LEN = 192  # bucket 32 + gen 128 + slack


def make_workload():
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 32_000, size=PROMPT_LEN).tolist() for _ in range(N_REQ)]
    gens = rng.integers(GEN_MIN, GEN_MAX + 1, size=N_REQ).tolist()
    return prompts, gens


def run_static(params, prompts, gens):
    """Batch-synchronous: N_SLOTS-sized batches, each run to its max gen."""
    total = 0
    t0 = time.perf_counter()
    for i in range(0, N_REQ, N_SLOTS):
        bp = prompts[i : i + N_SLOTS]
        bg = gens[i : i + N_SLOTS]
        out = gen.generate_kv_cache(
            qwen3, params, CFG, jnp.asarray(bp, jnp.int32),
            max_gen=max(bg), temp=0.0, eos_ids=-1, pad_id=0,
        )
        # true host transfer — block_until_ready returns EARLY over the
        # axon tunnel (measured; see the verify skill's timing traps)
        _ = int(out["sequences"][0, -1])
        total += sum(bg)  # only the requested tokens are useful
    return total, time.perf_counter() - t0


def run_continuous(params, prompts, gens, pipeline_depth=2):
    engine = ContinuousBatchingEngine(
        qwen3, params, CFG, n_slots=N_SLOTS, max_len=MAX_LEN,
        decode_chunk=DECODE_CHUNK, prefill_buckets=(PROMPT_LEN,),
        temp=0.0, eos_ids=-1, pad_id=0, pipeline_depth=pipeline_depth,
    )
    engine.warmup()  # all admit group shapes + the chunk program, untimed
    t0 = time.perf_counter()
    outs = engine.serve(list(zip(prompts, gens)))
    dt = time.perf_counter() - t0
    assert [len(o) for o in outs] == gens
    return sum(gens), dt


def main():
    params = qwen3.init(jax.random.PRNGKey(0), CFG)
    prompts, gens = make_workload()

    s_tok, s_dt = run_static(params, prompts, gens)  # also compiles static path
    s_tok, s_dt = run_static(params, prompts, gens)  # timed warm
    print(f"static     : {s_tok} useful tok in {s_dt:.2f}s = {s_tok/s_dt:8.1f} tok/s", flush=True)

    c1_tok, c1_dt = run_continuous(params, prompts, gens, pipeline_depth=1)
    print(f"cont sync  : {c1_tok} useful tok in {c1_dt:.2f}s = {c1_tok/c1_dt:8.1f} tok/s", flush=True)
    c_tok, c_dt = run_continuous(params, prompts, gens, pipeline_depth=2)
    print(f"cont pipe2 : {c_tok} useful tok in {c_dt:.2f}s = {c_tok/c_dt:8.1f} tok/s", flush=True)

    print(json.dumps({
        "model": "qwen3-dense-300M", "n_requests": N_REQ, "n_slots": N_SLOTS,
        "gen_range": [GEN_MIN, GEN_MAX], "decode_chunk": DECODE_CHUNK,
        "static_tok_s": round(s_tok / s_dt, 1),
        "continuous_sync_tok_s": round(c1_tok / c1_dt, 1),
        "continuous_tok_s": round(c_tok / c_dt, 1),
        "speedup": round((c_tok / c_dt) / (s_tok / s_dt), 3),
    }), flush=True)


if __name__ == "__main__":
    main()
