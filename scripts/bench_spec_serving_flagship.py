"""Speculative CONTINUOUS serving at the flagship 0.8B target (real chip).

bench_spec_serving.py measures spec-serving end-to-end with a TRAINED
distilled draft at toy scale (where acceptance is meaningful). At 0.8B we
cannot train a meaningful draft in-session — and with RANDOM 0.8B weights
at bf16, acceptance itself is unmeasurable: random-init logit gaps over
the 248k vocab are tiny, so the verify forward's (s=γ+1) matmul tiling vs
the draft's s=1 step flips the argmax at essentially every position
(measured: self-draft prefix agreement 0.0 — NOT an engine bug; the fp32
toy tests in tests/test_serving.py assert exact self-draft losslessness).

So this measures the weight-INDEPENDENT quantity instead: the per-window
COST of spec serving at flagship scale, from two ~zero-acceptance runs
(every window pays γ draft steps + 1 verify and commits ~1 token):

- FLOOR(small draft): 4-layer/512d draft — the production window cost.
- FLOOR(self-draft): draft == target — machinery overhead upper bound.
- BASELINE: the plain engine on the same workload.

Window cost is constant in acceptance while committed tokens scale as
(1 + α·γ), so projected throughput at acceptance α is
floor × (1 + α·γ) — reported for α ∈ {0.56 (the toy-scale distilled
draft's measured rate), 0.8, 1.0} plus the break-even α vs plain.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_spec_serving_flagship.py
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

N_REQ = int(os.environ.get("SF_REQS", "32"))
N_SLOTS = int(os.environ.get("SF_SLOTS", "16"))
CHUNK = int(os.environ.get("SF_CHUNK", "8"))
GAMMA = int(os.environ.get("SF_GAMMA", "4"))
N_RUNS = int(os.environ.get("SF_RUNS", "3"))


class TextModel:
    apply = staticmethod(qwen3_5.apply_text)
    init_cache = staticmethod(qwen3_5.init_cache)


def timed_serve(eng, reqs, n_runs):
    outs = eng.serve(reqs)  # warm every program shape
    rates = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        outs = eng.serve(reqs)
        rates.append(sum(len(o) for o in outs) / (time.perf_counter() - t0))
    return statistics.median(rates), (min(rates), max(rates)), outs


def main():
    cfg = dict(config.QWEN3_5_08B_CONFIG, dtype=jnp.bfloat16)
    params = qwen3_5.init_text(jax.random.PRNGKey(0), cfg)

    draft_cfg = dict(cfg, n_layers=4, emb_dim=512, hidden_dim=1536, n_heads=4,
                     num_kv_groups=2, head_dim=128, linear_num_qk_heads=8,
                     linear_num_value_heads=8, linear_qk_head_dim=64,
                     linear_value_head_dim=64)
    draft_params = qwen3_5.init_text(jax.random.PRNGKey(1), draft_cfg)

    rng = np.random.default_rng(0)
    reqs = [(rng.integers(1, 1000, size=32).tolist(), int(rng.integers(16, 65)))
            for _ in range(N_REQ)]

    def make(draft=None):
        kw = {}
        if draft is not None:
            dp, dc = draft
            kw = dict(draft_model=TextModel, draft_params=dp, draft_cfg=dc, gamma=GAMMA)
        return ContinuousBatchingEngine(
            TextModel, params, cfg, n_slots=N_SLOTS, max_len=160,
            decode_chunk=CHUNK, prefill_buckets=(32,), temp=0.0, eos_ids=-1,
            pad_id=0, **kw,
        )

    plain, plain_spread, plain_out = timed_serve(make(), reqs, N_RUNS)
    selfd, selfd_spread, selfd_out = timed_serve(make((params, cfg)), reqs, N_RUNS)
    floor, floor_spread, _ = timed_serve(make((draft_params, draft_cfg)), reqs, N_RUNS)

    # prefix agreement between self-draft and plain — an acceptance PROXY
    # (~0 on random bf16 weights, see module docstring; high on trained)
    matched = total = 0
    for a, b in zip(plain_out, selfd_out):
        total += max(len(a), len(b))
        for x, y in zip(a, b):
            if x != y:
                break
            matched += 1

    proj = {f"alpha_{a}": round(floor * (1 + a * GAMMA), 1) for a in (0.56, 0.8, 1.0)}
    breakeven = (plain / floor - 1) / GAMMA

    print(json.dumps({
        "workload": f"{N_REQ} reqs, 32-tok prompts, gen U[16,64], {N_SLOTS} slots",
        "gamma": GAMMA,
        "plain_tok_s": round(plain, 1),
        "plain_spread": [round(plain_spread[0], 1), round(plain_spread[1], 1)],
        "floor_smalldraft_tok_s": round(floor, 1),
        "floor_spread": [round(floor_spread[0], 1), round(floor_spread[1], 1)],
        "floor_selfdraft_tok_s": round(selfd, 1),
        "selfdraft_spread": [round(selfd_spread[0], 1), round(selfd_spread[1], 1)],
        "selfdraft_prefix_match_frac": round(matched / max(total, 1), 3),
        "projected_tok_s_at_acceptance": proj,
        "breakeven_acceptance_vs_plain": round(breakeven, 3),
        "note": "floors are ~zero-acceptance window costs (random bf16 weights flip near-tie argmaxes, docstring); projection = floor*(1+alpha*gamma), window cost constant in alpha",
    }))


if __name__ == "__main__":
    main()
