"""Speculative CONTINUOUS serving vs plain continuous serving (real chip).

bench_spec_decoding.py measures b=1 speculative decoding; this measures the
production shape: a heterogeneous multi-request workload through the
continuous-batching engine, plain single-token chunks vs draft+verify
windows (inference/serving.py speculative mode). Both are greedy and
LOSSLESS, so useful-token throughput is directly comparable — and the
outputs are asserted identical.

Reuses bench_spec_decoding's Markov corpus + training/distillation helpers
(qwen3 target ~6L/384d, distilled 1L/128d draft).
"""

import importlib.util
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/llm_quest_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

_spec = importlib.util.spec_from_file_location(
    "bench_spec_decoding", os.path.join(os.path.dirname(__file__), "bench_spec_decoding.py")
)
bsd = importlib.util.module_from_spec(_spec)
sys.modules["bench_spec_decoding"] = bsd
_spec.loader.exec_module(bsd)

from llm_quest_tpu.inference.serving import ContinuousBatchingEngine  # noqa: E402
from llm_quest_tpu.models import gpt2  # noqa: E402

N_REQ = int(os.environ.get("SS_REQS", "32"))
N_SLOTS = int(os.environ.get("SS_SLOTS", "8"))
GAMMAS = [int(g) for g in os.environ.get("SS_GAMMAS", "4,8").split(",")]
MAX_LEN = 16 + 224 + 32
TINY = bool(os.environ.get("SS_TINY"))
if TINY:
    bsd.TRAIN_STEPS, N_REQ, N_SLOTS, GAMMAS = 30, 6, 2, [3]


def workload(corpus, rng):
    reqs = []
    for _ in range(N_REQ):
        start = int(rng.integers(0, len(corpus) - 32))
        prompt = corpus[start : start + 16].astype(np.int32).tolist()
        max_gen = int(rng.integers(16, 48) if TINY else rng.integers(64, 224))
        reqs.append((prompt, max_gen))
    return reqs


def run_engine(t_params, tcfg, reqs, *, draft=None, gamma=None, chunk):
    kw = {}
    if draft is not None:
        kw = dict(draft_model=gpt2, draft_params=draft[0], draft_cfg=draft[1], gamma=gamma)
    eng = ContinuousBatchingEngine(
        gpt2, t_params, tcfg, n_slots=N_SLOTS, max_len=MAX_LEN, decode_chunk=chunk,
        prefill_buckets=(16,), temp=0.0, eos_ids=-1, pad_id=0, **kw,
    )
    eng.serve(reqs[:2])  # compile paths on a tiny warm batch
    eng2 = ContinuousBatchingEngine(
        gpt2, t_params, tcfg, n_slots=N_SLOTS, max_len=MAX_LEN, decode_chunk=chunk,
        prefill_buckets=(16,), temp=0.0, eos_ids=-1, pad_id=0, **kw,
    )
    t0 = time.perf_counter()
    outs = eng2.serve(reqs)
    dt = time.perf_counter() - t0
    toks = sum(len(o) for o in outs)
    return outs, toks / dt, eng2.stats()


def main():
    corpus = bsd.markov_corpus(200_000)
    print(f"training target ({'tiny' if TINY else '6L/384d'})...", flush=True)
    tcfg = dict(bsd.TARGET_CFG, context_length=MAX_LEN)
    dcfg = dict(bsd.TINY_DRAFT_CFG, context_length=MAX_LEN)
    if TINY:
        tcfg.update(emb_dim=96, n_heads=2, n_layers=2)
        dcfg.update(emb_dim=32, n_heads=1, n_layers=1)
    t_params, t_loss = bsd.train(gpt2, tcfg, corpus, bsd.TRAIN_STEPS, seed=1)
    print(f"  target final loss {t_loss:.3f}", flush=True)
    print("distilling draft...", flush=True)
    d_params, kl = bsd.distill(gpt2, dcfg, t_params, tcfg, corpus, bsd.TRAIN_STEPS, seed=3)
    print(f"  draft final KL {kl:.3f}", flush=True)

    reqs = workload(corpus, np.random.default_rng(0))
    plain_outs, plain_tok_s, st = run_engine(t_params, tcfg, reqs, chunk=32 if not TINY else 4)
    print(f"plain serving: {plain_tok_s:8.1f} useful tok/s  util {st['slot_utilization']:.2f}", flush=True)

    results = {"plain_tok_s": round(plain_tok_s, 1)}
    for gamma in GAMMAS:
        outs, tok_s, st = run_engine(
            t_params, tcfg, reqs, draft=(d_params, dcfg), gamma=gamma,
            chunk=max(1, (32 if not TINY else 4) // (gamma + 1)),
        )
        assert outs == plain_outs, "speculative serving diverged from plain (must be lossless)"
        sp = tok_s / plain_tok_s
        results[f"gamma{gamma}"] = {"tok_s": round(tok_s, 1), "speedup": round(sp, 2)}
        print(f"spec serving γ={gamma}: {tok_s:8.1f} useful tok/s  speedup {sp:4.2f}x "
              f"util {st['slot_utilization']:.2f}", flush=True)
    results["lossless"] = True
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
