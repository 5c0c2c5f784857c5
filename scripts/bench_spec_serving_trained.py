"""MEASURED speculative continuous serving at the flagship 0.8B target.

Round 4 could only report window-cost floors + projections here: random
bf16 weights make acceptance unmeasurable (near-uniform 248k-vocab logits
flip argmax between the s=1 and s=γ+1 forwards — bench_spec_serving_flagship
docstring). The reference's only published throughput table is a
MEASUREMENT (reference: speculative_decoding/README.md:60-76), so round 5
closes the gap the cheap way the verdict prescribed: train the target
briefly on synthetic data until its logits are peaked, train a small draft
on the same distribution, and measure REAL end-to-end acceptance + speedup
through the serving engine.

Task: an order-1 Markov chain over 1024 active tokens (per-token fixed
successor with prob 0.85, else one of 3 alternates) — enough entropy that
acceptance is a property of the models, not a tautology. Target = flagship
24L/1024d (fused-head CE so the 248k-vocab logits never materialize),
draft = 4L/512d, both trained on chain samples. Serving prompts are drawn
from the same chain (acceptance on-distribution, like the reference's
GPT-2-weights + natural-text setup).

Reported: offline greedy draft/target agreement (the acceptance proxy α),
plain vs speculative useful tok/s on the identical workload/engine config
as bench_spec_serving_flagship.py, and the implied speedup.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_spec_serving_trained.py
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
from llm_quest_tpu.training.engine import make_optimizer, make_train_step  # noqa: E402

N_REQ = int(os.environ.get("SF_REQS", "32"))
N_SLOTS = int(os.environ.get("SF_SLOTS", "16"))
CHUNK = int(os.environ.get("SF_CHUNK", "8"))
GAMMA = int(os.environ.get("SF_GAMMA", "4"))
N_RUNS = int(os.environ.get("SF_RUNS", "3"))
TRAIN_STEPS = int(os.environ.get("SF_TRAIN_STEPS", "300"))
V_ACTIVE = 1024
P_MAIN = 0.85


class TextModel:
    apply = staticmethod(qwen3_5.apply_text)
    init_cache = staticmethod(qwen3_5.init_cache)
    head_weights = staticmethod(qwen3_5.head_weights)


def make_chain(rng):
    succ = rng.permutation(V_ACTIVE)  # main successor: a fixed permutation
    alts = rng.integers(0, V_ACTIVE, size=(V_ACTIVE, 3))
    return succ, alts


def sample_chain(rng, succ, alts, b, s):
    x = np.empty((b, s), np.int32)
    x[:, 0] = rng.integers(0, V_ACTIVE, size=b)
    for t in range(1, s):
        main = rng.random(b) < P_MAIN
        alt = alts[x[:, t - 1], rng.integers(0, 3, size=b)]
        x[:, t] = np.where(main, succ[x[:, t - 1]], alt)
    return x


def train(cfg, params, succ, alts, steps, b=4, s=129, label=""):
    # s=129 -> 128 input tokens: the chunked GDN kernel path (s >= 2 chunks)
    # with its chunk-state backward; one token fewer routes the GDN layers
    # to the lax.scan recurrence, whose backward saves EVERY per-step fp32
    # state (18 layers x 127 x (b,16,128,128) ~ 56 GB -> compile OOM)
    rng = np.random.default_rng(hash(label) % 2**31)
    optimizer = make_optimizer(3e-4)
    opt_state = optimizer.init(params)
    step = make_train_step(TextModel, cfg, optimizer, fused_head_ce=True)
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    for i in range(steps):
        x = sample_chain(rng, succ, alts, b, s)
        batch = {
            "input_ids": jnp.asarray(x[:, :-1]),
            "targets": jnp.asarray(x[:, 1:]),
        }
        params, opt_state, loss = step(params, opt_state, batch, key)
        if i % 100 == 0 or i == steps - 1:
            print(f"[{label}] step {i} loss {float(loss):.4f}", flush=True)
    print(f"[{label}] {steps} steps in {time.perf_counter() - t0:.1f}s", flush=True)
    return params, float(loss)


def greedy_agreement(cfg, params, draft_cfg, draft_params, succ, alts, n_ctx=16, gen=48):
    """Offline acceptance proxy: fraction of positions where the draft's
    greedy choice equals the target's, measured along the TARGET's greedy
    continuation (exactly the tokens a γ-window would verify)."""
    from llm_quest_tpu.inference import generate as gen_mod

    rng = np.random.default_rng(7)
    prompts = jnp.asarray(sample_chain(rng, succ, alts, n_ctx, 32))
    out_t = gen_mod.generate_kv_cache(TextModel, params, cfg, prompts,
                                      max_gen=gen, temp=0.0, eos_ids=-1, pad_id=0)
    seq = out_t["sequences"]  # (n, 32+gen): prompt + target greedy tokens

    @jax.jit
    def draft_choice(dp, ids):
        logits, _, _ = qwen3_5.apply_text(dp, draft_cfg, ids)
        return jnp.argmax(logits, axis=-1)

    pred = np.asarray(draft_choice(draft_params, seq[:, :-1]))
    ref = np.asarray(seq[:, 1:])
    # only score the generated region (positions >= 31 predict token 32+)
    return float((pred[:, 31:] == ref[:, 31:]).mean())


def timed_serve(eng, reqs, n_runs):
    outs = eng.serve(reqs)
    rates = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        outs = eng.serve(reqs)
        rates.append(sum(len(o) for o in outs) / (time.perf_counter() - t0))
    return statistics.median(rates), (min(rates), max(rates)), outs


def main():
    cfg = dict(config.QWEN3_5_08B_CONFIG, dtype=jnp.bfloat16)
    draft_cfg = dict(cfg, n_layers=4, emb_dim=512, hidden_dim=1536, n_heads=4,
                     num_kv_groups=2, head_dim=128, linear_num_qk_heads=8,
                     linear_num_value_heads=8, linear_qk_head_dim=64,
                     linear_value_head_dim=64)

    chain_rng = np.random.default_rng(42)
    succ, alts = make_chain(chain_rng)

    params = qwen3_5.init_text(jax.random.PRNGKey(0), cfg)
    params, target_loss = train(cfg, params, succ, alts, TRAIN_STEPS, label="target")
    draft_params = qwen3_5.init_text(jax.random.PRNGKey(1), draft_cfg)
    draft_params, draft_loss = train(draft_cfg, draft_params, succ, alts, TRAIN_STEPS,
                                     b=8, label="draft")

    alpha = greedy_agreement(cfg, params, draft_cfg, draft_params, succ, alts)
    print(f"offline draft/target greedy agreement (alpha proxy): {alpha:.3f}", flush=True)

    rng = np.random.default_rng(0)
    reqs = [(sample_chain(rng, succ, alts, 1, 32)[0].tolist(), int(rng.integers(16, 65)))
            for _ in range(N_REQ)]

    def make(spec):
        kw = {}
        if spec:
            kw = dict(draft_model=TextModel, draft_params=draft_params,
                      draft_cfg=draft_cfg, gamma=GAMMA)
        return ContinuousBatchingEngine(
            TextModel, params, cfg, n_slots=N_SLOTS, max_len=160,
            decode_chunk=CHUNK, prefill_buckets=(32,), temp=0.0, eos_ids=-1,
            pad_id=0, **kw,
        )

    plain, plain_spread, plain_out = timed_serve(make(False), reqs, N_RUNS)
    spec, spec_spread, spec_out = timed_serve(make(True), reqs, N_RUNS)

    # losslessness check on the trained weights: spec greedy == plain greedy
    match = sum(a == b for a, b in zip(plain_out, spec_out))

    print(json.dumps({
        "workload": f"{N_REQ} reqs, 32-tok Markov prompts, gen U[16,64], {N_SLOTS} slots",
        "gamma": GAMMA,
        "train_steps": TRAIN_STEPS,
        "target_final_loss": round(target_loss, 4),
        "draft_final_loss": round(draft_loss, 4),
        "alpha_offline_greedy_agreement": round(alpha, 3),
        "plain_tok_s": round(plain, 1),
        "plain_spread": [round(plain_spread[0], 1), round(plain_spread[1], 1)],
        "spec_tok_s": round(spec, 1),
        "spec_spread": [round(spec_spread[0], 1), round(spec_spread[1], 1)],
        "speedup": round(spec / plain, 3),
        "spec_equals_plain_outputs": f"{match}/{len(reqs)}",
    }))


if __name__ == "__main__":
    main()
