"""Speculative decoding at the REFERENCE's model scale, end-to-end on chip.

The reference's headline numbers (speculative_decoding/README.md:60-76 —
avg 1.85x, best 2.15x at γ=4) pair GPT-2 124M (draft) with GPT-2 774M
(target), real weights. This environment has no hub egress, so the honest
equivalent at the SAME model scale: train the 774M-config target briefly on
a low-entropy Markov corpus (fast to learn; what matters for acceptance is
draft↔target agreement, not absolute quality), distill the 124M-config
draft on the target's soft logits, then measure plain cached decode vs
`speculative_generate` for γ ∈ {4, 8, 12}, greedy.

Step costs are what make this the real measurement (weights don't change
them): at 124M/774M the draft step is genuinely ~5x cheaper in wall time,
unlike the toy-scale harness (bench_spec_decoding.py) where both models sit
on the ~110 µs dispatch floor. This replaces that harness's cost-structure
PROJECTION (2.19x at γ=8/80%) with a measured end-to-end number.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/llm_quest_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from llm_quest_tpu.models import gpt2
from llm_quest_tpu.inference import generate as gen
from llm_quest_tpu.inference.spec_decoding import speculative_generate
from llm_quest_tpu.ops.losses import cross_entropy

VOCAB = 50_257  # real GPT-2 vocab — the lm-head cost is part of the measurement
STATES = 512  # Markov chain lives on the first 512 ids
SEQ = 128
PROMPT_LEN = 16
MAX_GEN = int(os.environ.get("SPEC_MAX_GEN", 200))
TRAIN_STEPS = int(os.environ.get("SPEC_TRAIN_STEPS", 200))
DISTILL_STEPS = int(os.environ.get("SPEC_DISTILL_STEPS", 300))
BATCH = 8

# GPT-2 774M / 124M configs (config.py gpt2_config_creator values)
TARGET_CFG = {
    "vocab_size": VOCAB, "context_length": PROMPT_LEN + MAX_GEN + 24, "emb_dim": 1280,
    "n_heads": 20, "n_layers": 36, "drop_rate": 0.0, "qkv_bias": True, "dtype": jnp.bfloat16,
}
DRAFT_CFG = {
    "vocab_size": VOCAB, "context_length": PROMPT_LEN + MAX_GEN + 24, "emb_dim": 768,
    "n_heads": 12, "n_layers": 12, "drop_rate": 0.0, "qkv_bias": True, "dtype": jnp.bfloat16,
}

if os.environ.get("SPEC_SMOKE"):  # tiny-shape plumbing check (CPU)
    VOCAB = 512
    TARGET_CFG.update(vocab_size=VOCAB, emb_dim=128, n_heads=4, n_layers=4)
    DRAFT_CFG.update(vocab_size=VOCAB, emb_dim=64, n_heads=2, n_layers=2)
    MAX_GEN, TRAIN_STEPS, DISTILL_STEPS, BATCH = 32, 30, 30, 4


def markov_corpus(n_tokens, seed=0, branch=4):
    rng = np.random.default_rng(seed)
    succ = rng.integers(0, STATES, size=(STATES, branch))
    p = np.asarray([0.6, 0.25, 0.1, 0.05][:branch])
    p = p / p.sum()
    out = np.empty(n_tokens, np.int32)
    s = 0
    for i in range(n_tokens):
        s = succ[s, rng.choice(branch, p=p)]
        out[i] = s
    return out


def time_call(fn, n=5):
    """N dispatches + one host transfer (single TPU stream serializes them);
    bare-transfer RTT subtracted. block_until_ready is NOT trusted over the
    axon tunnel (can return early)."""
    out = fn()
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf)
    t0 = time.perf_counter()
    np.asarray(leaf)
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    np.asarray(jax.tree.leaves(out)[0])
    dt = max(time.perf_counter() - t0 - rtt, 1e-9) / n
    return dt, out


def train_target(corpus):
    params = gpt2.init(jax.random.PRNGKey(1), TARGET_CFG)
    opt = optax.adamw(2e-4, weight_decay=0.01)
    opt_state = opt.init(params)
    n_windows = (len(corpus) - 1) // SEQ
    inputs = corpus[: n_windows * SEQ].reshape(-1, SEQ)
    targets = corpus[1 : n_windows * SEQ + 1].reshape(-1, SEQ)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits, _, _ = gpt2.apply(p, TARGET_CFG, x)
            return cross_entropy(logits.astype(jnp.float32), y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(1)
    t0 = time.perf_counter()
    for i in range(TRAIN_STEPS):
        idx = rng.integers(0, n_windows, size=BATCH)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(inputs[idx]), jnp.asarray(targets[idx]))
        if i % 50 == 0 or i == TRAIN_STEPS - 1:
            print(f"  target step {i}: loss {float(loss):.3f} "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)
    return params


def distill_draft(t_params, corpus):
    params = gpt2.init(jax.random.PRNGKey(2), DRAFT_CFG)
    opt = optax.adamw(4e-4, weight_decay=0.01)
    opt_state = opt.init(params)
    n_windows = (len(corpus) - 1) // SEQ
    inputs = corpus[: n_windows * SEQ].reshape(-1, SEQ)

    @jax.jit
    def step(params, opt_state, x):
        t_logits, _, _ = gpt2.apply(t_params, TARGET_CFG, x)
        t_logp = jax.nn.log_softmax(t_logits.astype(jnp.float32), axis=-1)

        def loss_fn(p):
            logits, _, _ = gpt2.apply(p, DRAFT_CFG, x)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            return jnp.mean(jnp.sum(jnp.exp(t_logp) * (t_logp - logp), axis=-1))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(2)
    t0 = time.perf_counter()
    for i in range(DISTILL_STEPS):
        idx = rng.integers(0, n_windows, size=BATCH)
        params, opt_state, loss = step(params, opt_state, jnp.asarray(inputs[idx]))
        if i % 50 == 0 or i == DISTILL_STEPS - 1:
            print(f"  distill step {i}: KL {float(loss):.3f} "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)
    return params


def main():
    corpus = markov_corpus(400_000)
    print("training 774M-config target on the Markov corpus...", flush=True)
    t_params = train_target(corpus)
    print("distilling 124M-config draft from the target...", flush=True)
    d_params = distill_draft(t_params, corpus)

    prompt = jnp.asarray(corpus[:PROMPT_LEN][None].astype(np.int32))

    def plain():
        return gen.generate_kv_cache(
            gpt2, t_params, TARGET_CFG, prompt, max_gen=MAX_GEN, temp=0.0,
            eos_ids=-1, pad_id=0,
        )["sequences"]

    def plain_draft():
        return gen.generate_kv_cache(
            gpt2, d_params, DRAFT_CFG, prompt, max_gen=MAX_GEN, temp=0.0,
            eos_ids=-1, pad_id=0,
        )["sequences"]

    t_plain, plain_seq = time_call(plain)
    plain_tok_s = MAX_GEN / t_plain
    t_draft, _ = time_call(plain_draft)
    print(f"plain target decode: {plain_tok_s:7.1f} tok/s ({t_plain/MAX_GEN*1e6:.0f} us/tok)",
          flush=True)
    print(f"plain draft  decode: {MAX_GEN/t_draft:7.1f} tok/s ({t_draft/MAX_GEN*1e6:.0f} us/tok; "
          f"draft/target wall ratio {t_draft/t_plain:.2f})", flush=True)

    results = {
        "plain_tok_s": round(plain_tok_s, 1),
        "draft_target_cost_ratio": round(t_draft / t_plain, 3),
    }
    best = 0.0
    for gamma in (4, 8, 12):
        spec = jax.jit(
            lambda gamma=gamma: speculative_generate(
                gpt2, t_params, TARGET_CFG, gpt2, d_params, DRAFT_CFG, prompt,
                max_gen=MAX_GEN, draft_max_gen=gamma, temp=0.0, eos_id=None,
            )
        )
        t_spec, out = time_call(spec)
        n_gen = int(out["num_generated"])
        n_steps = int(out["num_steps"])
        tok_s = n_gen / t_spec
        acc = (n_gen - n_steps) / max(n_steps * gamma, 1)
        sp = tok_s / plain_tok_s
        best = max(best, sp)
        results[f"gamma{gamma}"] = {
            "tok_s": round(tok_s, 1), "speedup": round(sp, 2), "accept": round(acc, 3)}
        print(f"spec γ={gamma:2d}: {tok_s:7.1f} tok/s  speedup {sp:4.2f}x  "
              f"acceptance {acc:5.1%}  ({n_steps} windows for {n_gen} tok)", flush=True)

    match = bool(jnp.all(out["sequences"][:, : PROMPT_LEN + int(out["num_generated"])]
                         == plain_seq[:, : PROMPT_LEN + int(out["num_generated"])]))
    results["lossless_greedy"] = match
    results["best_speedup"] = round(best, 2)
    results["reference_best_speedup"] = 2.15
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
