"""Speculative-decoding speedup benchmark (reference baseline:
speculative_decoding/README.md:60-76 — avg 1.85x, best γ=4 at 2.15x).

The reference benchmarks GPT-2 124M (draft) + 774M (target) with real
weights; this environment has no hub egress, so the honest equivalent is a
pair of models TRAINED HERE on a low-entropy Markov corpus: a 6-layer target
and a 2-layer draft learn the same transition structure, giving a
non-trivial greedy acceptance rate exactly like a distilled draft does.

Measures plain cached decode vs speculative decode for γ ∈ {1, 2, 4, 8},
greedy, and prints a table plus one JSON summary line.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from llm_quest_tpu.models import gpt2
from llm_quest_tpu.inference import generate as gen
from llm_quest_tpu.inference.spec_decoding import speculative_generate
from llm_quest_tpu.ops.losses import cross_entropy

VOCAB = 512
SEQ = 128
PROMPT_LEN = 16
MAX_GEN = int(os.environ.get("SPEC_MAX_GEN", 200))
TRAIN_STEPS = int(os.environ.get("SPEC_TRAIN_STEPS", 300))
BATCH = 32

TARGET_CFG = {
    "vocab_size": VOCAB, "context_length": PROMPT_LEN + MAX_GEN + 24, "emb_dim": 384,
    "n_heads": 6, "n_layers": 6, "drop_rate": 0.0, "qkv_bias": True,
}
DRAFT_CFG = {
    "vocab_size": VOCAB, "context_length": PROMPT_LEN + MAX_GEN + 24, "emb_dim": 192,
    "n_heads": 3, "n_layers": 2, "drop_rate": 0.0, "qkv_bias": True,
}


def markov_corpus(n_tokens, seed=0, branch=4):
    """Low-entropy Markov chain: each state transitions to one of `branch`
    successors with geometric-ish probabilities (dominant mode ~60%)."""
    rng = np.random.default_rng(seed)
    succ = rng.integers(0, VOCAB, size=(VOCAB, branch))
    p = np.asarray([0.6, 0.25, 0.1, 0.05][:branch])
    p = p / p.sum()
    out = np.empty(n_tokens, np.int32)
    s = 0
    for i in range(n_tokens):
        s = succ[s, rng.choice(branch, p=p)]
        out[i] = s
    return out


def train(model, cfg, corpus, steps, seed):
    params = model.init(jax.random.PRNGKey(seed), cfg)
    opt = optax.adamw(3e-4, weight_decay=0.01)
    opt_state = opt.init(params)
    n_windows = (len(corpus) - 1) // SEQ
    inputs = corpus[: n_windows * SEQ].reshape(-1, SEQ)
    targets = corpus[1 : n_windows * SEQ + 1].reshape(-1, SEQ)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits, _, _ = model.apply(p, cfg, x)
            return cross_entropy(logits, y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    loss = None
    for i in range(steps):
        idx = rng.integers(0, n_windows, size=BATCH)
        params, opt_state, loss = step(params, opt_state, jnp.asarray(inputs[idx]), jnp.asarray(targets[idx]))
    return params, float(loss)


def time_call(fn, n=5):
    """Time n dispatches + ONE host transfer (programs execute in order on
    the single TPU stream, so the final transfer syncs them all); the
    measured RTT of a bare transfer is subtracted. block_until_ready is NOT
    trusted — it can return early over the axon tunnel."""
    out = fn()  # compile + warm
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


TINY_DRAFT_CFG = {
    "vocab_size": VOCAB, "context_length": PROMPT_LEN + MAX_GEN + 24, "emb_dim": 128,
    "n_heads": 2, "n_layers": 1, "drop_rate": 0.0, "qkv_bias": True,
}


def distill(model, cfg, teacher_params, teacher_cfg, corpus, steps, seed):
    """Train a draft on the TARGET's soft distributions (true distillation —
    the reference pairs GPT-2 124M/774M, which are distill-adjacent by
    shared pretraining; a Markov-trained draft is the weaker analogue)."""
    params = model.init(jax.random.PRNGKey(seed), cfg)
    opt = optax.adamw(6e-4, weight_decay=0.01)
    opt_state = opt.init(params)
    n_windows = (len(corpus) - 1) // SEQ
    inputs = corpus[: n_windows * SEQ].reshape(-1, SEQ)

    @jax.jit
    def step(params, opt_state, x):
        t_logits, _, _ = gpt2.apply(teacher_params, teacher_cfg, x)
        t_logp = jax.nn.log_softmax(t_logits.astype(jnp.float32), axis=-1)

        def loss_fn(p):
            logits, _, _ = model.apply(p, cfg, x)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            return jnp.mean(jnp.sum(jnp.exp(t_logp) * (t_logp - logp), axis=-1))  # KL(t||s)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    loss = None
    for i in range(steps):
        idx = rng.integers(0, n_windows, size=BATCH)
        params, opt_state, loss = step(params, opt_state, jnp.asarray(inputs[idx]))
    return params, float(loss)


def profile_split(t_params, d_params, d_cfg, prompt, gammas):
    """Measured verify/draft cost split: per-token decode cost of each model
    alone, plus the (γ+1)-window target verify, via the same whole-loop jits."""
    print("\n--- cost split profile ---", flush=True)

    def model_decode(model, params, cfg):
        def run():
            return gen.generate_kv_cache(
                model, params, cfg, prompt, max_gen=MAX_GEN, temp=0.0, eos_ids=-1, pad_id=0
            )["sequences"]

        t, _ = time_call(run)
        return t / MAX_GEN

    t_tgt = model_decode(gpt2, t_params, TARGET_CFG)
    t_dft = model_decode(gpt2, d_params, d_cfg)
    print(f"target step: {t_tgt*1e6:7.1f} us/tok   draft step: {t_dft*1e6:7.1f} us/tok "
          f"(ratio {t_dft/t_tgt:.2f} — FLOP ratio would be ~{_flop_ratio(d_cfg):.2f})", flush=True)

    for gamma in gammas:
        # verify cost: target over a (1, γ+1) cached window, N times in one jit
        cache0 = gpt2.init_cache(TARGET_CFG, 1, PROMPT_LEN + MAX_GEN + 24)
        window = jnp.zeros((1, gamma + 1), jnp.int32)

        @jax.jit
        def verify_loop(params, cache):
            def body(i, carry):
                cache, acc = carry
                cache = {**cache, "pos": PROMPT_LEN}
                logits, cache, _ = gpt2.apply(params, TARGET_CFG, window + (acc % 7).astype(jnp.int32),
                                              cache=cache)
                return (cache, acc + logits[0, -1, 0].astype(jnp.float32))

            _, acc = jax.lax.fori_loop(0, 50, body, (cache, jnp.float32(0)))
            return acc

        float(verify_loop(t_params, cache0))  # compile; float = true sync (tunnel)
        t0 = time.perf_counter()
        float(verify_loop(t_params, cache0))
        t_ver = (time.perf_counter() - t0) / 50
        model_cost = gamma * t_dft + t_ver
        model_speedup = lambda a: (gamma * a + 1) * t_tgt / model_cost
        print(f"γ={gamma:2d}: verify {t_ver*1e6:7.1f} us/window  draft {gamma*t_dft*1e6:7.1f} us  "
              f"→ draft share {gamma*t_dft/model_cost:5.1%}; model speedup at a=0.85: "
              f"{model_speedup(0.85):.2f}x", flush=True)
    return t_tgt, t_dft


def _flop_ratio(d_cfg):
    f = lambda c: c["n_layers"] * c["emb_dim"] ** 2 * 12
    return f(d_cfg) / f(TARGET_CFG)


def scale_projection():
    """Measured cost structure at the REFERENCE's model scale (GPT-2 124M
    draft + 774M target, random weights — step costs don't depend on the
    weights), combined with this harness's measured acceptance rates. At toy
    scale the ~110 µs/step dispatch floor makes the draft as expensive as the
    target (FLOP ratio 2% but wall-clock ratio ~1), capping speedup below 2×;
    this measures whether v5e clears 2× once the FLOP ratio materializes."""
    print("\n--- reference-scale cost projection (random weights) ---", flush=True)
    cfg_124 = {"vocab_size": 50_257, "context_length": 256, "emb_dim": 768,
               "n_heads": 12, "n_layers": 12, "drop_rate": 0.0, "qkv_bias": True}
    cfg_774 = {"vocab_size": 50_257, "context_length": 256, "emb_dim": 1280,
               "n_heads": 20, "n_layers": 36, "drop_rate": 0.0, "qkv_bias": True}
    prompt = jnp.ones((1, 16), jnp.int32)

    costs = {}
    for name, cfg in (("draft-124M", cfg_124), ("target-774M", cfg_774)):
        params = gpt2.init(jax.random.PRNGKey(0), dict(cfg, dtype=jnp.bfloat16))

        def run(params=params, cfg=cfg):
            return gen.generate_kv_cache(
                gpt2, params, cfg, prompt, max_gen=128, temp=0.0, eos_ids=-1, pad_id=0
            )["sequences"]

        t, _ = time_call(run, n=3)
        costs[name] = t / 128
        print(f"{name}: {t/128*1e6:8.1f} us/step", flush=True)

        if name == "target-774M":
            for gamma in (4, 8):
                cache0 = gpt2.init_cache(cfg, 1, 256)
                window = jnp.zeros((1, gamma + 1), jnp.int32)

                @jax.jit
                def vloop(params, cache, window=window):
                    def body(i, carry):
                        cache, acc = carry
                        cache = {**cache, "pos": 16}
                        logits, cache, _ = gpt2.apply(
                            params, cfg, window + (acc % 7).astype(jnp.int32), cache=cache)
                        return (cache, acc + logits[0, -1, 0].astype(jnp.float32))
                    _, acc = jax.lax.fori_loop(0, 20, body, (cache, jnp.float32(0)))
                    return acc

                float(vloop(params, cache0))
                t0 = time.perf_counter()
                float(vloop(params, cache0))
                t_ver = (time.perf_counter() - t0) / 20
                c_d, c_t = costs["draft-124M"], costs["target-774M"]
                for a in (0.70, 0.80):
                    proj = (gamma * a + 1) * c_t / (gamma * c_d + t_ver)
                    print(f"γ={gamma} verify {t_ver*1e6:7.1f} us; projected speedup at "
                          f"acceptance {a:.0%}: {proj:.2f}x", flush=True)


def main():
    corpus = markov_corpus(200_000)
    print("training target (6L/384d)...", flush=True)
    t_params, t_loss = train(gpt2, TARGET_CFG, corpus, TRAIN_STEPS, seed=1)
    print(f"  target final loss {t_loss:.3f}", flush=True)
    print("training draft (2L/192d)...", flush=True)
    d_params, d_loss = train(gpt2, DRAFT_CFG, corpus, TRAIN_STEPS, seed=2)
    print(f"  draft final loss {d_loss:.3f}", flush=True)
    print("distilling tiny draft (1L/128d) from the target...", flush=True)
    tiny_params, kl = distill(gpt2, TINY_DRAFT_CFG, t_params, TARGET_CFG, corpus,
                              TRAIN_STEPS, seed=3)
    print(f"  tiny draft final KL {kl:.3f}", flush=True)

    prompt = jnp.asarray(corpus[:PROMPT_LEN][None].astype(np.int32))

    def plain():
        return gen.generate_kv_cache(
            gpt2, t_params, TARGET_CFG, prompt, max_gen=MAX_GEN, temp=0.0, eos_ids=-1, pad_id=0
        )["sequences"]

    t_plain, plain_seq = time_call(plain)
    plain_toks = MAX_GEN
    plain_tok_s = plain_toks / t_plain
    print(f"plain decode:  {plain_tok_s:8.1f} tok/s  ({t_plain*1e3:.1f} ms / {plain_toks} tok)", flush=True)

    results = {"plain_tok_s": round(plain_tok_s, 1)}
    speedups = []
    best = 0.0
    for draft_name, dp, dc in (("2L/192 markov", d_params, DRAFT_CFG),
                               ("1L/128 distilled", tiny_params, TINY_DRAFT_CFG)):
        print(f"-- draft: {draft_name} --", flush=True)
        for gamma in (1, 2, 4, 8, 12, 16):
            spec = jax.jit(
                lambda dp=dp, dc=dc, gamma=gamma: speculative_generate(
                    gpt2, t_params, TARGET_CFG, gpt2, dp, dc, prompt,
                    max_gen=MAX_GEN, draft_max_gen=gamma, temp=0.0, eos_id=None,
                )
            )
            t_spec, out = time_call(spec)
            n_gen = int(out["num_generated"])
            n_steps = int(out["num_steps"])
            tok_s = n_gen / t_spec
            # per step the target commits n_accepted+1 tokens; acceptance rate
            # = fraction of drafted tokens kept
            acc = (n_gen - n_steps) / max(n_steps * gamma, 1)
            sp = tok_s / plain_tok_s
            if draft_name.endswith("markov") and gamma in (1, 2, 4, 8):
                speedups.append(sp)  # keep the reference-comparable avg
            best = max(best, sp)
            key = f"gamma{gamma}" + ("" if draft_name.endswith("markov") else "_distilled")
            results[key] = {"tok_s": round(tok_s, 1), "speedup": round(sp, 2), "accept": round(acc, 3)}
            print(
                f"spec γ={gamma:2d}:    {tok_s:8.1f} tok/s  speedup {sp:4.2f}x  "
                f"acceptance {acc:5.1%}  ({n_steps} steps for {n_gen} tok)",
                flush=True,
            )

    profile_split(t_params, tiny_params, TINY_DRAFT_CFG, prompt, (4, 8, 16))
    scale_projection()

    # greedy losslessness sanity: spec output must match plain decode
    match = bool(jnp.all(out["sequences"][:, : PROMPT_LEN + int(out["num_generated"])]
                         == plain_seq[:, : PROMPT_LEN + int(out["num_generated"])]))
    results["lossless_greedy"] = match
    results["avg_speedup"] = round(float(np.mean(speedups)), 2)
    results["best_speedup"] = round(best, 2)
    results["reference_avg_speedup"] = 1.85
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
