"""Headline benchmark — prints ONE JSON line for the driver.

Headline metric (BASELINE.json): Qwen3.5-0.8B-config MULTIMODAL decode,
tokens/sec/chip — encode a 384px image once, prefill the hybrid
(KV+conv+recurrent) cache, greedy-decode 64 tokens, all as one jitted
program (models/qwen3_5.py::generate_multimodal).

vs_baseline: ≥2× the PyTorch-CPU reference (BASELINE.json). The reference's
own multimodal decode path (Qwen3_5VLM + generate_loop via vlm_arg_wrapper,
qwen3_5_generate_multimodal.py:107-123 — uncached, re-encodes the image
every step) measures 0.116 tok/s fp32 on this host's CPU → bar = 0.232.

Methodology (round 5 adds): decode_mbu at b=32/128, serving_mbu, the
int8-weights+embeddings serving config, and a heterogeneous serving bench
(mixed prompt lengths + per-request sampling). Round 4:
- every decode metric is the MEDIAN of N timed runs with min/max spread
  reported (single-run timings over the ~35 ms-RTT tunnel swing ±7%);
- the serving bench calls engine.warmup() so program compiles never land
  inside the timed region (round-3's graded 21.1 tok/s was compile time);
- every throughput carries a hardware-utilization number: MFU (vs 197
  bf16 TFLOP/s v5e peak) for compute-bound work (encode, training), MBU
  (vs 819 GB/s HBM peak) for bandwidth-bound small-batch decode.

"extra" carries the rest of the BASELINE.json north-star metrics:
- text_decode_tok_s: Qwen3.5-0.8B text-only cached decode (b=1, 32+64) vs
  the 2× torch-CPU cached-text bar (3.73 → 7.46 tok/s; that reference path
  DOES cache, utils.py:535-624).
- serving_useful_tok_s_chip: continuous-batching engine, 48 heterogeneous
  requests over 32 slots, generated-token throughput after warmup.
- vit_encode_img_s: ViT-B 224px encode, b=128, bf16, in-graph loop.
- train_tok_s_chip: Qwen3-dense ~300M train step (b=4, s=2048, bf16,
  flash attention) — the training-MFU workload.
- ttft_p50_ms: p50 time-to-first-token for the multimodal prompt (vision
  encode + prefill + 1 token, jitted; includes the host round-trip).
"""

import json
import os
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: the benches compile ~8 large programs
# (minutes over the tunneled backend); warm runs skip that entirely
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/llm_quest_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

TORCH_CPU_MM_TOK_S = 0.116  # measured: reference VLM multimodal decode (uncached re-encode path)
TORCH_CPU_TEXT_TOK_S = 3.73  # measured: reference Qwen3_5TextModel + Qwen3_5Cache fp32 decode
MM_BASELINE = 2.0 * TORCH_CPU_MM_TOK_S
TEXT_BASELINE = 2.0 * TORCH_CPU_TEXT_TOK_S


def _retry(fn, attempts=3):
    # the tunneled TPU backend intermittently raises FailedPrecondition on
    # host transfers — retry a couple of times before giving up
    for attempt in range(attempts):
        try:
            return fn()
        except Exception:
            if attempt == attempts - 1:
                raise
            time.sleep(10)


def _median_timed(fn, n=5):
    """Median + spread of n timed calls (fn must force completion). The
    caller warms/compiles first; single-run timings over the tunnel are
    ±7% noise (round-3's 367.8→344.0 'regression' was exactly this)."""
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return statistics.median(samples), min(samples), max(samples)


def _vlm_setup():
    from llm_quest_tpu import config
    from llm_quest_tpu.models import qwen3_5

    cfg = dict(config.QWEN3_5_08B_CONFIG, dtype=jnp.bfloat16)
    params = qwen3_5.init(jax.random.PRNGKey(0), cfg)

    # 384x384 image, temporal-duplicated → (1, 3, 2, 384, 384); 144 merged
    # vision tokens (the reference multimodal script's exact shapes)
    pixels = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 2, 384, 384), jnp.bfloat16)
    n_vis = (384 // cfg["patch_size"]) ** 2 // cfg["spatial_merge_size"] ** 2
    rng = np.random.default_rng(0)
    text_a = rng.integers(1, 1000, size=4).tolist()
    text_b = rng.integers(1, 1000, size=8).tolist()
    ids = np.asarray([text_a + [cfg["image_token_id"]] * n_vis + text_b], np.int32)
    return qwen3_5, params, cfg, jnp.asarray(ids), pixels


def bench_vlm_decode(max_gen=64, n_runs=5):
    qwen3_5, params, cfg, ids, pixels = _vlm_setup()

    def run():
        out = qwen3_5.generate_multimodal(
            params, cfg, ids, pixels, max_gen=max_gen, temp=0.0, eos_ids=-1, pad_id=0
        )
        return int(out["sequences"][0, -1])  # force completion

    run()  # compile
    med, lo, hi = _median_timed(run, n_runs)
    tok_s = max_gen / med
    spread = (max_gen / hi, max_gen / lo)

    # TTFT: vision encode + prefill + first token as its own jitted program
    def first_token():
        out = qwen3_5.generate_multimodal(
            params, cfg, ids, pixels, max_gen=1, temp=0.0, eos_ids=-1, pad_id=0
        )
        return int(out["sequences"][0, -1])

    first_token()  # compile
    samples = []
    for _ in range(11):
        t0 = time.perf_counter()
        first_token()
        samples.append((time.perf_counter() - t0) * 1e3)
    return tok_s, spread, statistics.median(samples)


def bench_text_decode(batch=1, prompt_len=32, max_gen=64, int8=False, n_runs=5):
    from llm_quest_tpu import config
    from llm_quest_tpu.inference import generate as gen
    from llm_quest_tpu.models import qwen3_5
    from llm_quest_tpu.training import flops as F

    cfg = dict(config.QWEN3_5_08B_CONFIG, dtype=jnp.bfloat16)
    params = qwen3_5.init_text(jax.random.PRNGKey(0), cfg)
    if int8:
        from llm_quest_tpu.ops.quantization import quantize_params_int8

        # quantize_embeddings: Qwen3.5 ties the head, so the 248,320-row
        # vocab table (508 MB bf16 — the largest single matrix,
        # config.py:318) is streamed per token through the head matmul;
        # per-row int8 halves it (exact column-scale epilogue).
        # Measured b=1: 502 → 624 tok/s.
        params = quantize_params_int8(
            jax.tree.map(lambda x: x.astype(jnp.bfloat16), params),
            quantize_embeddings=True,
        )

    class TextModel:
        apply = staticmethod(qwen3_5.apply_text)
        init_cache = staticmethod(qwen3_5.init_cache)

    prompt = jax.random.randint(jax.random.PRNGKey(1), (batch, prompt_len), 0, 1000)

    def run():
        out = gen.generate_kv_cache(
            TextModel, params, cfg, prompt, max_gen=max_gen, temp=0.0, eos_ids=-1, pad_id=0
        )
        return int(out["sequences"][0, -1])

    run()  # compile
    med, lo, hi = _median_timed(run, n_runs)
    tok_s = batch * max_gen / med
    # decode is weight-streaming-bound at b=1: report MBU (and MFU for scale)
    bytes_tok = F.decode_bytes_per_token(params, cfg, kv_len=prompt_len + max_gen // 2, batch=batch)
    mbu = F.mbu(tok_s, bytes_tok)
    mfu = F.mfu(tok_s, F.text_forward_flops_per_token(cfg, kv_len=prompt_len + max_gen // 2))
    return tok_s, (batch * max_gen / hi, batch * max_gen / lo), mbu, mfu


def bench_serving(n_reqs=48, n_slots=32, decode_chunk=64, n_runs=3, int8=False):
    """Continuous-batching engine on the flagship 0.8B hybrid: useful
    generated-token throughput for a heterogeneous workload (prompt 32,
    gens U[16, 64]), 32 slots (48 requests oversubscribe → slot reuse is
    exercised). engine.warmup() pre-executes every admit-wave shape + the
    decode program so NO compile lands in the timed region, and resolves
    pipeline depth adaptively (→1 here: chunk compute >> dispatch RTT);
    median of n_runs serves.

    Round-4 sweep at this workload (32 slots unless noted, median-of-3):
    chunk32/depth2 1567 · chunk32/depth1 2028 · chunk16 2057 ·
    chunk64 2187 · 64-slot single-wave chunk64 2463 tok/s. chunk=64 wins
    because b=32 decode is bandwidth-bound — idle rows are nearly free
    while scheduler round-trips are not; 64 slots removes oversubscription
    (no slot reuse), so the graded config keeps 32. Round 5 lifts the same
    config to ~3020-3070 (stacked GDN step kernel + single-chunk admit
    prefills + full-chunk auto-depth timing)."""
    import numpy as np_

    from llm_quest_tpu import config
    from llm_quest_tpu.inference.serving import ContinuousBatchingEngine
    from llm_quest_tpu.models import qwen3_5
    from llm_quest_tpu.training import flops as F

    cfg = dict(config.QWEN3_5_08B_CONFIG, dtype=jnp.bfloat16)
    params = qwen3_5.init_text(jax.random.PRNGKey(0), cfg)
    if int8:
        from llm_quest_tpu.ops.quantization import quantize_params_int8

        params = quantize_params_int8(params, quantize_embeddings=True)

    class TextModel:
        apply = staticmethod(qwen3_5.apply_text)
        init_cache = staticmethod(qwen3_5.init_cache)

    rng = np_.random.default_rng(0)
    reqs = [
        (rng.integers(1, 1000, size=32).tolist(), int(rng.integers(16, 65)))
        for _ in range(n_reqs)
    ]

    eng = ContinuousBatchingEngine(
        TextModel, params, cfg, n_slots=n_slots, max_len=128,
        decode_chunk=decode_chunk, prefill_buckets=(32,), temp=0.0,
        eos_ids=-1, pad_id=0,
    )
    eng.warmup()
    eng.serve(reqs[:4])  # exercise the live scheduling path once

    rates = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        outs = eng.serve(reqs)
        dt = time.perf_counter() - t0
        rates.append(sum(len(o) for o in outs) / dt)
    useful = statistics.median(rates)
    # useful-work MFU: generated tokens × per-token forward FLOPs (padding
    # and rejected slot work excluded — this is the goodput lens). Serving
    # decode is BANDWIDTH-bound at this pool size, so MBU is the primary
    # lens (flops.py:10-13): bytes/token at batch = the slot pool, mean
    # context ~64 — also on the goodput rate, so idle-slot streaming makes
    # it a lower bound.
    mfu = F.mfu(useful, F.text_forward_flops_per_token(cfg, kv_len=64))
    mbu = F.mbu(useful, F.decode_bytes_per_token(params, cfg, kv_len=64, batch=n_slots))
    return useful, (min(rates), max(rates)), mfu, mbu


def bench_serving_hetero(n_reqs=48, n_slots=32, decode_chunk=64, n_runs=3):
    """Heterogeneous serving workload (round 5): prompt lengths U[8,200]
    over prefill buckets (32, 64, 256) — exercising bucket choice and
    mixed-length admission waves — with PER-REQUEST sampling (a mix of
    greedy, temp+top-k, and temp+top-p rows in the same decode chunk).
    The uniform bench above keeps the round-4 comparable config."""
    import numpy as np_

    from llm_quest_tpu import config
    from llm_quest_tpu.inference.serving import ContinuousBatchingEngine
    from llm_quest_tpu.models import qwen3_5
    from llm_quest_tpu.training import flops as F

    cfg = dict(config.QWEN3_5_08B_CONFIG, dtype=jnp.bfloat16)
    params = qwen3_5.init_text(jax.random.PRNGKey(0), cfg)

    class TextModel:
        apply = staticmethod(qwen3_5.apply_text)
        init_cache = staticmethod(qwen3_5.init_cache)

    rng = np_.random.default_rng(1)
    samplers = [
        {},  # engine default (greedy)
        {"temp": 0.8, "top_k": 50},
        {"temp": 0.7, "top_p": 0.9},
        {"temp": 1.0, "min_p": 0.05},
    ]
    reqs = [
        (rng.integers(1, 1000, size=int(rng.integers(8, 201))).tolist(),
         int(rng.integers(16, 65)), samplers[i % len(samplers)])
        for i, _ in enumerate(range(n_reqs))
    ]

    eng = ContinuousBatchingEngine(
        TextModel, params, cfg, n_slots=n_slots, max_len=384,
        decode_chunk=decode_chunk, prefill_buckets=(32, 64, 256), temp=0.0,
        eos_ids=-1, pad_id=0, per_request_sampling=True,
    )
    eng.warmup()

    def serve_all():
        rids = [eng.submit(ids, mg, **kw) for ids, mg, kw in reqs]
        while eng.step():
            pass
        return [eng._requests[rid].tokens for rid in rids]

    serve_all()  # exercise every bucket's live path once
    rates = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        outs = serve_all()
        dt = time.perf_counter() - t0
        rates.append(sum(len(o) for o in outs) / dt)
    useful = statistics.median(rates)
    mbu = F.mbu(useful, F.decode_bytes_per_token(params, cfg, kv_len=168, batch=n_slots))
    return useful, (min(rates), max(rates)), mbu


def bench_vit_encode(batch=128, iters=20, n_runs=3):
    from jax import lax

    from llm_quest_tpu import config
    from llm_quest_tpu.models import vit
    from llm_quest_tpu.training import flops as F

    cfg = dict(config.VIT_BASE_CONFIG, dtype=jnp.bfloat16, drop_rate=0.0)
    params = vit.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 3, 224, 224), jnp.bfloat16)

    # N encodes inside ONE jitted fori_loop with a data dependency chain —
    # per-call host timing is unreliable over the tunneled backend
    @jax.jit
    def run():
        def body(i, carry):
            # cast the chain scalar: x + f32 carry would silently promote the
            # whole encode to f32 (measured 17% slower)
            logits = vit.apply(params, cfg, x + carry.astype(x.dtype))
            return logits[0, 0].astype(jnp.float32) * 1e-30

        return lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(run())  # compile + warm
    med, lo, hi = _median_timed(lambda: float(run()), n_runs)
    img_s = batch * iters / med
    return img_s, F.mfu(img_s, F.vit_flops_per_image(cfg))


def bench_train_step(b=4, s=2048, n_steps=8):
    """Qwen3-dense ~300M train step (bf16, flash attention, fused-head CE,
    donated buffers) — the training-MFU workload.

    Round-4 honest sweep (float(loss) sync; the round-2/3 59.3k figure was a
    block_until_ready early-return artifact over the tunnel): b=4 s=2048
    ckpt-full 27.9k tok/s (.40 MFU) · ckpt-dots 30.4k (.44) · remat-off
    34.3k (.50); b=8 is slightly worse on every policy. The graded config
    runs remat OFF — it fits this model/batch with room (flash keeps
    activations linear in s), so rematerializing is pure waste here; the
    remat knob exists for the configs that don't fit."""
    from llm_quest_tpu import config
    from llm_quest_tpu.models import qwen3
    from llm_quest_tpu.training import flops as F
    from llm_quest_tpu.training.engine import make_optimizer, make_train_step

    cfg = dict(
        config.qwen3_config_creator("temp_dense"),
        n_layers=16, emb_dim=1024, n_heads=16, num_kv_groups=8,
        hidden_dim=3072, context_length=s, dtype=jnp.bfloat16,
        gradient_checkpointing=False,
    )
    params = qwen3.init(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(3e-4)
    opt_state = optimizer.init(params)
    step = make_train_step(qwen3, cfg, optimizer, fused_head_ce=True)

    ids = jnp.asarray(np.random.default_rng(0).integers(0, 32_000, (b, s)), jnp.int32)
    batch = {"input_ids": ids, "targets": jnp.roll(ids, -1, 1)}
    rng = jax.random.PRNGKey(1)

    params, opt_state, loss = step(params, opt_state, batch, rng)  # compile
    float(loss)  # true device sync (block_until_ready returns early over the tunnel)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        params, opt_state, loss = step(params, opt_state, batch, rng)
    float(loss)  # loss depends on the whole chain — one sync
    dt = (time.perf_counter() - t0) / n_steps
    tok_s = b * s / dt
    return tok_s, F.mfu(tok_s, F.text_train_flops_per_token(cfg, seq_len=s))


if __name__ == "__main__":
    # ViT first: the 0.8B VLM/text params otherwise fragment HBM and cost the
    # encode bench ~15% (measured 3051 vs 3628 img/s)
    vit_img_s, vit_mfu = _retry(bench_vit_encode)
    vlm_tok_s, vlm_spread, ttft_p50_ms = _retry(bench_vlm_decode)
    text_tok_s, text_spread, text_mbu, text_mfu = _retry(bench_text_decode)
    # weight-only int8 serving path (ops/quantization.py) — same engine
    int8_tok_s, _, int8_mbu, _ = _retry(lambda: bench_text_decode(int8=True))
    # batched-decode MBU sweep (the round-5 roofline work's graded lens)
    decode_sweep = {}
    for bsz in (32, 128):
        try:
            s_tok_s, _, s_mbu, _ = _retry(lambda b=bsz: bench_text_decode(batch=b))
            decode_sweep[bsz] = (s_tok_s, s_mbu)
        except Exception:
            decode_sweep[bsz] = (None, None)
    try:  # training-step MFU workload (never blocks the headline)
        train_tok_s, train_mfu = _retry(bench_train_step)
    except Exception:
        train_tok_s = train_mfu = None
    try:  # continuous-batching serving throughput (never blocks the headline)
        serving_tok_s, serving_spread, serving_mfu, serving_mbu = _retry(bench_serving)
    except Exception:
        serving_tok_s = serving_spread = serving_mfu = serving_mbu = None
    try:  # int8-weights+embeddings serving (the best honest config, VERDICT r4 #4)
        serving_int8_tok_s, _, _, serving_int8_mbu = _retry(lambda: bench_serving(int8=True))
    except Exception:
        serving_int8_tok_s = serving_int8_mbu = None
    try:  # heterogeneous prompts + per-request sampling (VERDICT r4 #8)
        hetero_tok_s, hetero_spread, hetero_mbu = _retry(bench_serving_hetero)
    except Exception:
        hetero_tok_s = hetero_spread = hetero_mbu = None

    rnd = lambda x, k=1: None if x is None else round(x, k)
    print(
        json.dumps(
            {
                "metric": "qwen3_5_0p8b_multimodal_decode_tok_s_chip",
                "value": round(vlm_tok_s, 1),
                "unit": "tokens/sec/chip",
                "vs_baseline": round(vlm_tok_s / MM_BASELINE, 2),
                "extra": {
                    "vlm_decode_spread_tok_s": [rnd(vlm_spread[0]), rnd(vlm_spread[1])],
                    "text_decode_tok_s_chip": round(text_tok_s, 1),
                    "text_decode_spread_tok_s": [rnd(text_spread[0]), rnd(text_spread[1])],
                    "text_decode_vs_baseline": round(text_tok_s / TEXT_BASELINE, 2),
                    "text_decode_mbu": rnd(text_mbu, 3),
                    "text_decode_mfu": rnd(text_mfu, 4),
                    "text_decode_int8_tok_s_chip": round(int8_tok_s, 1),
                    "text_decode_int8_mbu": rnd(int8_mbu, 3),
                    "decode_tok_s_b32": rnd(decode_sweep[32][0]),
                    "decode_mbu_b32": rnd(decode_sweep[32][1], 3),
                    "decode_tok_s_b128": rnd(decode_sweep[128][0]),
                    "decode_mbu_b128": rnd(decode_sweep[128][1], 3),
                    "serving_useful_tok_s_chip": rnd(serving_tok_s),
                    "serving_spread_tok_s": None if serving_spread is None
                    else [rnd(serving_spread[0]), rnd(serving_spread[1])],
                    "serving_mfu": rnd(serving_mfu, 3),
                    "serving_mbu": rnd(serving_mbu, 3),
                    "serving_int8_tok_s_chip": rnd(serving_int8_tok_s),
                    "serving_int8_mbu": rnd(serving_int8_mbu, 3),
                    "serving_hetero_tok_s_chip": rnd(hetero_tok_s),
                    "serving_hetero_spread_tok_s": None if hetero_spread is None
                    else [rnd(hetero_spread[0]), rnd(hetero_spread[1])],
                    "serving_hetero_mbu": rnd(hetero_mbu, 3),
                    "train_dense300m_tok_s_chip": rnd(train_tok_s),
                    "train_dense300m_mfu": rnd(train_mfu, 3),
                    "vit_b_224_encode_img_s_chip": round(vit_img_s, 1),
                    "vit_encode_mfu": rnd(vit_mfu, 3),
                    "vit_encode_vs_north_star_4000": round(vit_img_s / 4000.0, 2),
                    "ttft_p50_ms": round(ttft_p50_ms, 1),
                },
            }
        )
    )
