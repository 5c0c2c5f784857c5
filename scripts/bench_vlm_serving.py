"""MULTIMODAL continuous serving at flagship scale (Qwen3.5-0.8B VLM).

The composition is correctness-tested (tests/test_serving.py::
test_serving_multimodal_vlm); this measures it on the real chip: N
image+text requests (each with its OWN 384px image — encoded ONCE at
admission, 144 merged vision tokens) through the continuous-batching
engine. Reports useful generated-token throughput, TTFT p50/p95 (includes
the vision encode), and MFU/MBU context.

Methodology: the full workload is served once untimed (compiles every
admit-wave shape + the decode program), then timed runs take the median —
no compile lands in the timed region (round-3 lesson, VERDICT Weak #1).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_vlm_serving.py
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
from llm_quest_tpu.training import flops as F  # noqa: E402

N_REQ = int(os.environ.get("VS_REQS", "32"))
N_SLOTS = int(os.environ.get("VS_SLOTS", "16"))
CHUNK = int(os.environ.get("VS_CHUNK", "16"))
N_RUNS = int(os.environ.get("VS_RUNS", "3"))
# A/B: serve the SAME 156-token prompts with NO images through the same
# engine config — isolates the vision-encode share of the multimodal gap
# (admit waves, 160-bucket prefill, and scheduling cost are identical)
TEXT_ONLY = os.environ.get("VS_TEXT_ONLY", "0") == "1"


class VLM:
    apply = staticmethod(qwen3_5.apply)
    init_cache = staticmethod(qwen3_5.init_cache)


def main():
    cfg = dict(config.QWEN3_5_08B_CONFIG, dtype=jnp.bfloat16)
    params = qwen3_5.init(jax.random.PRNGKey(0), cfg)
    n_vis = (384 // cfg["patch_size"]) ** 2 // cfg["spatial_merge_size"] ** 2  # 144

    rng = np.random.default_rng(0)
    reqs = []
    for _ in range(N_REQ):
        prompt = (rng.integers(1, 1000, size=4).tolist()
                  + [cfg["image_token_id"]] * n_vis
                  + rng.integers(1, 1000, size=8).tolist())  # 156 tokens
        # uint8 images + on-device normalize (pixel_transform): the wire
        # carries 1/4 the float32 bytes — with the async submit-time upload
        # this is what closes the measured pixel-feed gap (round 5)
        img = rng.integers(0, 256, size=(3, 2, 384, 384), dtype=np.uint8)
        reqs.append((prompt, int(rng.integers(16, 65)), img))

    eng = ContinuousBatchingEngine(
        VLM, params, cfg, n_slots=N_SLOTS, max_len=256, decode_chunk=CHUNK,
        prefill_buckets=(160,), temp=0.0, eos_ids=-1, pad_id=0,
        pixel_transform=lambda px: (px.astype(jnp.bfloat16) - 127.5) / 58.0,
    )

    def serve_all():
        rids = [eng.submit(p, g, pixels=None if TEXT_ONLY else img) for p, g, img in reqs]
        while eng.step():
            pass
        return rids

    # warm EVERY (bucket, wave-size) VLM admit program + the decode chunk:
    # a bare serve only compiles the wave sizes its own retirement pattern
    # happens to hit, and a later timed run hitting a fresh size pays a
    # mid-flight compile (measured as a 187-467 tok/s spread, round 5)
    eng.warmup(image_shape=None if TEXT_ONLY else reqs[0][2].shape)
    serve_all()  # exercise the live scheduling path once
    rates = []
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        rids = serve_all()
        dt = time.perf_counter() - t0
        rates.append(sum(len(eng._requests[r].tokens) for r in rids) / dt)
    st = eng.stats()
    useful = statistics.median(rates)
    # TTFT percentiles from the LAST timed run (includes the vision encode
    # + 156-token prefill + queue wait under the busy pool)
    ttfts = sorted(eng._requests[r].t_first - eng._requests[r].t_submit for r in rids)

    out = {
        "workload": f"{N_REQ} reqs, 156-tok prompt w/ 384px image each, gen U[16,64]",
        "n_slots": N_SLOTS, "decode_chunk": CHUNK, "text_only_ab": TEXT_ONLY,
        "useful_tok_s_chip": round(useful, 1),
        "spread_tok_s": [round(min(rates), 1), round(max(rates), 1)],
        "ttft_p50_ms": round(ttfts[len(ttfts) // 2] * 1e3, 1),
        "ttft_p95_ms": round(ttfts[int(len(ttfts) * 0.95)] * 1e3, 1),
        "slot_utilization": round(st["slot_utilization"], 3),
        "decode_mfu": round(F.mfu(useful, F.text_forward_flops_per_token(cfg, kv_len=200)), 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
