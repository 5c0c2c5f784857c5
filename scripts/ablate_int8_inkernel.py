"""IN-KERNEL int8-score quantization: the last untried ViT-B variant.

Round-3 verdict trail (COVERAGE.md round-3 ablation notes):
- int8 score matmuls beat bf16 1.59x at the attention-core shape (the
  small-K single-MXU bound is arithmetic-specific);
- but quantizing q/k as a fused epilogue of the projections lost
  end-to-end (3553 vs bf16's 3814 img/s) — the int8 materialization /
  relayout traffic erased the core win.

The one untried shape: keep q/k bf16 in HBM (projections unchanged from
the bf16 path — zero extra traffic) and round/clip to int8 INSIDE the
attention kernel, VMEM-locally, with calibrated static scales folded to
compile-time constants (kernels/fused_mha.py::packed_mha_int8_inkernel).
The question this answers: is the VPU quantize + int8 relayout cost in
VMEM smaller than the int8 MXU rate gain?

Measures the full ViT-B/224 b=128 encode (in-graph fori_loop, the
bench.py methodology) in three modes: bf16, epilogue-int8 (round-3
loser), in-kernel-int8 — plus a numeric sanity check between modes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/ablate_int8_inkernel.py
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/llm_quest_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from llm_quest_tpu import config  # noqa: E402
from llm_quest_tpu.models import vit  # noqa: E402

B = int(os.environ.get("IK_BATCH", "128"))
ITERS = int(os.environ.get("IK_ITERS", "20"))
N_RUNS = int(os.environ.get("IK_RUNS", "3"))


def encode_rate(cfg, params, x, tag):
    @jax.jit
    def run():
        def body(i, carry):
            logits = vit.apply(params, cfg, x + carry.astype(x.dtype))
            return logits[0, 0].astype(jnp.float32) * 1e-30

        return lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    float(run())  # compile + warm
    best = 0.0
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        float(run())
        best = max(best, B * ITERS / (time.perf_counter() - t0))
    print(json.dumps({tag: round(best, 1)}), flush=True)
    return best


def main():
    assert jax.default_backend() == "tpu", jax.devices()
    base = dict(config.VIT_BASE_CONFIG, dtype=jnp.bfloat16, drop_rate=0.0)
    params = vit.init(jax.random.PRNGKey(0), base)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 3, 224, 224), jnp.bfloat16)

    scales = vit.calibrate_int8_scales(params, base, x[:16])

    cfg_ep = dict(base, int8_scores=True, int8_qk_scales=tuple(map(tuple, scales)))
    cfg_ik = dict(cfg_ep, int8_scores_mode="inkernel")

    # numeric sanity: the two int8 modes quantize identically (same scales),
    # so their logits must agree tightly; vs bf16 the int8 deviation bound
    logit_bf = vit.apply(params, base, x[:16])
    logit_ep = vit.apply(params, cfg_ep, x[:16])
    logit_ik = vit.apply(params, cfg_ik, x[:16])
    print(json.dumps({
        "max|ik-ep|": float(jnp.max(jnp.abs(logit_ik - logit_ep))),
        "max|ik-bf16|": float(jnp.max(jnp.abs(logit_ik - logit_bf))),
    }), flush=True)

    r_bf = encode_rate(base, params, x, "bf16_img_s")
    r_ep = encode_rate(cfg_ep, params, x, "int8_epilogue_img_s")
    r_ik = encode_rate(cfg_ik, params, x, "int8_inkernel_img_s")

    print(json.dumps({
        "inkernel_vs_bf16": round(r_ik / r_bf, 3),
        "inkernel_vs_epilogue": round(r_ik / r_ep, 3),
        "clears_4000": bool(r_ik >= 4000.0),
    }))


if __name__ == "__main__":
    main()
