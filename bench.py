"""Headline benchmark — prints ONE JSON line for the driver.

North-star metric (BASELINE.json): ViT-B 224px image encode throughput,
images/sec/chip, bf16, batch 128, pure-device time measured via an in-graph
fori_loop (one dispatch + one scalar transfer — the tunnel's
block_until_ready is unreliable for async dispatch). vs_baseline compares
against the 4000 images/sec/chip target.
"""

import json
import time

import jax
import jax.numpy as jnp
from jax import lax


def bench_vit_encode(batch=128, iters=20):
    from llm_quest_tpu.config import VIT_BASE_CONFIG
    from llm_quest_tpu.models import vit

    cfg = dict(VIT_BASE_CONFIG, dtype=jnp.bfloat16, drop_rate=0.0)
    params = vit.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 3, 224, 224), jnp.bfloat16)

    @jax.jit
    def loop(p, x):
        def body(i, acc):
            h = vit.apply(p, cfg, x + acc * 0.0, output_hidden_states=True)  # data-dep: no CSE
            return acc + jnp.sum(h[:, 0, :8].astype(jnp.float32))

        return lax.fori_loop(0, iters, body, 0.0)

    float(loop(params, x))  # compile + warm
    t0 = time.perf_counter()
    float(loop(params, x))
    dt = (time.perf_counter() - t0) / iters
    return batch / dt


if __name__ == "__main__":
    img_s = bench_vit_encode()
    target = 4000.0  # BASELINE.json north-star: >=4k 224px images/sec/chip ViT-B encode
    print(
        json.dumps(
            {
                "metric": "vit_b_224px_encode_images_per_sec_chip",
                "value": round(img_s, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(img_s / target, 3),
            }
        )
    )
