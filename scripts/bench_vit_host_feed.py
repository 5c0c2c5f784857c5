"""ViT-B encode with a REAL host-side uint8 feed (SURVEY §7.3 #7).

Round-2's 3628 img/s number fed on-device random bf16 pixels; the north-star
claim is that *preprocessing pipelined with encode* never starves the ViT.
This measures the full host→device→encode pipeline:

  - host holds uint8 (b, 3, 224, 224) batches (numpy, as a data loader would)
  - normalization is FOLDED into the patch-embed weights
    (multimodal/preprocessing.py) so the device consumes raw uint8 — the
    transfer is 4× smaller than fp32 (the actual feed bottleneck at 4k img/s:
    4000·3·224²·4 B = 2.4 GB/s fp32 vs 0.6 GB/s uint8 over PCIe/tunnel)
  - double buffering: batch i+1's device_put is issued while batch i encodes,
    so transfer and compute overlap

Prints device-only throughput (folded-uint8 encode), single-buffered
host-feed throughput, and double-buffered host-feed throughput.

MEASURED (v5e-1 over the axon tunnel, 2026-08-17): single-buffered 152
img/s, double-buffered 213 img/s (1.40× — the overlap works), device-
resident 2006 img/s (RTT-polluted; the in-graph number is ~3.8k). The
absolute host-feed rate here is the TUNNEL's ~23 MB/s (152 img/s ×
150 KB/img), not a chip property: on real hardware the feed rides PCIe at
GB/s, where uint8's 4× reduction (0.6 vs 2.4 GB/s at 4k img/s) plus this
double buffering is exactly what keeps the ViT from starving.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_vit_host_feed.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from llm_quest_tpu import config
from llm_quest_tpu.models import vit
from llm_quest_tpu.multimodal.preprocessing import make_uint8_encoder

B = 128
N_BATCHES = 30
MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)


def main():
    assert jax.default_backend() == "tpu", jax.devices()
    cfg = dict(config.VIT_BASE_CONFIG, dtype=jnp.bfloat16)
    params = vit.init(jax.random.PRNGKey(0), cfg)
    encode = make_uint8_encoder(vit, params, cfg, MEAN, STD)

    rng = np.random.default_rng(0)
    host_batches = [rng.integers(0, 256, (B, 3, 224, 224), np.uint8) for _ in range(4)]

    # tie each encode to a scalar so completion is observable with ONE
    # transfer (block_until_ready can return early over the axon tunnel)
    def encode_tick(x):
        return encode(x)[0, 0, 0].astype(jnp.float32)

    dev = jax.devices()[0]

    # --- device-only (upper bound): batch already resident ---
    resident = jax.device_put(host_batches[0], dev)
    float(encode_tick(resident))  # compile
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(N_BATCHES):
        acc += float(encode_tick(resident))
    dt = time.perf_counter() - t0
    print(f"device-resident uint8 encode: {N_BATCHES*B/dt:8,.0f} img/s", flush=True)

    # --- single-buffered host feed: put, then encode, serially ---
    t0 = time.perf_counter()
    for i in range(N_BATCHES):
        x = jax.device_put(host_batches[i % 4], dev)
        acc += float(encode_tick(x))
    dt = time.perf_counter() - t0
    print(f"host-feed single-buffered:    {N_BATCHES*B/dt:8,.0f} img/s", flush=True)

    # --- double-buffered: issue batch i+1's transfer before consuming i's
    # result; one float() per batch keeps the pipeline one deep ---
    nxt = jax.device_put(host_batches[0], dev)
    t0 = time.perf_counter()
    pending = None
    for i in range(N_BATCHES):
        cur = nxt
        tick = encode_tick(cur)  # enqueued, async
        nxt = jax.device_put(host_batches[(i + 1) % 4], dev)  # overlaps encode
        if pending is not None:
            acc += float(pending)
        pending = tick
    acc += float(pending)
    dt = time.perf_counter() - t0
    print(f"host-feed double-buffered:    {N_BATCHES*B/dt:8,.0f} img/s   (checksum {acc:.1f})",
          flush=True)


if __name__ == "__main__":
    main()
