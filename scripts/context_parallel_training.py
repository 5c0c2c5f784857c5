"""Context-parallel (sequence-sharded) long-context training demonstration.

The reference scales context ALGORITHMICALLY on one device (SURVEY §5.7:
YaRN, SWA, linear attention); context parallelism across the ICI ring is the
TPU build's genuinely new axis. This script trains a Qwen3 model at a
sequence length n_devices× what one chip's attention activations would hold:
``cfg["context_parallel"]`` routes every layer's attention through
``ring_flash_attention`` (parallel/sequence.py) — KV blocks stream around the
ring via ppermute, activations stay sequence-sharded, and the dense (s, s)
mask is never built.

Run on the virtual mesh:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/context_parallel_training.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import optax

BATCH_SIZE = 1
SEQ_PER_DEVICE = 512  # raise to the single-chip limit on real v5e-8
STEPS = 5
PEAK_LR = 3e-4


def main():
    from llm_quest_tpu.models import qwen3
    from llm_quest_tpu.parallel.mesh import create_mesh

    n_dev = jax.device_count()
    mesh = create_mesh(n_dev, model_parallel=1)
    seq = n_dev * SEQ_PER_DEVICE

    cfg = {
        "model_type": "dense", "vocab_size": 512, "context_length": seq, "emb_dim": 128,
        "n_layers": 4, "n_heads": 8, "num_kv_groups": 4, "head_dim": 16, "hidden_dim": 256,
        "rope_base": 100_000, "tie_embeddings": True, "dtype": jnp.float32,
        "context_parallel": {"mesh": mesh, "axis": "data"},
    }
    params = qwen3.init(jax.random.PRNGKey(0), cfg)
    optimizer = optax.adamw(PEAK_LR)
    opt_state = optimizer.init(params)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 512, (BATCH_SIZE, seq)), jnp.int32)
    targets = jnp.roll(ids, -1, 1)

    def loss_fn(p):
        logits, _, _ = qwen3.apply(p, cfg, ids, training=True)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, targets[..., None], axis=-1))

    @jax.jit
    def step(p, o):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = optimizer.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    print(f"context-parallel training: s={seq} over {n_dev} devices "
          f"({SEQ_PER_DEVICE}/device), {sum(x.size for x in jax.tree.leaves(params)):,} params")
    with mesh:
        for i in range(STEPS):
            t0 = time.perf_counter()
            params, opt_state, loss = step(params, opt_state)
            loss = float(loss)
            dt = time.perf_counter() - t0
            print(f"step {i}: loss {loss:.4f}  ({BATCH_SIZE * seq / dt:,.0f} tok/s)")
            assert np.isfinite(loss)
    print("ok: model trained sequence-sharded (ring-flash attention, no dense mask)")


if __name__ == "__main__":
    main()
