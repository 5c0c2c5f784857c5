"""Hyper-connected Qwen3 convergence script
(reference: common/hyper_connections/hyper_qwen3_training.py): trains the
HC-wrapped Qwen3 and a plain baseline side by side on the same data so the
convergence benefit (or cost) of hc/mhc/mhc-lite is directly visible.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from llm_quest_tpu.models import hyper_qwen3, qwen3
from llm_quest_tpu.ops.losses import cross_entropy

HC_TYPE = "mhc-lite"  # "hc" | "mhc" | "mhc-lite"
EXPANSION_RATE = 4
STEPS = 30
LR = 3e-4

CFG = {
    "model_type": "dense", "vocab_size": 512, "context_length": 128, "emb_dim": 128,
    "n_layers": 4, "n_heads": 4, "num_kv_groups": 2, "head_dim": 32, "hidden_dim": 512,
    "rope_base": 10_000, "tie_embeddings": True, "dtype": jnp.float32,
}

if __name__ == "__main__":
    rng = np.random.default_rng(0)
    data = rng.integers(0, 512, size=(8, 128)).astype(np.int32)
    x = jnp.asarray(data)
    y = jnp.roll(x, -1, -1)

    def run(model, params, apply_kwargs):
        optimizer = optax.adamw(LR)
        opt_state = optimizer.init(params)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                logits, _, _ = model.apply(p, CFG, x, **apply_kwargs)
                return cross_entropy(logits.reshape(-1, 512), y.reshape(-1))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        losses = []
        for _ in range(STEPS):
            params, opt_state, loss = step(params, opt_state)
            losses.append(float(loss))
        return losses

    base_losses = run(qwen3, qwen3.init(jax.random.PRNGKey(0), CFG), {})
    hc_params = hyper_qwen3.init(jax.random.PRNGKey(0), CFG, hc_type=HC_TYPE, expansion_rate=EXPANSION_RATE)
    hc_losses = run(hyper_qwen3, hc_params, {"hc_type": HC_TYPE, "expansion_rate": EXPANSION_RATE})

    print(f"baseline qwen3:  first {base_losses[0]:.3f} → last {base_losses[-1]:.3f}")
    print(f"{HC_TYPE} qwen3: first {hc_losses[0]:.3f} → last {hc_losses[-1]:.3f}")
