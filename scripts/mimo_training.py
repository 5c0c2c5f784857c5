"""MiMo-V2-Flash MTP pretraining entry script
(reference: xiaomi/mimo_v2_flash_training.py): shrinking-slice MTP loss,
post-step MoE bias folding.
"""

import jax
import jax.numpy as jnp
import numpy as np

from llm_quest_tpu import config
from llm_quest_tpu.models import mimo_v2_flash as mimo
from llm_quest_tpu.training.engine import make_optimizer
from llm_quest_tpu.training.mtp_engine import make_mimo_train_step

BATCH_SIZE = 2
STEPS = 8
LR = 3e-4
MAX_LENGTH = 64  # small defaults: the MTP+MoE+SWA graph is heavy to compile on CPU

if __name__ == "__main__":
    cfg = dict(config.MIMO_V2_SMALL_CONFIG, context_length=MAX_LENGTH)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 4000, size=(BATCH_SIZE * STEPS * MAX_LENGTH + 1,))
    inputs = jnp.asarray(ids[:-1].reshape(-1, MAX_LENGTH), jnp.int32)
    targets = jnp.asarray(ids[1:].reshape(-1, MAX_LENGTH), jnp.int32)

    params = mimo.init(jax.random.PRNGKey(123), cfg)
    optimizer = make_optimizer(LR)
    opt_state = optimizer.init(params)
    step = make_mimo_train_step(cfg, optimizer)
    rng_j = jax.random.PRNGKey(0)

    for i in range(STEPS):
        batch = {
            "input_ids": inputs[i * BATCH_SIZE : (i + 1) * BATCH_SIZE],
            "targets": targets[i * BATCH_SIZE : (i + 1) * BATCH_SIZE],
        }
        params, opt_state, loss = step(params, opt_state, batch, rng_j)
        if i % 4 == 0:
            print(f"step {i}: total loss {float(loss):.4f}")
