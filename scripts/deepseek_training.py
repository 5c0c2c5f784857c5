"""DeepSeek-V3 MTP pretraining entry script
(reference: llama3_to_deepseekv3/deepseek_training.py): MTP collator →
in-model loss (main + coeff/depth·Σ MTP) → post-step MoE bias folding.
"""

import jax
import jax.numpy as jnp
import numpy as np

from llm_quest_tpu import config
from llm_quest_tpu.data.datasets import collate_function_mtp, data_loader
from llm_quest_tpu.models import deepseek_v3 as dsv3
from llm_quest_tpu.training.engine import make_optimizer
from llm_quest_tpu.training.mtp_engine import make_deepseek_train_step, mtp_evaluate

BATCH_SIZE = 4
NUM_EPOCH = 1
LR = 3e-4
MAX_LENGTH = 128

if __name__ == "__main__":
    cfg = dict(config.DEEPSEEK_SMALL_CONFIG, context_length=MAX_LENGTH, q_rank=256)
    rng = np.random.default_rng(0)
    samples = [rng.integers(1, 4000, size=(rng.integers(32, MAX_LENGTH),)).tolist() for _ in range(32)]
    collate = lambda batch: collate_function_mtp(batch, cfg["mtp_depth"], pad_token_id=0)
    batches = data_loader(samples, BATCH_SIZE, shuffle=True, collate_fn=collate)

    def to_jnp(b):
        return {
            "input_ids": jnp.asarray(b["input_ids"]),
            "targets": jnp.asarray(b["targets"]),
            "shifted_inputs": [jnp.asarray(a) for a in b["shifted_inputs"]],
            "shifted_targets": [jnp.asarray(a) for a in b["shifted_targets"]],
        }

    params = dsv3.init(jax.random.PRNGKey(123), cfg)
    optimizer = make_optimizer(LR)
    opt_state = optimizer.init(params)
    step = make_deepseek_train_step(cfg, optimizer)
    rng_j = jax.random.PRNGKey(0)

    for epoch in range(1, NUM_EPOCH + 1):
        for i, batch in enumerate(batches):
            params, opt_state, loss = step(params, opt_state, to_jnp(batch), rng_j)
            if i % 4 == 0:
                print(f"epoch {epoch} step {i}: total loss {float(loss):.4f}")
    val = mtp_evaluate(dsv3, cfg, params, [to_jnp(b) for b in batches[:2]])
    print(f"main-model eval loss: {val:.4f}")
