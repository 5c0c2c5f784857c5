"""RLHF-GRPO pipeline entry script (reference: alignment/rlhf_grpo/
rlhf_grpo_training.py): reward-model training (Bradley-Terry) then GRPO.
"""

import jax
import jax.numpy as jnp
import optax

from llm_quest_tpu import config
from llm_quest_tpu.alignment import grpo
from llm_quest_tpu.data.datasets import data_loader, pref_reward_collate
from llm_quest_tpu.models import gpt2
from llm_quest_tpu.utils import CheckpointEvaluator

RM_EPOCHS = 1
RM_LR = 1e-5
NUM_SAMPLES = 4
MAX_GEN = 32
NUM_GRAD_UPDATES = 2
POLICY_LR = 1e-6
READOUT = "scores_mean_pooling"  # | "hidden_states_pooling" | "last_token"


class _ByteTok:
    def encode(self, t):
        return [b % 50000 for b in t.encode()]


if __name__ == "__main__":
    cfg = dict(config.GPT_SMALL_CONFIG, context_length=512)
    tok = _ByteTok()
    samples = [
        {
            "prompt": tok.encode(f"Question {i}:"),
            "chosen": tok.encode(f"Question {i}: a helpful answer"),
            "rejected": tok.encode(f"Question {i}: junk"),
        }
        for i in range(16)
    ]

    def to_jnp(b):
        return {k: jnp.asarray(v) for k, v in b.items()}

    rm_loader = [to_jnp(b) for b in data_loader(samples, 4, shuffle=True, collate_fn=pref_reward_collate)]

    # --- 1. reward model training (BT loss) ---
    rm_params = grpo.init_reward_model(jax.random.PRNGKey(0), cfg)
    rm_opt = optax.adamw(RM_LR)
    rm_state = rm_opt.init(rm_params)
    rm_step = grpo.make_rm_train_step(cfg, rm_opt, readout=READOUT)
    for epoch in range(RM_EPOCHS):
        for batch in rm_loader:
            rm_params, rm_state, loss, acc = rm_step(rm_params, rm_state, batch)
        print(f"RM epoch {epoch + 1}: loss {float(loss):.4f} acc {float(acc):.2f}")

    # --- 2. GRPO policy training against the reward model ---
    prompt_batches = [grpo.prompt_collator([s["prompt"] for s in samples[i : i + 2]]) for i in range(0, 8, 2)]
    policy = gpt2.init(jax.random.PRNGKey(1), cfg)
    reference = jax.tree.map(lambda x: x, policy)

    policy, metrics = grpo.rlhf_grpo_training_loop(
        gpt2, cfg, policy, reference, rm_params, cfg, prompt_batches,
        num_epochs=1, num_samples=NUM_SAMPLES, max_gen=MAX_GEN, num_grad_updates=NUM_GRAD_UPDATES,
        lr=POLICY_LR, readout=READOUT, evaluator=CheckpointEvaluator(),
    )
    print(f"final reward {metrics[-1]['reward']:.3f} kl {metrics[-1]['kl']:.4f}")
