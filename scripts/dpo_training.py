"""DPO preference-tuning entry script (reference: alignment/dpo usage)."""

import jax

from llm_quest_tpu import config
from llm_quest_tpu.alignment.dpo import dpo_training_loop
from llm_quest_tpu.data.datasets import data_loader, dpo_collate, preference_dataset
from llm_quest_tpu.models import gpt2

BATCH_SIZE = 4
NUM_EPOCHS = 1
LR = 5e-6
BETA = 0.1
LABEL_SMOOTHING = 0.0  # >0 → cDPO


class _ByteTok:
    def encode(self, t):
        return [b % 50000 for b in t.encode()]


if __name__ == "__main__":
    cfg = dict(config.GPT_SMALL_CONFIG, context_length=512)

    if config.instruct_preference_train_path.exists():
        import tiktoken

        tok = tiktoken.get_encoding("gpt2")
        samples = preference_dataset(str(config.instruct_preference_train_path), tok)
    else:
        tok = _ByteTok()
        samples = [
            {
                "prompt": tok.encode(f"Question {i}:"),
                "chosen": tok.encode(f"Question {i}: a polite and helpful answer"),
                "rejected": tok.encode(f"Question {i}: a rude answer"),
            }
            for i in range(16)
        ]

    import jax.numpy as jnp

    def to_jnp(batch):
        return {k: jnp.asarray(v) for k, v in batch.items()}

    loader = [to_jnp(b) for b in data_loader(samples, BATCH_SIZE, shuffle=True, collate_fn=dpo_collate)]

    policy = gpt2.init(jax.random.PRNGKey(0), cfg)  # or load SFT weights
    reference = jax.tree.map(lambda x: x, policy)

    policy = dpo_training_loop(
        gpt2, cfg, policy, reference, loader,
        num_epochs=NUM_EPOCHS, lr=LR, beta=BETA, label_smoothing=LABEL_SMOOTHING,
        val_loader=loader, eval_freq=2, eval_iter=2,
    )
