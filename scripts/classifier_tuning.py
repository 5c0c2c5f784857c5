"""Spam-classifier fine-tuning entry script
(reference: finetuning/classifier_tuning/cl_training.py): GPT-2 backbone,
CE on the last real token's logits, accuracy tracking.
"""

import jax
import jax.numpy as jnp

from llm_quest_tpu import config
from llm_quest_tpu.data.datasets import load_csv_rows, spam_dataset
from llm_quest_tpu.models import gpt2
from llm_quest_tpu.training.classifier import classifier_training_loop

BATCH_SIZE = 8
NUM_EPOCH = 3
LR = 5e-5


class _ByteTok:
    def encode(self, t):
        return [b % 50000 for b in t.encode()]


def batches(data, batch_size):
    n = data["input_ids"].shape[0]
    out = []
    for i in range(0, n - n % batch_size, batch_size):
        out.append(
            {
                "input_ids": jnp.asarray(data["input_ids"][i : i + batch_size]),
                "targets": jnp.asarray(data["targets"][i : i + batch_size]),
                "attn_mask": jnp.asarray(data["attn_mask"][i : i + batch_size]),
            }
        )
    return out


if __name__ == "__main__":
    cfg = dict(config.GPT_SMALL_CONFIG, context_length=512)

    if config.spam_train_path.exists():
        import tiktoken

        tok = tiktoken.get_encoding("gpt2")
        train = spam_dataset(load_csv_rows(config.spam_train_path), tok)
        val = spam_dataset(load_csv_rows(config.spam_val_path), tok, max_length=train["max_length"])
    else:
        tok = _ByteTok()
        rows = [(f"win free prize {i}", 1) if i % 2 else (f"meeting at {i} pm", 0) for i in range(64)]
        train = spam_dataset(rows[:48], tok)
        val = spam_dataset(rows[48:], tok, max_length=train["max_length"])

    params = gpt2.init(jax.random.PRNGKey(0), cfg)  # or load pretrained GPT-2 weights
    params = classifier_training_loop(
        gpt2, cfg, params, batches(train, BATCH_SIZE), batches(val, BATCH_SIZE),
        num_epoch=NUM_EPOCH, lr=LR, eval_freq=5, eval_iter=4,
    )
