"""Qwen3-Next hybrid pretraining entry script
(reference: qwen/qwen3_next/qwen3_next_training.py).

FineWeb sample when present (data/fineweb_sample/*.jsonl.gz + HF tokenizer),
synthetic corpus fallback.
"""

import jax
import jax.numpy as jnp
import numpy as np

from llm_quest_tpu import config
from llm_quest_tpu.data.datasets import data_loader
from llm_quest_tpu.models import qwen3_next
from llm_quest_tpu.training.engine import training_eval_loop

BATCH_SIZE = 4
NUM_EPOCH = 1
PEAK_LR = 3e-4
WARMUP_STEPS = 20
MAX_LENGTH = 256


def load_data(cfg):
    if config.fineweb_train.exists():
        from transformers import AutoTokenizer

        from llm_quest_tpu.data.datasets import gpt_windows, load_jsonl_gz

        tok = AutoTokenizer.from_pretrained("Qwen/Qwen3-Next-80B-A3B-Instruct")
        texts = load_jsonl_gz(config.fineweb_train, max_samples=200)
        chunks = [gpt_windows(t, tok, MAX_LENGTH, MAX_LENGTH) for t in texts]
        inputs = np.concatenate([c[0] for c in chunks if len(c[0])])
        targets = np.concatenate([c[1] for c in chunks if len(c[1])])
        return inputs, targets
    rng = np.random.default_rng(0)
    ids = rng.integers(0, min(cfg["vocab_size"], 4000), size=(20 * MAX_LENGTH + 1,))
    return (
        ids[:-1].reshape(-1, MAX_LENGTH).astype(np.int32),
        ids[1:].reshape(-1, MAX_LENGTH).astype(np.int32),
    )


if __name__ == "__main__":
    cfg = dict(config.QWEN3_NEXT_SMALL_CONFIG, dtype=jnp.float32, context_length=MAX_LENGTH,
               gradient_checkpointing=True)  # + fused-head CE via the engine for big-vocab runs
    inputs, targets = load_data(cfg)
    split = max(int(0.9 * len(inputs)), 1)
    train_loader = data_loader((inputs[:split], targets[:split]), BATCH_SIZE, shuffle=True)
    val_loader = data_loader((inputs[split:] if split < len(inputs) else inputs, targets[split:] if split < len(targets) else targets), BATCH_SIZE, drop_last=False)

    params = qwen3_next.init(jax.random.PRNGKey(123), cfg)
    params, _, val_losses = training_eval_loop(
        qwen3_next, cfg, params, train_loader, val_loader,
        num_epoch=NUM_EPOCH, peak_lr=PEAK_LR, init_lr=PEAK_LR / 10, min_lr=PEAK_LR / 10,
        warmup_steps=WARMUP_STEPS, decay="cosine", eval_freq=5, eval_iter=2, timing=True,
    )
    print(f"final val loss: {val_losses[-1]:.4f}")
