"""GPT-2 pretraining entry script (reference: gpt/gpt_training.py).

Module-level hparams like the reference's L6 scripts; trains on
data/the-verdict.txt when present (tiktoken), otherwise a synthetic corpus
so the script runs anywhere.
"""

import jax
import numpy as np

from llm_quest_tpu import config
from llm_quest_tpu.data.datasets import data_loader, gpt_windows
from llm_quest_tpu.models import gpt2
from llm_quest_tpu.training.engine import training_eval_loop

# hparams (reference: gpt_training.py:1-16)
BATCH_SIZE = 8
NUM_EPOCH = 2
PEAK_LR = 4e-4
INIT_LR = 1e-5
MIN_LR = 1e-5
WARMUP_STEPS = 10
WEIGHT_DECAY = 0.1
ACCUMULATION_STEPS = 1
EVAL_FREQ = 5
EVAL_ITER = 2
MAX_LENGTH = 256
STRIDE = 256


def load_corpus():
    path = config.the_verdict_path
    if path.exists():
        import tiktoken

        tok = tiktoken.get_encoding("gpt2")
        return gpt_windows(path.read_text(), tok, MAX_LENGTH, STRIDE)
    # synthetic fallback: a repeated pseudo-corpus
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 1000, size=(40 * MAX_LENGTH + 1,))
    inputs = ids[:-1].reshape(-1, MAX_LENGTH).astype(np.int32)
    targets = ids[1:].reshape(-1, MAX_LENGTH).astype(np.int32)
    return inputs, targets


if __name__ == "__main__":
    cfg = dict(config.GPT_SMALL_CONFIG)
    inputs, targets = load_corpus()
    split = int(0.9 * len(inputs))
    train_loader = data_loader((inputs[:split], targets[:split]), BATCH_SIZE, shuffle=True)
    val_loader = data_loader((inputs[split:], targets[split:]), BATCH_SIZE)

    params = gpt2.init(jax.random.PRNGKey(123), cfg)
    params, train_losses, val_losses = training_eval_loop(
        gpt2, cfg, params, train_loader, val_loader,
        num_epoch=NUM_EPOCH, peak_lr=PEAK_LR, init_lr=INIT_LR, min_lr=MIN_LR,
        warmup_steps=WARMUP_STEPS, decay="cosine", weight_decay=WEIGHT_DECAY,
        accumulation_steps=ACCUMULATION_STEPS, eval_freq=EVAL_FREQ, eval_iter=EVAL_ITER, timing=True,
    )
    print(f"final val loss: {val_losses[-1]:.4f}")
