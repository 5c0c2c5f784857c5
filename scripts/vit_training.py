"""ViT CIFAR-10 classifier training entry script
(reference: multimodal/vision_transformer/vit_training.py).

Uses HF datasets CIFAR-10 when available; synthetic images fallback.
Reference baseline to beat: 71.82% val accuracy @ 20 epochs (TinyViT 9.5M).
"""

import jax
import os

import numpy as np

from llm_quest_tpu import config
from llm_quest_tpu.data.datasets import normalize_images
from llm_quest_tpu.models import vit
from llm_quest_tpu.training.vit_engine import vit_training_eval_loop

BATCH_SIZE = 128
NUM_EPOCH = int(os.environ.get("VIT_EPOCHS", 20))  # 20 = the reference CIFAR run; set lower for smokes
PEAK_LR = 3e-4


def load_cifar():
    try:
        from datasets import load_dataset

        d = load_dataset("cifar10")
        tr_x = np.stack([np.asarray(img) for img in d["train"]["img"]])
        tr_y = np.asarray(d["train"]["label"])
        va_x = np.stack([np.asarray(img) for img in d["test"]["img"]])
        va_y = np.asarray(d["test"]["label"])
        return (tr_x, tr_y), (va_x, va_y)
    except Exception:
        rng = np.random.default_rng(0)
        x = rng.integers(0, 255, size=(512, 32, 32, 3), dtype=np.uint8)
        y = rng.integers(0, 10, size=(512,))
        return (x[:448], y[:448]), (x[448:], y[448:])


def batches(x, y, batch_size):
    x = normalize_images(x)
    out = []
    for i in range(0, len(x) - len(x) % batch_size, batch_size):
        out.append({"image": x[i : i + batch_size], "label": y[i : i + batch_size].astype(np.int32)})
    return out


if __name__ == "__main__":
    cfg = dict(config.TINY_VIT_CONFIG)
    (tr_x, tr_y), (va_x, va_y) = load_cifar()
    train_loader = batches(tr_x, tr_y, BATCH_SIZE)
    val_loader = batches(va_x, va_y, BATCH_SIZE)

    params = vit.init(jax.random.PRNGKey(123), cfg)
    params, metrics = vit_training_eval_loop(
        vit, cfg, params, train_loader, val_loader,
        num_epoch=NUM_EPOCH, peak_lr=PEAK_LR, min_lr=PEAK_LR / 10, warmup_steps=100,
        eval_freq=100, eval_iter=20,
    )
    print(f"final val accuracy: {metrics['val_acc'][-1]:.4f} (reference baseline 0.7182)")
