"""Classifier fine-tuning engine (spam classification etc.).

Behavioral parity with the reference (finetuning/classifier_tuning/
cl_engine.py:6-104): CE on the LAST REAL token's logits (via the model's
last_token_only gather), accuracy loader, train/eval loop — fused into
jitted steps.
"""

import jax
import jax.numpy as jnp
import optax

from llm_quest_tpu.ops.losses import cross_entropy


def make_classifier_train_step(model, cfg, optimizer):
    def loss_fn(params, batch):
        logits, _, _ = model.apply(
            params, cfg, batch["input_ids"], attn_mask=batch["attn_mask"], last_token_only=True
        )
        return cross_entropy(logits, batch["targets"])

    @jax.jit
    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def make_classifier_eval_step(model, cfg):
    @jax.jit
    def eval_step(params, batch):
        logits, _, _ = model.apply(
            params, cfg, batch["input_ids"], attn_mask=batch["attn_mask"], last_token_only=True
        )
        loss = cross_entropy(logits, batch["targets"])
        correct = jnp.sum(jnp.argmax(logits, axis=-1) == batch["targets"])
        return loss, correct

    return eval_step


def classifier_accuracy(loader, eval_step, params, num_batches=None):
    """Accuracy over (up to) num_batches (reference: cl_engine.py:63-104)."""
    batches = list(loader) if not isinstance(loader, list) else loader
    n = len(batches) if num_batches is None else min(num_batches, len(batches))
    correct, seen = 0, 0
    for batch in batches[:n]:
        _, c = eval_step(params, batch)
        correct += int(c)
        seen += batch["targets"].shape[0]
    return correct / max(seen, 1)


def classifier_training_loop(model, cfg, params, train_loader, val_loader, *, num_epoch, lr=5e-5,
                             weight_decay=0.1, eval_freq=50, eval_iter=5, log=print):
    optimizer = optax.adamw(lr, weight_decay=weight_decay)
    opt_state = optimizer.init(params)
    train_step = make_classifier_train_step(model, cfg, optimizer)
    eval_step = make_classifier_eval_step(model, cfg)

    train_batches = list(train_loader)
    step = 0
    for epoch in range(1, num_epoch + 1):
        for batch in train_batches:
            params, opt_state, loss = train_step(params, opt_state, batch)
            step += 1
            if step == 1 or step % eval_freq == 0:
                acc = classifier_accuracy(val_loader, eval_step, params, eval_iter)
                log(f"Epoch {epoch} Step {step} | loss {float(loss):.4f} | val acc {acc:.3f}")
    return params
