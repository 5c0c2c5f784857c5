"""ViT classifier training/eval engine.

Behavioral parity with the reference vit_engine.py:62-265: AdamW + LR
schedule + grad clipping, mixed precision via model dtype, accuracy tracking
over loaders. Fused into one jitted train step (loss+backward+update) and a
jitted accuracy step.
"""

import jax
import jax.numpy as jnp
import optax

from llm_quest_tpu.ops.losses import cross_entropy


def make_vit_train_step(model, cfg, optimizer):
    def loss_fn(params, batch, rng):
        logits = model.apply(params, cfg, batch["image"], deterministic=False, rng=rng)
        return cross_entropy(logits, batch["label"])

    @jax.jit
    def train_step(params, opt_state, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def make_vit_eval_step(model, cfg):
    @jax.jit
    def eval_step(params, batch):
        logits = model.apply(params, cfg, batch["image"])
        loss = cross_entropy(logits, batch["label"])
        correct = jnp.sum(jnp.argmax(logits, axis=-1) == batch["label"])
        return loss, correct

    return eval_step


def evaluate_accuracy(loader, eval_step, params, num_batches=None):
    """(mean_loss, accuracy) over the loader (reference: vit_engine.py:157-186)."""
    batches = list(loader) if not isinstance(loader, list) else loader
    n = len(batches) if num_batches is None else min(num_batches, len(batches))
    total_loss, total_correct, total_seen = 0.0, 0, 0
    for batch in batches[:n]:
        loss, correct = eval_step(params, batch)
        total_loss += float(loss)
        total_correct += int(correct)
        total_seen += batch["label"].shape[0]
    return total_loss / max(n, 1), total_correct / max(total_seen, 1)


def vit_training_eval_loop(
    model,
    cfg,
    params,
    train_loader,
    val_loader,
    *,
    num_epoch,
    peak_lr=3e-4,
    warmup_steps=0,
    min_lr=None,
    weight_decay=0.1,
    eval_freq=50,
    eval_iter=10,
    rng=None,
    log=print,
):
    """Returns (params, metrics dict with train/val loss + accuracy lists)."""
    from llm_quest_tpu.training.engine import make_lr_schedule, make_optimizer

    train_batches = list(train_loader)
    total_steps = len(train_batches) * num_epoch
    schedule = make_lr_schedule(
        total_steps, peak_lr / 10, peak_lr, warmup_steps, min_lr, "cosine" if min_lr else None
    )
    optimizer = make_optimizer(schedule, weight_decay=weight_decay)
    opt_state = optimizer.init(params)

    train_step = make_vit_train_step(model, cfg, optimizer)
    eval_step = make_vit_eval_step(model, cfg)
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    metrics = {"train_loss": [], "val_loss": [], "val_acc": []}
    step = 0
    for epoch in range(1, num_epoch + 1):
        for batch in train_batches:
            rng, sub = jax.random.split(rng)
            params, opt_state, loss = train_step(params, opt_state, batch, sub)
            step += 1
            if step == 1 or step % eval_freq == 0:
                val_loss, val_acc = evaluate_accuracy(val_loader, eval_step, params, eval_iter)
                metrics["train_loss"].append(float(loss))
                metrics["val_loss"].append(val_loss)
                metrics["val_acc"].append(val_acc)
                log(f"Epoch {epoch} Step {step} | train {float(loss):.4f} val {val_loss:.4f} acc {val_acc:.3f}")
    return params, metrics
