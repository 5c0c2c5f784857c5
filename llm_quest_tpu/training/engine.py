"""Core training engine.

TPU-native counterpart of the reference training loops (engine.py:205-466):
the per-batch work (forward, global loss incl. MoE aux terms, backward, clip,
LR schedule, optimizer step) is fused into ONE jitted ``train_step``; gradient
accumulation uses ``optax.MultiSteps``; mixed precision is bf16 params/compute
via the config dtype rather than autocast. Host code only feeds batches and
logs.

Semantics preserved:
- ``global_loss`` = CE + summed MoE aux losses from every layer
  (reference: engine.py:50-72) — aux losses arrive through the model's ``aux``
  output dict instead of a module scan.
- LR schedule: linear warmup init→peak over warmup_steps, then cosine decay
  peak→min over the remaining steps, with the same argument validation
  (reference: engine.py:114-202).
- grad clipping at global-norm 1.0 before each optimizer step
  (reference: engine.py:444).
- ``evaluate`` averages CE over eval_iter batches from each loader
  (reference: engine.py:473-496).
"""

import math
import time
from functools import partial

import jax
import jax.numpy as jnp
import optax

from llm_quest_tpu.ops.losses import cross_entropy


def make_lr_schedule(total_steps, init_lr, peak_lr, warmup_steps=0, min_lr=None, decay=None):
    """Reference-parity LR schedule as an optax-compatible fn of step.

    Validation mirrors reference engine.py:131-152.
    """
    if warmup_steps > 0 and init_lr >= peak_lr:
        raise ValueError(
            f"Warmup enabled (warmup_steps={warmup_steps}) but init_lr ({init_lr:.2e}) "
            f">= peak_lr ({peak_lr:.2e}). Either set warmup_steps=0 or init_lr < peak_lr."
        )
    if min_lr is not None and min_lr >= peak_lr:
        raise ValueError(
            f"min_lr ({min_lr:.2e}) >= peak_lr ({peak_lr:.2e}). "
            f"Either set min_lr=None (no decay) or min_lr < peak_lr."
        )
    if decay is not None and min_lr is None:
        raise ValueError(f"decay='{decay}' was set but min_lr=None. Either set min_lr < peak_lr or decay=None.")
    if decay is None and min_lr is not None:
        raise ValueError(f"min_lr ({min_lr:.2e}) was set but decay=None. Either set decay 'cosine' or min_lr=None.")

    init_lr = init_lr if warmup_steps > 0 else peak_lr
    lr_step = (peak_lr - init_lr) / warmup_steps if warmup_steps > 0 else 0.0
    eff_min_lr = min_lr if min_lr is not None else peak_lr

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = init_lr + lr_step * step
        if decay == "cosine":
            total_decay = max(total_steps - warmup_steps, 1)
            curr_decay = step - warmup_steps
            cos = 0.5 * (1 + jnp.cos(jnp.pi * curr_decay / total_decay))
            after = eff_min_lr + (peak_lr - eff_min_lr) * cos
        else:
            after = jnp.asarray(peak_lr, jnp.float32)
        return jnp.where(step < warmup_steps, warm, after)

    return schedule


def make_optimizer(
    lr_or_schedule,
    *,
    weight_decay=0.1,
    b1=0.9,
    b2=0.999,
    grad_clip_norm=1.0,
    accumulation_steps=1,
    mu_dtype=jnp.float32,
):
    """AdamW + global-norm clipping (+ optional MultiSteps grad accumulation).

    mu_dtype defaults to fp32 so Adam's first moment stays full precision
    under bf16 params — the engine's counterpart of the reference's bf16
    autocast-with-fp32-master setup (engine.py:431)."""
    chain = []
    if grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    chain.append(optax.adamw(lr_or_schedule, b1=b1, b2=b2, weight_decay=weight_decay, mu_dtype=mu_dtype))
    tx = optax.chain(*chain)
    if accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulation_steps)
    return tx


def global_loss(logits, targets, aux=None, *, classification=False):
    """CE + cumulative MoE auxiliary losses (reference: engine.py:50-72).

    aux: the model's aux dict; "moe_loss" (scalar) is added when present.
    """
    if classification:
        loss = cross_entropy(logits, targets)
    else:
        loss = cross_entropy(logits.reshape(-1, logits.shape[-1]), targets.reshape(-1))
    if aux and "moe_loss" in aux:
        loss = loss + aux["moe_loss"]
    return loss


def make_train_step(model, cfg, optimizer, *, classification=False, has_dropout=False, fused_head_ce=False):
    """Build one fused, jitted train step:
    (params, opt_state, batch, rng) → (params, opt_state, loss).

    fused_head_ce: compute CE fused with the LM head over sequence chunks
    (ops/losses.py::cross_entropy_fused_head) — the full (tokens, vocab)
    logit tensor never materializes. Essential for 150k+ vocabs: fixes the
    measured 9.3 GB OOM training Qwen3-Next at s=2048 on one v5e chip.
    Requires the model to support output_hidden_states and expose
    head_weights(params, cfg)."""

    def loss_fn(params, batch, rng):
        if fused_head_ce:
            from llm_quest_tpu.ops.losses import cross_entropy_fused_head

            hidden, _, aux = model.apply(
                params,
                cfg,
                batch["input_ids"],
                attn_mask=batch.get("attn_mask"),
                deterministic=not has_dropout,
                rng=rng if has_dropout else None,
                training=True,
                output_hidden_states=True,
            )
            loss = cross_entropy_fused_head(hidden, model.head_weights(params, cfg), batch["targets"])
            if aux and "moe_loss" in aux:
                loss = loss + aux["moe_loss"]
            return loss
        logits, _, aux = model.apply(
            params,
            cfg,
            batch["input_ids"],
            attn_mask=batch.get("attn_mask"),
            last_token_only=classification,
            deterministic=not has_dropout,
            rng=rng if has_dropout else None,
            training=True,  # enables MoE aux losses / checkpointing in models that use them
        )
        return global_loss(logits, batch["targets"], aux, classification=classification)

    # donate params + opt_state: the update happens in-place on device —
    # without donation both old and new copies live (2x params + 2x Adam
    # moments ≈ the difference between fitting and OOM at ~1B params/chip)
    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def make_eval_step(model, cfg, *, classification=False):
    @jax.jit
    def eval_step(params, batch):
        logits, _, _ = model.apply(
            params,
            cfg,
            batch["input_ids"],
            attn_mask=batch.get("attn_mask"),
            last_token_only=classification,
        )
        return global_loss(logits, batch["targets"], None, classification=classification)

    return eval_step


def calc_loss_loader(loader, eval_step, params, num_batches=None):
    """Mean eval loss over (up to) num_batches batches
    (reference: engine.py:75-111)."""
    batches = list(loader) if not isinstance(loader, list) else loader
    if len(batches) == 0:
        return float("nan")
    n = len(batches) if num_batches is None else min(num_batches, len(batches))
    total = 0.0
    for batch in batches[:n]:
        total += float(eval_step(params, batch))
    return total / n


def evaluate(train_loader, val_loader, eval_step, params, eval_iter):
    """(train_loss, val_loss) over eval_iter batches (reference: engine.py:473-496)."""
    train_loss = calc_loss_loader(train_loader, eval_step, params, num_batches=eval_iter)
    val_loss = calc_loss_loader(val_loader, eval_step, params, num_batches=eval_iter)
    return train_loss, val_loss


def training_eval_loop(
    model,
    cfg,
    params,
    train_loader,
    val_loader,
    *,
    num_epoch,
    peak_lr=4e-4,
    init_lr=1e-5,
    min_lr=None,
    warmup_steps=0,
    decay=None,
    weight_decay=0.1,
    accumulation_steps=1,
    eval_freq=5,
    eval_iter=5,
    rng=None,
    classification=False,
    log=print,
    timing=False,
    checkpoint_every=None,
    checkpoint_path=None,
    profiler=None,
):
    """Full training loop with LR schedule, grad accumulation, clipping and
    periodic evaluation (reference: engine.py:377-466; the ``timing`` flag adds
    the tok/s instrumentation of engine.py:270-374).

    profiler: optional ``profiling.ScheduledProfiler`` — its ``step()`` is
    called once per optimizer step, capturing wait/warmup/active/repeat
    scheduled traces (reference: engine.py:499-640's torch.profiler
    schedule); the loop syncs on the loss before the traced window closes
    so the trace contains real device work, not queued dispatches.

    train_loader / val_loader: iterables (re-iterable) of dict batches with
    "input_ids", "targets", optional "attn_mask" — device arrays or numpy.

    checkpoint_every / checkpoint_path: every N optimizer steps, schedule an
    ASYNC save of (params, opt_state, step) to checkpoint_path (the loop
    never blocks on disk — training/checkpointing.py snapshot semantics);
    the final save at loop end is awaited, so the returned path is durable.

    Returns (params, train_losses, val_losses).
    """
    train_batches = list(train_loader)
    steps_per_epoch = math.ceil(len(train_batches) / accumulation_steps)
    total_steps = steps_per_epoch * num_epoch

    schedule = make_lr_schedule(total_steps, init_lr, peak_lr, warmup_steps, min_lr, decay)
    optimizer = make_optimizer(
        schedule, weight_decay=weight_decay, accumulation_steps=accumulation_steps
    )
    opt_state = optimizer.init(params)

    has_dropout = cfg.get("drop_rate", cfg.get("p_dropout", 0.0)) > 0
    train_step = make_train_step(model, cfg, optimizer, classification=classification, has_dropout=has_dropout)
    eval_step = make_eval_step(model, cfg, classification=classification)

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    train_losses, val_losses = [], []
    step = 0
    tokens_seen, t0 = 0, time.time()

    from llm_quest_tpu.data.prefetch import prefetch_to_device

    for epoch in range(1, num_epoch + 1):
        # host→device copies of batch N+1 overlap step N (data/prefetch.py;
        # measured 1.40× on the host-fed ViT encode over the tunneled chip)
        for i, batch in enumerate(prefetch_to_device(iter(train_batches))):
            rng, sub = jax.random.split(rng)
            params, opt_state, loss = train_step(params, opt_state, batch, sub)
            tokens_seen += int(jnp.size(batch["input_ids"]))

            micro_step = i + 1 + (epoch - 1) * len(train_batches)
            if micro_step % accumulation_steps == 0:
                step += 1
                if profiler is not None:
                    jax.block_until_ready(loss)  # async dispatches land inside the trace
                    profiler.step()
                if step == 1 or step % eval_freq == 0:
                    tr, va = evaluate(train_batches, val_loader, eval_step, params, eval_iter)
                    train_losses.append(tr)
                    val_losses.append(va)
                    msg = (
                        f"Epoch: {epoch}, Step: {step}  | "
                        f"Train loss: {tr:.5f}  Val loss: {va:.5f}  | "
                        f"lr: {float(schedule(step)):.1e}"
                    )
                    if timing:
                        elapsed = time.time() - t0
                        msg += f"  | tok/s: {tokens_seen / max(elapsed, 1e-9):.0f}"
                    log(msg)
                if checkpoint_every and step % checkpoint_every == 0:
                    from llm_quest_tpu.training.checkpointing import save_checkpoint

                    save_checkpoint(checkpoint_path, params, opt_state=opt_state,
                                    step=step, blocking=False)

    if checkpoint_every:
        from llm_quest_tpu.training.checkpointing import (
            save_checkpoint, wait_for_saves)

        save_checkpoint(checkpoint_path, params, opt_state=opt_state,
                        step=step, blocking=False)
        wait_for_saves()
    return params, train_losses, val_losses
