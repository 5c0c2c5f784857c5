"""Direct Preference Optimization (DPO / cDPO).

Behavioral parity with the reference (alignment/dpo/dpo.py):
- compute_logprobs (:29-68): 1-shifted per-token label logprobs, mask-mean
  per sequence (note the reference divides by the UNSHIFTED mask sum — kept)
- compute_loss (:70-104): −logσ(β·(Δ_chosen − Δ_rejected)) with cDPO label
  smoothing −logσ(−β·…)·ε; chosen/rejected rewards (detached) for logging
- forward (:106-139): policy + frozen-reference passes over chosen/rejected
- DPOEvaluator (:142-225) and the simple training loop (:228-304)

TPU redesign: the 4 forwards + loss fuse into one jitted step; the reference
model's passes sit under stop_gradient instead of torch.no_grad.
"""

import jax
import jax.numpy as jnp
import optax


def compute_logprobs(logits, inputs, attention_mask=None):
    """Mean per-sequence logprob of the realized tokens (b,)."""
    logits = logits[:, :-1, :].astype(jnp.float32)
    labels = inputs[:, 1:]
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    label_logprobs = jnp.take_along_axis(logprobs, labels[..., None], axis=-1)[..., 0]  # (b, s-1)

    if attention_mask is not None:
        shifted = attention_mask[:, 1:].astype(label_logprobs.dtype)
        # reference divides by the UNSHIFTED mask sum (dpo.py:63-65)
        return jnp.sum(label_logprobs * shifted, axis=-1) / jnp.sum(
            attention_mask.astype(label_logprobs.dtype), axis=-1
        )
    return jnp.mean(label_logprobs, axis=-1)


def dpo_loss(pol_chosen, pol_rejected, ref_chosen, ref_rejected, *, beta=0.1, label_smoothing=0.0):
    """Returns (loss, chosen_rewards_mean, rejected_rewards_mean)."""
    pref_logratio = pol_chosen - ref_chosen
    rejec_logratio = pol_rejected - ref_rejected
    chosen_rewards = jax.lax.stop_gradient(pref_logratio)
    rejected_rewards = jax.lax.stop_gradient(rejec_logratio)

    logits = pref_logratio - rejec_logratio
    losses = (
        -jax.nn.log_sigmoid(beta * logits) * (1 - label_smoothing)
        - jax.nn.log_sigmoid(-beta * logits) * label_smoothing
    )
    return jnp.mean(losses), jnp.mean(chosen_rewards), jnp.mean(rejected_rewards)


def dpo_forward(model, cfg, policy_params, reference_params, batch, *, beta=0.1, label_smoothing=0.0):
    """Four model passes + loss. batch: from data.datasets.dpo_collate plus
    the collator's loss masks as attention surrogate (reference parity —
    dpo.py:106-139 passes the LOSS masks into compute_logprobs)."""

    def seq_logprobs(params, ids, mask, stop_grad=False):
        logits, _, _ = model.apply(params, cfg, ids)
        if stop_grad:
            logits = jax.lax.stop_gradient(logits)
        return compute_logprobs(logits, ids, mask)

    pol_chosen = seq_logprobs(policy_params, batch["chosen"], batch["chosen_mask"])
    pol_rejected = seq_logprobs(policy_params, batch["rejected"], batch["rejected_mask"])
    ref_chosen = seq_logprobs(reference_params, batch["chosen"], batch["chosen_mask"], stop_grad=True)
    ref_rejected = seq_logprobs(reference_params, batch["rejected"], batch["rejected_mask"], stop_grad=True)

    return dpo_loss(pol_chosen, pol_rejected, ref_chosen, ref_rejected, beta=beta, label_smoothing=label_smoothing)


def make_dpo_train_step(model, cfg, optimizer, *, beta=0.1, label_smoothing=0.0):
    """(policy, opt_state, ref, batch) → (policy, opt_state, metrics dict)."""

    def loss_fn(policy_params, reference_params, batch):
        loss, cr, rr = dpo_forward(
            model, cfg, policy_params, reference_params, batch, beta=beta, label_smoothing=label_smoothing
        )
        return loss, (cr, rr)

    @jax.jit
    def train_step(policy_params, opt_state, reference_params, batch):
        (loss, (cr, rr)), grads = jax.value_and_grad(loss_fn, has_aux=True)(policy_params, reference_params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, policy_params)
        policy_params = optax.apply_updates(policy_params, updates)
        return policy_params, opt_state, {"loss": loss, "chosen_rewards": cr, "rejected_rewards": rr}

    return train_step


def dpo_evaluate(model, cfg, policy_params, reference_params, loader, *, beta=0.1, num_batches=None):
    """Mean loss / reward margin over a loader (reference: DPOEvaluator :142-225).

    The four forwards + loss run as ONE jitted program per batch shape —
    traced once per call, reused across the loader (collators emit fixed
    shapes, so one trace covers all batches)."""
    batches = list(loader) if not isinstance(loader, list) else loader
    n = len(batches) if num_batches is None else min(num_batches, len(batches))
    fwd = jax.jit(
        lambda pp, rp, batch: dpo_forward(model, cfg, pp, rp, batch, beta=beta)
    )
    tot_loss, tot_margin = 0.0, 0.0
    for batch in batches[:n]:
        loss, cr, rr = fwd(policy_params, reference_params, batch)
        tot_loss += float(loss)
        tot_margin += float(cr - rr)
    return tot_loss / max(n, 1), tot_margin / max(n, 1)


def dpo_training_loop(
    model, cfg, policy_params, reference_params, train_loader, *, num_epochs, lr=5e-6, beta=0.1,
    label_smoothing=0.0, val_loader=None, eval_freq=5, eval_iter=5, log=print,
):
    """Simple DPO loop (reference: dpo.py:228-304). Returns trained policy."""
    optimizer = optax.adamw(lr)
    opt_state = optimizer.init(policy_params)
    step_fn = make_dpo_train_step(model, cfg, optimizer, beta=beta, label_smoothing=label_smoothing)

    step = 0
    for epoch in range(1, num_epochs + 1):
        for batch in train_loader:
            policy_params, opt_state, metrics = step_fn(policy_params, opt_state, reference_params, batch)
            step += 1
            if step == 1 or step % eval_freq == 0:
                msg = f"Epoch {epoch} Step {step} | loss {float(metrics['loss']):.4f} | " \
                      f"margin {float(metrics['chosen_rewards'] - metrics['rejected_rewards']):.4f}"
                if val_loader is not None:
                    vl, vm = dpo_evaluate(model, cfg, policy_params, reference_params, val_loader,
                                          beta=beta, num_batches=eval_iter)
                    msg += f" | val loss {vl:.4f} margin {vm:.4f}"
                log(msg)
    return policy_params
