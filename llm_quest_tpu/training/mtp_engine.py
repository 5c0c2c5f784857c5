"""MTP training engines for DeepSeek-V3 and MiMo-V2-Flash.

Behavioral parity with the reference (llama3_to_deepseekv3/deepseek_engine.py:6-218,
xiaomi/mimo_v2_flash_engine.py:9-115): the loss lives inside the model
(main CE + coeff/depth·Σ MTP CE), and the aux-loss-free MoE bias update is
applied AFTER the optimizer step (a non-gradient state update,
deepseek_moe.py:206-210) — here folded functionally via update_moe_biases.
"""

from functools import partial

import jax
import optax


def make_deepseek_train_step(cfg, optimizer):
    """(params, opt_state, batch, rng) → (params, opt_state, loss).
    batch: from data.datasets.collate_function_mtp (shifted_inputs/targets
    as lists of arrays)."""
    from llm_quest_tpu.models import deepseek_v3 as dsv3

    def loss_fn(params, batch):
        loss, aux = dsv3.loss(
            params, cfg, batch["input_ids"], batch["targets"],
            batch.get("shifted_inputs"), batch.get("shifted_targets"),
        )
        return loss, aux

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch, rng):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # aux-loss-free bias balancing AFTER the optimizer step
        params = dsv3.update_moe_biases(params, cfg, aux["moe_counts"])
        return params, opt_state, loss

    return train_step


def make_mimo_train_step(cfg, optimizer):
    """(params, opt_state, batch, rng) → (params, opt_state, loss).
    batch: {"input_ids", "targets"} — MiMo's MTP uses shrinking slices, no
    pre-shifted collator needed (reference: mimo_v2_flash_model.py:127-210)."""
    from llm_quest_tpu.models import mimo_v2_flash as mimo

    def loss_fn(params, batch):
        loss, aux = mimo.loss(params, cfg, batch["input_ids"], batch["targets"])
        return loss, aux

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch, rng):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = mimo.update_moe_biases(params, cfg, aux["moe_counts"])
        return params, opt_state, loss

    return train_step


def mtp_evaluate(model, cfg, params, loader, num_batches=None):
    """Mean main-model loss over a loader (reference evaluators:
    deepseek_engine.py:150-218, mimo_v2_flash_engine.py:70-115)."""
    batches = list(loader) if not isinstance(loader, list) else loader
    n = len(batches) if num_batches is None else min(num_batches, len(batches))
    # one jitted forward per batch shape (traced once, reused over the loader)
    fwd = jax.jit(lambda p, ids, tgt: model.loss(p, cfg, ids, tgt, training=False)[0])
    total = 0.0
    for batch in batches[:n]:
        total += float(fwd(params, batch["input_ids"], batch["targets"]))
    return total / max(n, 1)
