"""GRPO family: reward model, collators, advantages, KL estimators, losses, loops.

Behavioral parity with the reference (alignment/rlhf_grpo/):

- PreferenceRewardModel (pref_reward_model.py:10-70): GPT-2 body + scalar
  head with 3 reward readouts (scores-mean-pool / hidden-mean-pool /
  last-real-token)
- bt_loss (grpo_engine.py:11-29): Bradley–Terry −logσ(β(r_c − r_r))
- prompt collator (:249-296) and responses collator with the first-EoS
  cumsum trick (:301-351)
- z_scores group advantages (+Dr.GRPO no-std, phantom-reward toggle) (:354-391)
- log_probs_per_token (+logsumexp variant with its bf16 caveat) (:397-461),
  log_probs_per_seq (:471-489)
- K3 KL estimator + DSV3.2 ratio-scaled unbiased variant (:492-519)
- off-policy sequence mask (DSV3.2 OPSM) (:522-554)
- GRPOLoss variants: grpo / dapo / dr_grpo hard-clip, SAPO soft sigmoid gate
  (asymmetric temperatures), GSPO sequence-level (:557-680)
- RLHF loop: sample → collate → old/ref logprobs + RM rewards → z-score
  advantages → num_grad_updates inner epochs (:954-1156); GRPOEvaluator (:1159-1351)

TPU redesign: scoring and the inner update are each ONE jitted function;
sampling reuses the scan-based batched decode engine; the phantom-reward
toggle is an explicit argument instead of module-global config state.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from llm_quest_tpu.inference import generate as gen
from llm_quest_tpu.models import gpt2
from llm_quest_tpu.ops.linear import init_linear, linear

# ------------------------------------------------------------ reward model


def init_reward_model(key, cfg):
    """GPT-2 body + scalar head (reference: pref_reward_model.py:10-33)."""
    kb, kh = jax.random.split(key)
    return {"body": gpt2.init(kb, cfg), "head": init_linear(kh, cfg["emb_dim"], 1, bias=True)}


def scores_mean_pooling(scores, reward_mask):
    """(b, s, 1) scalar scores → masked mean (b,) (reference: grpo_engine.py:46-56)."""
    m = reward_mask.astype(scores.dtype)
    return jnp.sum(scores[..., 0] * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1)


def hidden_states_mean_pooling(hidden, reward_mask, head):
    m = reward_mask.astype(hidden.dtype)[..., None]
    pooled = jnp.sum(hidden * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1)
    return linear(head, pooled)[..., 0]


def last_token_score(hidden, attention_mask, head):
    seq_lengths = jnp.sum(attention_mask.astype(jnp.int32), axis=-1)
    b = hidden.shape[0]
    return linear(head, hidden[jnp.arange(b), seq_lengths - 1])[..., 0]


def reward_model_apply(params, cfg, x, *, attn_mask=None, reward_mask=None, readout="scores_mean_pooling"):
    """(b, s) ids → (b,) scalar rewards."""
    hidden, _, _ = gpt2.apply(params["body"], cfg, x, attn_mask=attn_mask, output_hidden_states=True)
    if readout == "last_token":
        assert attn_mask is not None
        return last_token_score(hidden, attn_mask, params["head"])
    if readout == "hidden_states_pooling":
        assert reward_mask is not None
        return hidden_states_mean_pooling(hidden, reward_mask, params["head"])
    assert reward_mask is not None
    return scores_mean_pooling(linear(params["head"], hidden), reward_mask)


def bt_loss(chosen_logits, rejected_logits, beta=1.0):
    """Bradley–Terry loss (reference: grpo_engine.py:11-29)."""
    return jnp.mean(-jax.nn.log_sigmoid(beta * (chosen_logits - rejected_logits)))


def make_rm_train_step(cfg, optimizer, *, readout="scores_mean_pooling", beta=1.0):
    def loss_fn(params, batch):
        chosen = reward_model_apply(
            params, cfg, batch["chosen"], attn_mask=batch["chosen_attn_mask"],
            reward_mask=batch["chosen_mask"], readout=readout,
        )
        rejected = reward_model_apply(
            params, cfg, batch["rejected"], attn_mask=batch["rejected_attn_mask"],
            reward_mask=batch["rejected_mask"], readout=readout,
        )
        return bt_loss(chosen, rejected, beta), (chosen, rejected)

    @jax.jit
    def train_step(params, opt_state, batch):
        (loss, (c, r)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        accuracy = jnp.mean((c > r).astype(jnp.float32))
        return params, opt_state, loss, accuracy

    return train_step


def rm_evaluate(params, cfg, loader, *, readout="scores_mean_pooling", num_batches=None):
    """(mean loss, accuracy) (reference: grpo_engine.py:189-246).

    Both RM forwards + BT loss + accuracy count run as ONE jitted program
    per batch shape — traced once, reused across the loader."""
    batches = list(loader) if not isinstance(loader, list) else loader
    n = len(batches) if num_batches is None else min(num_batches, len(batches))

    @jax.jit
    def eval_batch(p, batch):
        chosen = reward_model_apply(p, cfg, batch["chosen"], attn_mask=batch["chosen_attn_mask"],
                                    reward_mask=batch["chosen_mask"], readout=readout)
        rejected = reward_model_apply(p, cfg, batch["rejected"], attn_mask=batch["rejected_attn_mask"],
                                      reward_mask=batch["rejected_mask"], readout=readout)
        return bt_loss(chosen, rejected), jnp.sum(chosen > rejected)

    tot_loss, correct, seen = 0.0, 0, 0
    for batch in batches[:n]:
        loss, n_correct = eval_batch(params, batch)
        tot_loss += float(loss)
        correct += int(n_correct)
        seen += batch["chosen"].shape[0]
    return tot_loss / max(n, 1), correct / max(seen, 1)


# --------------------------------------------------------------- collators


def prompt_collator(prompts, pad_token_id=50256, custom_max_length=None):
    """Right-pad prompts (reference: grpo_engine.py:249-296).
    Returns {"padded_prompts", "prompt_masks", "last_real_pos"} numpy."""
    if custom_max_length is not None:
        prompts = [p[:custom_max_length] for p in prompts]
    max_length = max(len(p) for p in prompts)

    padded = np.full((len(prompts), max_length), pad_token_id, dtype=np.int32)
    masks = np.zeros((len(prompts), max_length), dtype=bool)
    last_real = np.zeros((len(prompts),), dtype=np.int64)
    for i, p in enumerate(prompts):
        padded[i, : len(p)] = p
        masks[i, : len(p)] = True
        last_real[i] = len(p) - 1
    return {"padded_prompts": padded, "prompt_masks": masks, "last_real_pos": last_real}


def batched_responses_collator(responses, prompt_masks, eos_ids=50256, pad_token_id=50256):
    """Masks for sampled responses via the first-EoS cumsum trick
    (reference: grpo_engine.py:301-351). responses: (B, prompt+gen) ids.
    Returns {"padded_responses", "reward_masks", "attn_masks"}."""
    len_prompt = prompt_masks.shape[1]
    eos_arr = jnp.asarray([eos_ids] if isinstance(eos_ids, int) else list(eos_ids))

    is_stop = jnp.any(responses[..., None] == eos_arr, axis=-1) | (responses == pad_token_id)
    is_stop = is_stop.at[:, :len_prompt].set(False)

    cumsum = jnp.cumsum(is_stop, axis=1)
    attn_masks = cumsum <= 1  # everything before + the first EoS/pad
    attn_masks = attn_masks.at[:, :len_prompt].set(prompt_masks)

    reward_masks = attn_masks.at[:, :len_prompt].set(False)
    return {"padded_responses": responses, "reward_masks": reward_masks, "attn_masks": attn_masks}


# --------------------------------------------------------------- core math


def z_scores(rewards, num_samples, dr_grpo=None, *, use_phantom_reward=False):
    """Group-relative advantages (reference: grpo_engine.py:354-391)."""
    rewards = rewards.reshape(-1, num_samples).astype(jnp.float32)
    if use_phantom_reward:
        augmented = jnp.concatenate([rewards, jnp.zeros((rewards.shape[0], 1))], axis=1)
    else:
        augmented = rewards
    group_mean = jnp.mean(augmented, axis=1, keepdims=True)
    if dr_grpo == "dr_grpo":
        z = rewards - group_mean
    else:
        group_std = jnp.std(augmented, axis=1, keepdims=True, ddof=1)  # torch std default: Bessel
        z = (rewards - group_mean) / (group_std + 1e-8)
    return z.reshape(-1)


def log_probs_per_token(logits, inputs):
    """(B, S-1) logprob of each realized next token (reference: :397-425)."""
    logits = logits[:, :-1, :].astype(jnp.float32)
    labels = inputs[:, 1:]
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(logprobs, labels[..., None], axis=-1)[..., 0]


def log_probs_per_token_optimized(logits, inputs):
    """logsumexp variant — avoid under bf16 (reference caveat, :428-461)."""
    logits = logits[:, :-1, :]
    labels = inputs[:, 1:]
    label_logits = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    return label_logits - jax.nn.logsumexp(logits, axis=-1)


def log_probs_per_seq(logprobs_per_token, loss_mask):
    """Masked mean per sequence (B,) (reference: :471-489)."""
    m = loss_mask.astype(logprobs_per_token.dtype)
    return jnp.sum(logprobs_per_token * m, axis=1) / jnp.sum(m, axis=1)


def kl_div_per_token(policy_logprobs, reference_logprobs, policy_ratio=None):
    """K3 estimator; ratio-scaled unbiased variant when policy_ratio given
    (reference: :492-519)."""
    log_ratio = reference_logprobs - policy_logprobs
    ratio = jnp.exp(log_ratio)
    kl = ratio - log_ratio - 1
    if policy_ratio is not None:
        kl = policy_ratio * kl
    return kl


def off_policy_seq_mask(kl_per_token, advantages, loss_mask, delta=0.5):
    """DSV3.2 OPSM: zero sequences with (negative advantage ∧ high KL)
    (reference: :522-554). Returns (B, 1) bool."""
    m = loss_mask.astype(kl_per_token.dtype)
    mean_kl = jnp.sum(kl_per_token * m, axis=-1, keepdims=True) / jnp.maximum(
        jnp.sum(m, axis=-1, keepdims=True), 1
    )
    advantage_mask = advantages.reshape(-1, 1) >= 0
    kl_mask = mean_kl <= delta
    return advantage_mask | kl_mask


class GRPOLoss:
    """GRPO-family losses (reference: grpo_engine.py:557-680)."""

    @staticmethod
    def compute(
        policy_ratio,
        advantages,
        loss_mask,
        min_clip,
        max_clip,
        beta,
        kl_div,
        num_samples,
        max_gen=1,
        variant="grpo",
        off_policy_mask=None,
    ):
        if variant == "gspo":
            return GRPOLoss._gspo(policy_ratio, advantages, min_clip, max_clip, off_policy_mask)

        adv = advantages[:, None]
        if variant in ("grpo", "dapo", "dr_grpo"):
            surr = GRPOLoss._clipped_surrogate(policy_ratio, adv, min_clip, max_clip)
        elif variant == "sapo":
            surr = GRPOLoss._sapo_surrogate(policy_ratio, adv)
        else:
            raise ValueError(f"Unknown loss type: {variant}")

        if off_policy_mask is not None:
            surr = surr * off_policy_mask.astype(surr.dtype)

        loss_per_token = -(surr - beta * kl_div)
        loss_per_token = loss_per_token * loss_mask.astype(loss_per_token.dtype)
        return GRPOLoss._aggregate(loss_per_token, loss_mask, num_samples, max_gen, variant)

    @staticmethod
    def _clipped_surrogate(ratio, adv, min_clip, max_clip):
        unclipped = ratio * adv
        clipped = jnp.clip(ratio, 1 - min_clip, 1 + max_clip) * adv
        return jnp.minimum(unclipped, clipped)

    @staticmethod
    def _sapo_surrogate(ratio, adv, temp_pos_tokens=1.0, temp_neg_tokens=1.05):
        """SAPO soft sigmoid gate with asymmetric temps (t_neg > t_pos)
        (reference: :616-626; https://arxiv.org/abs/2511.20347)."""
        temps = jnp.where(adv > 0, temp_pos_tokens, temp_neg_tokens)
        soft_gate = jax.nn.sigmoid(temps * (ratio - 1)) * 4 / temps
        return soft_gate * adv

    @staticmethod
    def _gspo(masked_seq_ratio, advantages, min_clip, max_clip, off_policy_mask=None):
        surr = masked_seq_ratio * advantages
        clipped = jnp.clip(masked_seq_ratio, 1 - min_clip, 1 + max_clip) * advantages
        surr = jnp.minimum(surr, clipped)
        if off_policy_mask is not None:
            surr = surr * off_policy_mask[..., 0].astype(surr.dtype)
        return jnp.mean(-surr)

    @staticmethod
    def _aggregate(loss_per_token, loss_mask, num_samples, max_gen, variant):
        m = loss_mask.astype(loss_per_token.dtype)
        if variant in ("grpo", "sapo"):
            per_seq = jnp.sum(loss_per_token, axis=-1) / jnp.maximum(jnp.sum(m, axis=-1), 1)
            per_group = jnp.mean(per_seq.reshape(-1, num_samples), axis=1)
            return jnp.mean(per_group)
        if variant == "dapo":
            return jnp.sum(loss_per_token) / jnp.maximum(jnp.sum(m), 1)
        if variant == "dr_grpo":
            return jnp.sum(loss_per_token) / (loss_per_token.shape[0] * max_gen)
        raise ValueError(f"Unknown loss type: {variant}")


# ------------------------------------------------------------- RLHF loop


def make_grpo_update_step(model, cfg, optimizer, *, num_samples=1, variant="grpo", min_clip=0.2,
                          max_clip=0.2, beta=0.04, max_gen=1, opsm_delta=None, unbiased_kl=False):
    """One jitted GRPO policy update: (params, opt_state, exp) → (params,
    opt_state, metrics). exp: responses/attn_masks/reward_masks/advantages/
    old_logprobs/ref_logprobs."""

    def loss_fn(params, exp):
        logits, _, _ = model.apply(params, cfg, exp["responses"], attn_mask=exp["attn_masks"])
        logprobs = log_probs_per_token(logits, exp["responses"])
        loss_mask = exp["reward_masks"][:, 1:]

        if variant == "gspo":
            new_seq = log_probs_per_seq(logprobs, loss_mask)
            old_seq = log_probs_per_seq(exp["old_logprobs"], loss_mask)
            ratio = jnp.exp(new_seq - old_seq)
            kl = kl_div_per_token(logprobs, exp["ref_logprobs"])
        else:
            ratio = jnp.exp(logprobs - exp["old_logprobs"])
            kl = kl_div_per_token(logprobs, exp["ref_logprobs"], policy_ratio=ratio if unbiased_kl else None)

        opm = None
        if opsm_delta is not None:
            opm = off_policy_seq_mask(
                kl_div_per_token(exp["old_logprobs"], logprobs), exp["advantages"], loss_mask, delta=opsm_delta
            )

        loss = GRPOLoss.compute(
            ratio, exp["advantages"], loss_mask, min_clip, max_clip, beta, kl,
            num_samples, max_gen=max_gen, variant=variant, off_policy_mask=opm,
        )
        mean_kl = jnp.sum(kl * loss_mask) / jnp.maximum(jnp.sum(loss_mask), 1)
        return loss, mean_kl

    @jax.jit
    def update(params, opt_state, exp):
        (loss, mean_kl), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, exp)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "kl": mean_kl}

    return update


def grpo_experience(
    model, cfg, policy_params, reference_params, prompt_batch, reward_fn, *,
    num_samples, max_gen, temp=1.0, top_k=None, eos_id=50256, pad_id=50256, rng=None,
    dr_grpo=None, use_phantom_reward=False,
):
    """EXPERIENCE + SCORING phases (reference: rlhf loop steps 1-3).

    reward_fn(responses, reward_masks, attn_masks) → (B,) rewards — an RM
    readout for RLHF, the verifier for RLVR, prefix-matching for RPT.
    Returns the exp dict for make_grpo_update_step.
    """
    prompts = jnp.repeat(jnp.asarray(prompt_batch["padded_prompts"]), num_samples, axis=0)
    masks = jnp.repeat(jnp.asarray(prompt_batch["prompt_masks"]), num_samples, axis=0)
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    out = gen.generate_batched_kv_cache(
        model, policy_params, cfg, prompts, masks, max_gen=max_gen, temp=temp, top_k=top_k,
        eos_ids=eos_id, pad_id=pad_id, rng=rng,
    )
    coll = batched_responses_collator(out["sequences"], masks, eos_ids=eos_id, pad_token_id=pad_id)
    responses, attn_masks, reward_masks = (
        coll["padded_responses"], coll["attn_masks"], coll["reward_masks"],
    )

    @jax.jit
    def score(policy_params, reference_params, responses, attn_masks):
        old_logits, _, _ = model.apply(policy_params, cfg, responses, attn_mask=attn_masks)
        ref_logits, _, _ = model.apply(reference_params, cfg, responses, attn_mask=attn_masks)
        return log_probs_per_token(old_logits, responses), log_probs_per_token(ref_logits, responses)

    old_logprobs, ref_logprobs = score(policy_params, reference_params, responses, attn_masks)
    rewards = reward_fn(responses, reward_masks, attn_masks)
    advantages = z_scores(rewards, num_samples, dr_grpo, use_phantom_reward=use_phantom_reward)

    return {
        "responses": responses,
        "attn_masks": attn_masks,
        "reward_masks": reward_masks,
        "advantages": advantages,
        "old_logprobs": jax.lax.stop_gradient(old_logprobs),
        "ref_logprobs": jax.lax.stop_gradient(ref_logprobs),
        "rewards": rewards,
    }


def rlhf_grpo_training_loop(
    model, cfg, policy_params, reference_params, rm_params, rm_cfg, prompt_batches, *,
    num_epochs=1, num_samples=4, max_gen=32, num_grad_updates=2, lr=1e-6, variant="grpo",
    min_clip=0.2, max_clip=0.2, beta=0.04, temp=1.0, top_k=None, eos_id=50256, pad_id=50256,
    readout="scores_mean_pooling", rng=None, log=print, evaluator=None,
):
    """Full RLHF-GRPO loop (reference: grpo_engine.py:954-1156).
    Returns (policy_params, metrics list)."""
    optimizer = optax.adamw(lr)
    opt_state = optimizer.init(policy_params)
    update = make_grpo_update_step(
        model, cfg, optimizer, variant=variant, min_clip=min_clip, max_clip=max_clip,
        beta=beta, max_gen=max_gen,
    )
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    def reward_fn(responses, reward_masks, attn_masks):
        return reward_model_apply(
            rm_params, rm_cfg, responses, attn_mask=attn_masks, reward_mask=reward_masks, readout=readout
        )

    metrics = []
    for epoch in range(1, num_epochs + 1):
        for batch in prompt_batches:
            rng, sub = jax.random.split(rng)
            exp = grpo_experience(
                model, cfg, policy_params, reference_params, batch, reward_fn,
                num_samples=num_samples, max_gen=max_gen, temp=temp, top_k=top_k,
                eos_id=eos_id, pad_id=pad_id, rng=sub,
            )
            for _ in range(num_grad_updates):
                policy_params, opt_state, m = update(policy_params, opt_state, exp)
            entry = {"loss": float(m["loss"]), "kl": float(m["kl"]), "reward": float(jnp.mean(exp["rewards"]))}
            metrics.append(entry)
            log(f"Epoch {epoch} | loss {entry['loss']:.4f} | reward {entry['reward']:.3f} | kl {entry['kl']:.4f}")
            if evaluator is not None and evaluator.is_rlhf_grpo_best(entry["kl"], entry["reward"]):
                metrics[-1]["best"] = True
    return policy_params, metrics


def grpo_evaluate(model, cfg, policy_params, reference_params, prompt_batches, reward_fn, *,
                  num_samples, max_gen, temp=1.0, top_k=None, eos_id=50256, pad_id=50256, rng=None):
    """Shared RLHF/RLVR evaluation: generate → rewards + masked K3 KL
    (reference: GRPOEvaluator :1159-1351). Returns (mean_reward, mean_kl)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    tot_r, tot_kl, n = 0.0, 0.0, 0
    for batch in prompt_batches:
        rng, sub = jax.random.split(rng)
        exp = grpo_experience(
            model, cfg, policy_params, reference_params, batch, reward_fn,
            num_samples=num_samples, max_gen=max_gen, temp=temp, top_k=top_k,
            eos_id=eos_id, pad_id=pad_id, rng=sub,
        )
        kl = kl_div_per_token(exp["old_logprobs"], exp["ref_logprobs"])
        m = exp["reward_masks"][:, 1:].astype(kl.dtype)
        tot_kl += float(jnp.sum(kl * m) / jnp.maximum(jnp.sum(m), 1))
        tot_r += float(jnp.mean(exp["rewards"]))
        n += 1
    return tot_r / max(n, 1), tot_kl / max(n, 1)
