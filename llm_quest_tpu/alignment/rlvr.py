"""RLVR: verifiable rewards for GRPO reasoning training.

Behavioral parity with the reference (alignment/rlvr_grpo_reasoning/rlvr_engine.py):
- VerifiableRewardCalculator (:20-110): decode → <answer> extraction →
  number sanitization → float comparison; rewards good/wrong/unfinished
  (10 / 0 / −1 defaults)
- rlvr_grpo_prompt_collator (:113-166): prompt collator that carries gold
  answer strings through
- training loop (:169-400) = the RLHF loop with the verifier in place of the
  reward model, optional OPSM and an LR schedule

TPU note: the verifier is inherently host-side (regex over decoded strings)
— it runs between the jitted sample and update phases, exactly at the
device→host boundary the reference crosses (SURVEY §3.4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from llm_quest_tpu.alignment import grpo
from llm_quest_tpu.utils import ResponseExtractor


class VerifiableRewardCalculator:
    """Host-side GSM8K-style verifier (reference: rlvr_engine.py:20-110)."""

    def __init__(
        self,
        tokenizer,
        good_answer_reward=10.0,
        wrong_answer_reward=0.0,
        unfinished_answer_reward=-1.0,
        reasoning_weight=0.0,
        pad_token_id=50256,
    ):
        assert wrong_answer_reward <= 0, "wrong_answer_reward should be ≤ 0"
        assert unfinished_answer_reward <= 0, "unfinished_answer_reward should be ≤ 0"
        self.tokenizer = tokenizer
        self.good_answer_reward = good_answer_reward
        self.wrong_answer_reward = wrong_answer_reward
        self.unfinished_answer_reward = unfinished_answer_reward
        self.reasoning_weight = reasoning_weight
        self.pad_token_id = pad_token_id

    def _decode(self, response_ids):
        out = []
        for row in np.asarray(response_ids):
            ids = [int(t) for t in row if int(t) != self.pad_token_id]
            out.append(self.tokenizer.decode(ids))
        return out

    def _calc_answer_reward(self, response_strings, correct_answers):
        rewards = []
        for response, correct in zip(response_strings, correct_answers):
            raw = ResponseExtractor.get_answer(response)
            model_ans = ResponseExtractor.sanitize_answer(raw)
            correct_ans = ResponseExtractor.sanitize_answer(correct)
            if model_ans is None:
                rewards.append(self.unfinished_answer_reward)
                continue
            try:
                rewards.append(
                    self.good_answer_reward if float(model_ans) == float(correct_ans) else self.wrong_answer_reward
                )
            except (ValueError, TypeError):
                rewards.append(self.wrong_answer_reward)
        return rewards

    def __call__(self, model_responses, correct_answers):
        decoded = self._decode(model_responses)
        return jnp.asarray(self._calc_answer_reward(decoded, correct_answers), jnp.float32)


def rlvr_prompt_collator(batch, pad_token_id=50256, custom_max_length=None):
    """Prompt collator carrying gold answers (reference: :113-166).
    batch: list of {"prompt": ids, "answer"|"labels": str}."""
    prompts = [item["prompt"] for item in batch]
    answers = [item.get("answer", item.get("labels")) for item in batch]
    out = grpo.prompt_collator(prompts, pad_token_id, custom_max_length)
    out["answers"] = answers
    return out


def rlvr_grpo_training_loop(
    model, cfg, policy_params, reference_params, prompt_batches, reward_calculator, *,
    num_epochs=1, num_samples=4, max_gen=128, num_grad_updates=2, peak_lr=1e-6, warmup_steps=0,
    min_lr=None, decay=None, variant="grpo", min_clip=0.2, max_clip=0.2, beta=0.04, temp=1.0,
    top_k=None, eos_id=50256, pad_id=50256, opsm_delta=None, rng=None, log=print, evaluator=None,
    use_phantom_reward=False,
):
    """RLVR training loop (reference: rlvr_engine.py:169-400) — the RLHF loop
    with verifiable rewards, OPSM and an LR schedule.
    prompt_batches: list of rlvr_prompt_collator outputs."""
    from llm_quest_tpu.training.engine import make_lr_schedule

    total_steps = len(prompt_batches) * num_epochs * num_grad_updates
    schedule = make_lr_schedule(total_steps, peak_lr / 10, peak_lr, warmup_steps, min_lr, decay)
    optimizer = optax.adamw(schedule)
    opt_state = optimizer.init(policy_params)
    update = grpo.make_grpo_update_step(
        model, cfg, optimizer, variant=variant, min_clip=min_clip, max_clip=max_clip, beta=beta,
        max_gen=max_gen, opsm_delta=opsm_delta,
    )
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    metrics = []
    for epoch in range(1, num_epochs + 1):
        for batch in prompt_batches:
            answers = [a for a in batch["answers"] for _ in range(num_samples)]  # repeat-interleave

            def reward_fn(responses, reward_masks, attn_masks):
                # zero out prompt+pad tokens so only the response is decoded
                resp_only = jnp.where(reward_masks, responses, pad_id)
                return reward_calculator(resp_only, answers)

            rng, sub = jax.random.split(rng)
            exp = grpo.grpo_experience(
                model, cfg, policy_params, reference_params, batch, reward_fn,
                num_samples=num_samples, max_gen=max_gen, temp=temp, top_k=top_k,
                eos_id=eos_id, pad_id=pad_id, rng=sub,
                dr_grpo=variant if variant == "dr_grpo" else None,
                use_phantom_reward=use_phantom_reward,
            )
            for _ in range(num_grad_updates):
                policy_params, opt_state, m = update(policy_params, opt_state, exp)
            entry = {"loss": float(m["loss"]), "kl": float(m["kl"]), "reward": float(jnp.mean(exp["rewards"]))}
            metrics.append(entry)
            log(f"Epoch {epoch} | loss {entry['loss']:.4f} | reward {entry['reward']:.3f} | kl {entry['kl']:.4f}")
            if evaluator is not None and evaluator.is_rlvr_grpo_best(entry["kl"], entry["reward"]):
                metrics[-1]["best"] = True
    return policy_params, metrics
