"""RLVR-GRPO reasoning training entry script
(reference: alignment/rlvr_grpo_reasoning/rlvr_grpo_training.py).

GSM8K JSONL + tiktoken when available; synthetic prompts fallback.
"""

import jax

from llm_quest_tpu import config
from llm_quest_tpu.alignment.rlvr import VerifiableRewardCalculator, rlvr_grpo_training_loop, rlvr_prompt_collator
from llm_quest_tpu.models import gpt2
from llm_quest_tpu.utils import CheckpointEvaluator

# hparams (reference: rlvr_grpo_training.py module globals)
BATCH_SIZE = 2
NUM_SAMPLES = 4
MAX_GEN = 48
NUM_GRAD_UPDATES = 2
PEAK_LR = 1e-6
LOSS_VARIANT = "grpo"  # grpo | dapo | dr_grpo | sapo | gspo
BETA_KL = 0.04
TEMP = 1.0
TOP_K = 40


class _ByteTok:
    def encode(self, t):
        return [b % 50000 for b in t.encode()]

    def decode(self, ids):
        return bytes(int(i) % 256 for i in ids).decode(errors="ignore")


if __name__ == "__main__":
    cfg = dict(config.GPT_SMALL_CONFIG, context_length=512)

    if config.reasoning_train_path.exists():
        import tiktoken

        from llm_quest_tpu.data.datasets import reasoning_dataset

        tok = tiktoken.get_encoding("gpt2")
        samples = reasoning_dataset(str(config.reasoning_train_path), tok)[:8]
    else:
        tok = _ByteTok()
        samples = [
            {"prompt": tok.encode(f"What is {i}+{i}? "), "answer": str(2 * i)} for i in range(1, 9)
        ]

    batches = [
        rlvr_prompt_collator(samples[i : i + BATCH_SIZE]) for i in range(0, len(samples), BATCH_SIZE)
    ]

    policy = gpt2.init(jax.random.PRNGKey(0), cfg)
    reference = jax.tree.map(lambda x: x, policy)
    calc = VerifiableRewardCalculator(tok)
    evaluator = CheckpointEvaluator()

    policy, metrics = rlvr_grpo_training_loop(
        gpt2, cfg, policy, reference, batches, calc,
        num_epochs=1, num_samples=NUM_SAMPLES, max_gen=MAX_GEN, num_grad_updates=NUM_GRAD_UPDATES,
        peak_lr=PEAK_LR, variant=LOSS_VARIANT, beta=BETA_KL, temp=TEMP, top_k=TOP_K,
        evaluator=evaluator,
    )
    print(f"final reward: {metrics[-1]['reward']:.3f}  kl: {metrics[-1]['kl']:.4f}")
