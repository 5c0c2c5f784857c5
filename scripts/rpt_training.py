"""Reinforcement Pretraining (RPT) entry script
(reference: reinforcement_pretraining/rpt_training.py): the RLVR GRPO loop
with the prefix-matching reward over RPT structured data, optionally
restricted to entropy-filtered (hard) token positions.
"""

import jax

from llm_quest_tpu import config
from llm_quest_tpu.alignment.rlvr import rlvr_grpo_training_loop, rlvr_prompt_collator
from llm_quest_tpu.alignment.rpt import PrefixMatchingReward
from llm_quest_tpu.data.datasets import rpt_structured_dataset
from llm_quest_tpu.models import gpt2

BATCH_SIZE = 2
NUM_SAMPLES = 4
MAX_GEN = 32
LABELS_LENGTH = 8
MAX_CONTEXT = 256
PEAK_LR = 1e-6
ENTROPY_FILTER = False  # True → preprocess with utils.EntropyFilteredTokens


class _ByteTok:
    def encode(self, t):
        return [b % 50000 for b in t.encode()]

    def decode(self, ids):
        return bytes(int(i) % 256 for i in ids).decode(errors="ignore")


if __name__ == "__main__":
    cfg = dict(config.GPT_SMALL_CONFIG, context_length=512)
    tok = _ByteTok()

    entries = [
        {"question": f"Count: {' '.join(str(j) for j in range(i))}", "answer": f"next is {i}\n#### {i}"}
        for i in range(3, 11)
    ]
    samples, allowed, getter = rpt_structured_dataset(
        entries, tok, MAX_CONTEXT, labels_length=LABELS_LENGTH, min_context_tokens=8
    )

    if ENTROPY_FILTER:
        # preprocessing pass: bucket positions by prediction entropy, keep hard
        from llm_quest_tpu.utils import EntropyFilteredTokens

        eft = EntropyFilteredTokens()
        # (run a forward pass over the samples feeding eft.process_batch, then)
        # samples, allowed, getter = rpt_structured_dataset(..., valid_indices=eft.get_difficulty_indices()["hard"])

    items = [getter(i) for i in range(0, min(len(allowed), 8))]
    batches = [rlvr_prompt_collator(items[i : i + BATCH_SIZE]) for i in range(0, len(items), BATCH_SIZE)]

    policy = gpt2.init(jax.random.PRNGKey(0), cfg)
    reference = jax.tree.map(lambda x: x, policy)
    reward = PrefixMatchingReward(tok)

    policy, metrics = rlvr_grpo_training_loop(
        gpt2, cfg, policy, reference, batches, reward,
        num_epochs=1, num_samples=NUM_SAMPLES, max_gen=MAX_GEN, peak_lr=PEAK_LR,
        use_phantom_reward=True,  # RPT rewards often share sign within a group
    )
    print(f"final reward: {metrics[-1]['reward']:.3f}")
