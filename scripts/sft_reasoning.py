"""Reasoning SFT warmup + qualitative test
(reference: alignment/rlvr_grpo_reasoning/sft_warmup.py + sft_reasoning_test.py):
SFT on GSM8K DeepSeek-format data to teach the <think>/<answer> structure
before RLVR, then a greedy qualitative generation check.
"""

import jax
import jax.numpy as jnp

from llm_quest_tpu import config
from llm_quest_tpu.data.datasets import collate_function, data_loader
from llm_quest_tpu.models import gpt2
from llm_quest_tpu.training.engine import training_eval_loop
from llm_quest_tpu.utils import ResponseExtractor

BATCH_SIZE = 4
NUM_EPOCH = 2
PEAK_LR = 5e-5


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
        data = reasoning_dataset(str(config.reasoning_train_path), tok)
        samples = [d["prompt"] + d["full_response"] for d in data[:128]]
    else:
        tok = _ByteTok()
        samples = [
            tok.encode(
                f"What is {i}+{i}?\n### Response:\n<think>\n{i} plus {i} is {2*i}\n</think>\n<answer>\n{2*i}\n</answer>"
            )
            for i in range(2, 34)
        ]

    loader = data_loader(samples, BATCH_SIZE, shuffle=True, collate_fn=collate_function)
    params = gpt2.init(jax.random.PRNGKey(0), cfg)  # or load pretrained GPT-2
    params, _, _ = training_eval_loop(
        gpt2, cfg, params, loader, loader,
        num_epoch=NUM_EPOCH, peak_lr=PEAK_LR, init_lr=PEAK_LR / 10, min_lr=PEAK_LR / 10,
        warmup_steps=5, decay="cosine", eval_freq=5, eval_iter=2,
    )

    # qualitative test (reference: sft_reasoning_test.py:30-51)
    from llm_quest_tpu.inference import generate as gen

    prompt = jnp.asarray([tok.encode("What is 3+3?\n### Response:\n")])
    out = gen.generate_kv_cache(gpt2, params, cfg, prompt, max_gen=48, temp=0.0, eos_ids=-1, pad_id=0)
    text = tok.decode(out["sequences"][0].tolist())
    print("generated:", text[:200])
    print("extracted answer:", ResponseExtractor.get_answer(text))
