"""Instruction SFT entry script (reference: finetuning/instruct_training.py +
instruct_training_lora.py): Alpaca-format SFT, optionally with a LoRA variant
(lora | lora_xs | tiny_lora) wrapping the attention linears.
"""

import jax

from llm_quest_tpu import config
from llm_quest_tpu.data.datasets import collate_function, data_loader, instruction_dataset, load_instruction_data
from llm_quest_tpu.models import gpt2
from llm_quest_tpu.training.engine import training_eval_loop
from llm_quest_tpu.utils import alpaca_prompt_format

BATCH_SIZE = 4
NUM_EPOCH = 2
PEAK_LR = 5e-5
LORA_VARIANT = None  # None | "lora" | "lora_xs" | "tiny_lora"
LORA_RANK = 8
LORA_ALPHA = 16


class _ByteTok:
    def encode(self, t):
        return [b % 50000 for b in t.encode()]


if __name__ == "__main__":
    cfg = dict(config.GPT_SMALL_CONFIG, context_length=512)

    if config.instruct_train_path.exists():
        import tiktoken

        tok = tiktoken.get_encoding("gpt2")
        data = load_instruction_data(config.instruct_train_path)
    else:
        tok = _ByteTok()
        data = [
            {"instruction": f"Repeat the number {i}", "input": "", "output": str(i)} for i in range(16)
        ]

    samples = instruction_dataset(data, tok, alpaca_prompt_format)
    loader = data_loader(samples, BATCH_SIZE, shuffle=True, collate_fn=collate_function)

    params = gpt2.init(jax.random.PRNGKey(0), cfg)  # or load pretrained weights

    if LORA_VARIANT:
        from llm_quest_tpu.ops.lora import replace_with_lora

        params = replace_with_lora(
            jax.random.PRNGKey(1), params, LORA_RANK, LORA_ALPHA,
            variant=LORA_VARIANT, path_filter=lambda p: "/att/" in p,
        )
        print(f"LoRA variant {LORA_VARIANT} applied to attention linears")

    params, _, val_losses = training_eval_loop(
        gpt2, cfg, params, loader, loader,
        num_epoch=NUM_EPOCH, peak_lr=PEAK_LR, init_lr=PEAK_LR / 10, min_lr=PEAK_LR / 10,
        warmup_steps=5, decay="cosine", eval_freq=5, eval_iter=2,
    )
    print(f"final val loss: {val_losses[-1]:.4f}")
