"""Qwen3 generation demo (reference: qwen/qwen3/qwen3_generate.py):
single-prompt cached decode plus LEFT- and RIGHT-padded batched generation —
the three decode disciplines of the unified engine. Loads real HF weights
when the hub is reachable, otherwise runs the tiny random config.
"""

import jax
import jax.numpy as jnp

from llm_quest_tpu import config
from llm_quest_tpu.inference import generate as gen
from llm_quest_tpu.models import qwen3

MAX_GEN = 24
TEMP = 0.0

if __name__ == "__main__":
    try:
        cfg = config.qwen3_config_creator("0.6B", base_model=True)
        params = qwen3.init(jax.random.PRNGKey(0), cfg)
        from llm_quest_tpu.weights.interop import download_hf_weights, load_hf_qwen3

        params = load_hf_qwen3(params, cfg, download_hf_weights(cfg["model_path"]))
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(cfg["model_path"])
        enc = lambda t: tok.encode(t)
        dec = lambda ids: tok.decode([i for i in ids if i != 0])
        pad_id, eos = 0, tok.eos_token_id
    except Exception as e:
        print(f"(HF unavailable: {e}) — random-weight demo config")
        cfg = config.qwen3_config_creator("temp_dense")
        cfg = dict(cfg, dtype=jnp.float32, vocab_size=512, context_length=256)
        params = qwen3.init(jax.random.PRNGKey(0), cfg)
        enc = lambda t: [b % 500 for b in t.encode()]
        dec = lambda ids: str(list(ids))
        pad_id, eos = 0, -1

    prompts = ["The capital of France is", "Once upon a time"]
    ids = [enc(p) for p in prompts]
    max_len = max(len(v) for v in ids)

    # single-prompt cached decode
    one = gen.generate_kv_cache(
        qwen3, params, cfg, jnp.asarray([ids[0]]), max_gen=MAX_GEN, temp=TEMP, eos_ids=eos, pad_id=pad_id
    )
    print("single:", dec(one["sequences"][0].tolist()))

    # right-padded batch
    import numpy as np

    right = np.full((len(ids), max_len), pad_id, np.int32)
    mask_r = np.zeros_like(right, bool)
    for i, v in enumerate(ids):
        right[i, : len(v)] = v
        mask_r[i, : len(v)] = True
    out_r = gen.generate_batched_kv_cache(
        qwen3, params, cfg, jnp.asarray(right), jnp.asarray(mask_r),
        max_gen=MAX_GEN, temp=TEMP, eos_ids=eos, pad_id=pad_id,
    )
    for row in out_r["sequences"]:
        print("right-pad:", dec(row.tolist()))

    # left-padded batch
    left = np.full((len(ids), max_len), pad_id, np.int32)
    mask_l = np.zeros_like(left, bool)
    for i, v in enumerate(ids):
        left[i, max_len - len(v):] = v
        mask_l[i, max_len - len(v):] = True
    out_l = gen.generate_batched_kv_cache(
        qwen3, params, cfg, jnp.asarray(left), jnp.asarray(mask_l),
        max_gen=MAX_GEN, temp=TEMP, eos_ids=eos, pad_id=pad_id, left_pad=True,
    )
    for row in out_l["sequences"]:
        print("left-pad: ", dec(row.tolist()))
