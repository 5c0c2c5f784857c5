"""Linear / embedding primitives.

Initialization matches torch defaults (kaiming-uniform with a=sqrt(5) for
linear weights → U(-1/sqrt(fan_in), 1/sqrt(fan_in)); N(0,1) for embeddings) so
training dynamics are comparable with the reference's nn.Linear / nn.Embedding
modules.

Weights are stored as (in_dim, out_dim) — the natural layout for ``x @ w`` on
the MXU (no transpose at apply time).
"""

import jax
import jax.numpy as jnp


def init_linear(key, in_dim, out_dim, *, bias=True, dtype=jnp.float32):
    """torch-default initialized linear layer params: {"w": (in,out)[, "b": (out,)]}."""
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / (in_dim**0.5)
    params = {"w": jax.random.uniform(wkey, (in_dim, out_dim), dtype, -bound, bound)}
    if bias:
        params["b"] = jax.random.uniform(bkey, (out_dim,), dtype, -bound, bound)
    return params


def linear(params, x):
    """x @ w (+ b) (+ LoRA delta when a "lora" sub-dict is present —
    see ops/lora.py). x: (..., in_dim) → (..., out_dim).

    Weight-only int8 checkpoints (ops/quantization.py) carry
    {"w_q", "w_scale"} instead of "w" — the dequant folds around the
    matmul, so every model serves quantized params through this same fn."""
    if "w_q" in params:
        from llm_quest_tpu.ops.quantization import int8_matmul

        y = int8_matmul(x, params["w_q"], params["w_scale"])
    else:
        y = x @ params["w"]
    if "b" in params:
        y = y + params["b"]
    if "lora" in params:
        from llm_quest_tpu.ops.lora import lora_delta

        y = y + lora_delta(params["lora"], x)
    return y


def init_embedding(key, num_embeddings, emb_dim, *, dtype=jnp.float32):
    """N(0,1)-initialized embedding table (torch nn.Embedding default)."""
    return {"w": jax.random.normal(key, (num_embeddings, emb_dim), dtype)}


def embedding(params, ids):
    """Token-id lookup. ids: (...,) int → (..., emb_dim)."""
    return params["w"][ids]
