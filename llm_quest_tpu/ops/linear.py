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


def embedding(params, ids, *, dtype=None):
    """Token-id lookup. ids: (...,) int → (..., emb_dim).

    Int8 tables ({"w_q", "w_scale"} — ops/quantization.py with
    quantize_embeddings=True) dequant only the gathered rows. Quantized
    checkpoints are a bf16 serving-path transform (module docstring
    there), so the dequant lands in bf16 unless ``dtype`` overrides."""
    if "w_q" in params:
        dt = dtype or jnp.bfloat16
        rows = params["w_q"][ids].astype(dt)
        return rows * params["w_scale"][ids][..., None].astype(dt)
    w = params["w"][ids]
    return w if dtype is None else w.astype(dtype)


def tied_head(tok_emb, h):
    """Tied-embedding output head: ``h @ w.T`` (the reference models'
    ``lm_head.weight = embedding.weight`` pattern). Int8 tables dispatch to
    ``(h @ w_q.T) * scale`` — the per-ROW scale is the head matmul's
    output-channel scale, so dequantization is an exact (vocab,)-vector
    epilogue and the int8→bf16 convert fuses into the dot's weight read
    (the table streams from HBM at 1 byte/element)."""
    if "w_q" in tok_emb:
        return (h @ tok_emb["w_q"].T.astype(h.dtype)) * tok_emb["w_scale"].astype(h.dtype)
    return h @ tok_emb["w"].T
