"""Gemma-3 (text) in functional JAX form.

Behavioral parity with the reference (llama3_to_gemma3/gemma3_model.py:7-64,
gemma3_attention.py:49-242, gemma3_transformer_block.py:109-162):

- GQA with QK LayerNorm applied AFTER RoPE (per-head-dim LayerNorm)
- local/global alternation: layer is SWA unless (layer_id+1) divisible by
  (local_global_att_ratio + 1); ratio 0 → all global, n_layers → all SWA
- GeGLU FFN (GELU-gated, no biases)
- pre- AND post-norms around both attention and FFN (4 RMSNorms per block)
- weight tying; optional logits softcapping via cfg["logits_softcap"]
  (kept as a standalone op — the reference removed it from the model for
  Gemma-3 but ships the op, logits_softcapping.py:8-19)

TPU redesign: SWA is a fused iota window mask into one sdpa call instead of
the reference's as_strided window gather — under XLA the strided gather
materializes (no aliasing), so the masked form is both simpler and no slower
until the Pallas blockwise-SWA kernel takes over for long contexts.
"""

import jax
import jax.numpy as jnp

from llm_quest_tpu.config import model_dtype
from llm_quest_tpu.inference import cache as kvc
from llm_quest_tpu.ops import rope
from llm_quest_tpu.ops.activations import gelu_erf
from llm_quest_tpu.ops.attention import attention, merge_heads, split_heads
from llm_quest_tpu.ops.linear import embedding, init_embedding, init_linear, linear, tied_head
from llm_quest_tpu.ops.masks import causal_mask
from llm_quest_tpu.ops.norms import init_layer_norm, init_rms_norm, layer_norm, rms_norm


def head_dim(cfg):
    return cfg.get("head_dim", cfg["emb_dim"] // cfg["n_heads"])


def is_swa_layer(cfg, layer_id):
    """SWA unless every (ratio+1)-th layer (reference: gemma3_attention.py:179,216)."""
    ratio = cfg["local_global_att_ratio"]
    return cfg["window_size"] > 0 and (layer_id + 1) % (ratio + 1) != 0


def init_attention(key, cfg, dtype):
    d = cfg["emb_dim"]
    hd = head_dim(cfg)
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "wq": init_linear(kq, d, cfg["n_heads"] * hd, bias=False, dtype=dtype),
        "wk": init_linear(kk, d, cfg["num_kv_groups"] * hd, bias=False, dtype=dtype),
        "wv": init_linear(kv, d, cfg["num_kv_groups"] * hd, bias=False, dtype=dtype),
        "out_proj": init_linear(ko, cfg["n_heads"] * hd, d, bias=True, dtype=dtype),
        "q_norm": init_layer_norm(hd, dtype=dtype),
        "k_norm": init_layer_norm(hd, dtype=dtype),
    }


def init_geglu(key, emb_dim, hidden_dim, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "gate": init_linear(k1, emb_dim, hidden_dim, bias=False, dtype=dtype),
        "up": init_linear(k2, emb_dim, hidden_dim, bias=False, dtype=dtype),
        "down": init_linear(k3, hidden_dim, emb_dim, bias=False, dtype=dtype),
    }


def geglu(params, x):
    """GeGLU: (GELU(x·W_gate) ⊙ x·W_up)·W_down (reference: gemma3_transformer_block.py:61-106)."""
    return linear(params["down"], gelu_erf(linear(params["gate"], x)) * linear(params["up"], x))


def init_block(key, cfg, dtype):
    ka, kf = jax.random.split(key)
    d = cfg["emb_dim"]
    return {
        "pre_att_norm": init_rms_norm(d, dtype=dtype),
        "att": init_attention(ka, cfg, dtype),
        "post_att_norm": init_rms_norm(d, dtype=dtype),
        "pre_ffn_norm": init_rms_norm(d, dtype=dtype),
        "ffn": init_geglu(kf, d, cfg["hidden_dim"], dtype),
        "post_ffn_norm": init_rms_norm(d, dtype=dtype),
    }


def init(key, cfg):
    dtype = model_dtype(cfg)
    keys = jax.random.split(key, cfg["n_layers"] + 1)
    return {
        "tok_emb": init_embedding(keys[0], cfg["vocab_size"], cfg["emb_dim"], dtype=dtype),
        "blocks": [init_block(keys[1 + i], cfg, dtype) for i in range(cfg["n_layers"])],
        "final_norm": init_rms_norm(cfg["emb_dim"], dtype=dtype),
    }


def rope_tables(cfg, *, scaled=False):
    return rope.compute_angles(
        cfg["rope_base"],
        head_dim(cfg),
        cfg["context_length"],
        smooth_scaling_cfg=cfg.get("rope_freq") if scaled else None,
    )


def init_cache(cfg, batch, max_len, *, dtype=None):
    return kvc.init_kv_cache(
        cfg["n_layers"], batch, cfg["num_kv_groups"], max_len, head_dim(cfg),
        dtype=dtype or model_dtype(cfg), quant=cfg.get("kv_quant"),
    )


def _attention(params, cfg, x, mask, cos, sin, cache, layer_idx, position_ids, *, window_size=None, attn_mask=None):
    q = split_heads(linear(params["wq"], x), cfg["n_heads"])
    k = split_heads(linear(params["wk"], x), cfg["num_kv_groups"])
    v = split_heads(linear(params["wv"], x), cfg["num_kv_groups"])

    # RoPE first, QK-norm after ("we need og vectors for rotating",
    # reference: gemma3_attention.py:202-207)
    q = layer_norm(params["q_norm"], rope.apply(q, cos, sin, position_ids))
    k = layer_norm(params["k_norm"], rope.apply(k, cos, sin, position_ids))

    if cache is not None:
        cache, k, v = kvc.update_layer(cache, layer_idx, k, v)

    out = merge_heads(attention(
        q, k, v, cfg=cfg, mask=mask, causal=True, window_size=window_size,
        attn_mask=attn_mask, flash_ok=cache is None,
    ))
    return linear(params["out_proj"], out), cache


def apply(params, cfg, x, *, attn_mask=None, cache=None, position_ids=None, rope_cos_sin=None, **_):
    """Forward. x: (b, s) ids. Returns (logits, cache, aux)."""
    b, s = x.shape
    cos, sin = rope_cos_sin if rope_cos_sin is not None else rope_tables(cfg)

    pos0 = cache["pos"] if cache is not None else 0
    if position_ids is None and cache is not None:
        position_ids = (pos0 + jnp.arange(s))[None, :] * jnp.ones((b, 1), jnp.int32)

    k_len = kvc.max_len(cache) if cache is not None else s
    global_mask = causal_mask(s, k_len, q_start=pos0, attn_mask=attn_mask)
    swa_mask = causal_mask(s, k_len, q_start=pos0, window_size=cfg["window_size"], attn_mask=attn_mask)

    h = embedding(params["tok_emb"], x)

    for i, block in enumerate(params["blocks"]):
        mask = swa_mask if is_swa_layer(cfg, i) else global_mask

        residual = h
        hn = rms_norm(block["pre_att_norm"], h)
        att_out, cache = _attention(
            block["att"], cfg, hn, mask, cos, sin, cache, i, position_ids,
            window_size=cfg["window_size"] if is_swa_layer(cfg, i) else None,
            attn_mask=attn_mask,
        )
        h = residual + rms_norm(block["post_att_norm"], att_out)

        residual = h
        ffn_out = geglu(block["ffn"], rms_norm(block["pre_ffn_norm"], h))
        h = residual + rms_norm(block["post_ffn_norm"], ffn_out)

    h = rms_norm(params["final_norm"], h)
    if cache is not None:
        cache = kvc.advance(cache, s)

    logits = tied_head(params["tok_emb"], h)  # tied output head
    return logits, cache, {}
