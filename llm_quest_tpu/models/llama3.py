"""Llama-3.2 in functional JAX form.

Behavioral parity with the reference (gpt_to_llama3/llama_model.py:17-73,
llama_attention.py:14-110, llama_transformer_block.py:15-154):

- GQA with RoPE applied to q/k before the (logical) KV-head repeat
- RMSNorm (eps outside the sqrt, fp32 island, partial cast)
- SwiGLU FFN, no biases except out_proj
- weight tying: out head reuses the token-embedding table
- optional YaRN/NTK-by-parts rope scaling via cfg["rope_freq"]

TPU redesign: no materialized repeat_interleave (GQA grouping happens inside
sdpa's einsum reshape); masks are fused iota comparisons; KV cache is the
static-shape pytree from inference/cache.py.
"""

import jax
import jax.numpy as jnp

from llm_quest_tpu.config import model_dtype
from llm_quest_tpu.inference import cache as kvc
from llm_quest_tpu.ops import rope
from llm_quest_tpu.ops.attention import attention, merge_heads, split_heads
from llm_quest_tpu.ops.linear import embedding, init_embedding, init_linear, linear, tied_head
from llm_quest_tpu.ops.masks import causal_mask
from llm_quest_tpu.ops.mlp import init_swiglu, swiglu
from llm_quest_tpu.ops.norms import init_rms_norm, rms_norm


def head_dim(cfg):
    return cfg.get("head_dim", cfg["emb_dim"] // cfg["n_heads"])


def init_attention(key, cfg, dtype):
    d = cfg["emb_dim"]
    hd = head_dim(cfg)
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "wq": init_linear(kq, d, cfg["n_heads"] * hd, bias=False, dtype=dtype),
        "wk": init_linear(kk, d, cfg["num_kv_groups"] * hd, bias=False, dtype=dtype),
        "wv": init_linear(kv, d, cfg["num_kv_groups"] * hd, bias=False, dtype=dtype),
        "out_proj": init_linear(ko, cfg["n_heads"] * hd, d, bias=True, dtype=dtype),
    }


def init_block(key, cfg, dtype):
    ka, kf = jax.random.split(key)
    d = cfg["emb_dim"]
    return {
        "pre_att_norm": init_rms_norm(d, dtype=dtype),
        "att": init_attention(ka, cfg, dtype),
        "pre_ffn_norm": init_rms_norm(d, dtype=dtype),
        "ffn": init_swiglu(kf, d, cfg["hidden_dim"], dtype=dtype),
    }


def init(key, cfg):
    dtype = model_dtype(cfg)
    keys = jax.random.split(key, cfg["n_layers"] + 1)
    params = {
        "tok_emb": init_embedding(keys[0], cfg["vocab_size"], cfg["emb_dim"], dtype=dtype),
        "blocks": [init_block(keys[1 + i], cfg, dtype) for i in range(cfg["n_layers"])],
        "final_norm": init_rms_norm(cfg["emb_dim"], dtype=dtype),
        # out head tied to tok_emb (reference: llama_model.py:60-61) — no separate params
    }
    return params


def rope_tables(cfg, *, scaled=False):
    """(cos, sin) fp32 tables. scaled=True enables YaRN by-parts context
    extension from cfg["rope_freq"] (the reference skips scaling during
    pretraining, llama_model.py:49)."""
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


def _attention(params, cfg, x, mask, cos, sin, cache, layer_idx, position_ids, *, collect_max_logits=False, attn_mask=None):
    q = split_heads(linear(params["wq"], x), cfg["n_heads"])
    k = split_heads(linear(params["wk"], x), cfg["num_kv_groups"])
    v = split_heads(linear(params["wv"], x), cfg["num_kv_groups"])

    q = rope.apply(q, cos, sin, position_ids)
    k = rope.apply(k, cos, sin, position_ids)

    if cache is not None:
        cache, k, v = kvc.update_layer(cache, layer_idx, k, v)

    max_logits = None
    if collect_max_logits:
        # per-head max attention logit for QK-clip (reference hooks its
        # attention classes, common/qk_clip.py:274-279); no QK-norm here so
        # rescaling W_q/W_k actually caps the logits (unlike Qwen3, whose
        # QK-RMSNorm makes the clip a no-op — the reference's QKClip GQA
        # case is exactly this Llama-style attention)
        hd = head_dim(cfg)
        group = cfg["n_heads"] // cfg["num_kv_groups"]
        q_g = q.reshape(q.shape[0], cfg["num_kv_groups"], group, q.shape[2], hd)
        scores = jnp.einsum("bkgqd,bkld->bkgql", q_g, k) * hd**-0.5
        max_logits = jax.lax.stop_gradient(
            jnp.max(scores.reshape(q.shape[0], cfg["n_heads"], *scores.shape[-2:]), axis=(0, 2, 3))
        )

    out = merge_heads(attention(
        q, k, v, cfg=cfg, mask=mask, causal=True, attn_mask=attn_mask,
        flash_ok=cache is None,
    ))
    return linear(params["out_proj"], out), cache, max_logits


def apply(params, cfg, x, *, attn_mask=None, cache=None, position_ids=None, rope_cos_sin=None,
          collect_max_logits=False, **_):
    """Forward. x: (b, s) ids. Returns (logits, cache, aux); aux carries
    "max_attn_logits" (per-layer, per-head) when collect_max_logits."""
    b, s = x.shape
    cos, sin = rope_cos_sin if rope_cos_sin is not None else rope_tables(cfg)

    pos0 = cache["pos"] if cache is not None else 0
    if position_ids is None and cache is not None:
        position_ids = (pos0 + jnp.arange(s))[None, :] * jnp.ones((b, 1), jnp.int32)

    k_len = kvc.max_len(cache) if cache is not None else s
    # context parallelism skips the dense O(s²) mask; the attention router
    # streams causality through the ring-flash kernel (ops/attention.py)
    cp_active = cfg.get("context_parallel") is not None and cache is None and attn_mask is None
    mask = None if cp_active else causal_mask(s, k_len, q_start=pos0, attn_mask=attn_mask)

    h = embedding(params["tok_emb"], x)

    aux = {}
    for i, block in enumerate(params["blocks"]):
        residual = h
        hn = rms_norm(block["pre_att_norm"], h)
        att_out, cache, max_logits = _attention(
            block["att"], cfg, hn, mask, cos, sin, cache, i, position_ids,
            collect_max_logits=collect_max_logits, attn_mask=attn_mask,
        )
        if collect_max_logits:
            aux.setdefault("max_attn_logits", []).append(max_logits)
        h = residual + att_out

        residual = h
        h = residual + swiglu(block["ffn"], rms_norm(block["pre_ffn_norm"], h))

    h = rms_norm(params["final_norm"], h)
    if cache is not None:
        cache = kvc.advance(cache, s)

    logits = tied_head(params["tok_emb"], h)  # tied output head
    return logits, cache, aux
