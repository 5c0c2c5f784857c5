"""GPT-2 in functional JAX form.

Behavioral parity with the reference GPTModel (gpt/gpt_model.py:29-118,
gpt/gpt_attention.py:106-215, gpt/gpt_transformer_block.py:87-146):

- learned absolute positional embeddings with KV-cache position offset
- pre-LN blocks, erf-GELU FFN, (std+eps) LayerNorm
- ``input_embedded`` entry point for multimodal early fusion
- ``last_token_only`` gather of the final REAL token's logits
- padding mask combined with causal mask; finfo.min/2 fill

TPU redesign: the per-layer python loop is unrolled under jit; masks are fused
iota comparisons (no (ctx,ctx) buffers); the KV cache is a static-shape pytree
(inference/cache.py) returned as new state rather than mutated.
"""

import jax
import jax.numpy as jnp

from llm_quest_tpu.config import model_dtype
from llm_quest_tpu.inference import cache as kvc
from llm_quest_tpu.ops.attention import attention, merge_heads, split_heads
from llm_quest_tpu.ops.dropout import dropout
from llm_quest_tpu.ops.linear import embedding, init_embedding, init_linear, linear
from llm_quest_tpu.ops.masks import causal_mask
from llm_quest_tpu.ops.mlp import init_mlp_gelu, mlp_gelu
from llm_quest_tpu.ops.norms import init_layer_norm, layer_norm


def init_attention(key, cfg, dtype):
    d = cfg["emb_dim"]
    kq, kk, kv, ko = jax.random.split(key, 4)
    qkv_bias = cfg["qkv_bias"]
    return {
        "wq": init_linear(kq, d, d, bias=qkv_bias, dtype=dtype),
        "wk": init_linear(kk, d, d, bias=qkv_bias, dtype=dtype),
        "wv": init_linear(kv, d, d, bias=qkv_bias, dtype=dtype),
        "out_proj": init_linear(ko, d, d, bias=True, dtype=dtype),
    }


def init_block(key, cfg, dtype):
    ka, kf = jax.random.split(key)
    d = cfg["emb_dim"]
    return {
        "ln_1": init_layer_norm(d, dtype=dtype),
        "att": init_attention(ka, cfg, dtype),
        "ln_2": init_layer_norm(d, dtype=dtype),
        "ffn": init_mlp_gelu(kf, d, 4 * d, bias=True, dtype=dtype),
    }


def init(key, cfg):
    dtype = model_dtype(cfg)
    keys = jax.random.split(key, cfg["n_layers"] + 3)
    return {
        "tok_emb": init_embedding(keys[0], cfg["vocab_size"], cfg["emb_dim"], dtype=dtype),
        "pos_emb": init_embedding(keys[1], cfg["context_length"], cfg["emb_dim"], dtype=dtype),
        "blocks": [init_block(keys[2 + i], cfg, dtype) for i in range(cfg["n_layers"])],
        "final_ln": init_layer_norm(cfg["emb_dim"], dtype=dtype),
        "out": init_linear(keys[-1], cfg["emb_dim"], cfg["vocab_size"], bias=False, dtype=dtype),
    }


def init_cache(cfg, batch, max_len, *, dtype=None):
    head_dim = cfg["emb_dim"] // cfg["n_heads"]
    return kvc.init_kv_cache(
        cfg["n_layers"], batch, cfg["n_heads"], max_len, head_dim,
        dtype=dtype or model_dtype(cfg), quant=cfg.get("kv_quant"),
    )


def _attention(params, cfg, x, mask, cache, layer_idx, rng, deterministic, attn_mask=None):
    n_heads = cfg["n_heads"]
    q = split_heads(linear(params["wq"], x), n_heads)
    k = split_heads(linear(params["wk"], x), n_heads)
    v = split_heads(linear(params["wv"], x), n_heads)

    if cache is not None:
        cache, k, v = kvc.update_layer(cache, layer_idx, k, v)

    out = attention(
        q, k, v, cfg=cfg, mask=mask, causal=True, attn_mask=attn_mask,
        flash_ok=cache is None,
    )
    out = merge_heads(out)
    out = linear(params["out_proj"], out)
    return out, cache


def _pipeline_blocks(params, cfg, pp, h):
    """GPipe pipeline-parallel block stack (cfg["pipeline_parallel"] =
    {"mesh", "axis", "n_microbatches"}): blocks stacked (n_stages,
    layers_per_stage, ...) over the stage axis, microbatches streamed via
    ppermute (parallel/pipeline.py). Differentiable — the same path serves
    training (dryrun step (j) asserts loss parity vs the sequential stack).

    Reference: single-device `for block in self.trf_blocks`
    (gpt_model.py:101-102); PP is the net-new TPU axis SURVEY §2.1 lists
    for when the layer stack exceeds one chip's HBM."""
    from llm_quest_tpu.parallel.pipeline import pipeline_apply, stack_stages

    mesh, axis = pp["mesh"], pp.get("axis", "model")
    n_stages = mesh.shape[axis]
    s = h.shape[1]

    def block_fn(bp, hh):
        # mask depends only on static shapes here (attn_mask is rejected on
        # the PP path) — recompute per block instead of capturing a traced
        # array inside shard_map
        mask = causal_mask(s, s)
        hn = layer_norm(bp["ln_1"], hh)
        att_out, _ = _attention(bp["att"], cfg, hn, mask, None, 0, None, True)
        hh = hh + att_out
        hn = layer_norm(bp["ln_2"], hh)
        return hh + mlp_gelu(bp["ffn"], hn)

    stacked = stack_stages(params["blocks"], n_stages)
    return pipeline_apply(
        mesh, axis, block_fn, stacked, h,
        n_microbatches=pp.get("n_microbatches", n_stages),
    )


def apply(
    params,
    cfg,
    x,
    *,
    attn_mask=None,
    cache=None,
    last_token_only=False,
    input_embedded=False,
    position_ids=None,
    deterministic=True,
    rng=None,
    output_hidden_states=False,
    **_,
):
    """Forward pass. x: (b, s) token ids, or (b, s, emb_dim) if input_embedded.

    attn_mask: (b, s) bool True=real token (or (b, cache_max_len) when a cache
    is active). Returns (logits, cache, aux) — cache is None if none was
    passed; aux is an (empty) dict kept uniform across models so generic
    engines can read auxiliary losses (MoE etc.).
    """
    b, s = x.shape[:2]
    drop = cfg.get("drop_rate", 0.0)
    rngs = jax.random.split(rng, 2 + 2 * cfg["n_layers"]) if rng is not None else None

    pos0 = cache["pos"] if cache is not None else 0
    if not input_embedded:
        h = embedding(params["tok_emb"], x)
        if position_ids is None:
            position_ids = (pos0 + jnp.arange(s))[None, :]
        h = h + embedding(params["pos_emb"], position_ids)
    else:
        h = x

    h = dropout(rngs[0] if rngs is not None else None, h, drop, deterministic)

    k_len = kvc.max_len(cache) if cache is not None else s
    mask = causal_mask(s, k_len, q_start=pos0, attn_mask=attn_mask)

    pp = cfg.get("pipeline_parallel")
    if pp is not None:
        assert cache is None and attn_mask is None and drop == 0.0, (
            "pipeline_parallel supports the full-sequence training/eval "
            "forward (no cache, no padding mask, no dropout)")
        h = _pipeline_blocks(params, cfg, pp, h)
        h = layer_norm(params["final_ln"], h)
        return linear(params["out"], h), None, {}

    for i, block in enumerate(params["blocks"]):
        r_att = rngs[1 + 2 * i] if rngs is not None else None
        r_ffn = rngs[2 + 2 * i] if rngs is not None else None

        residual = h
        hn = layer_norm(block["ln_1"], h)
        att_out, cache = _attention(
            block["att"], cfg, hn, mask, cache, i, r_att, deterministic, attn_mask
        )
        h = residual + dropout(r_att, att_out, drop, deterministic)

        residual = h
        hn = layer_norm(block["ln_2"], h)
        h = residual + dropout(r_ffn, mlp_gelu(block["ffn"], hn), drop, deterministic)

    h = layer_norm(params["final_ln"], h)

    if cache is not None:
        cache = kvc.advance(cache, s)

    if output_hidden_states:
        return h, cache, {}

    if last_token_only:
        assert attn_mask is not None, "attn_mask is needed for last_token_only=True"
        seq_lengths = jnp.sum(attn_mask.astype(jnp.int32), axis=-1)
        h_last = h[jnp.arange(b), seq_lengths - 1, :]  # (b, emb_dim)
        logits = linear(params["out"], h_last)
    else:
        logits = linear(params["out"], h)

    return logits, cache, {}


def head_weights(params, cfg):
    """(d, vocab) output-head matrix — for the fused-CE training path
    (training/engine.py::make_train_step(fused_head_ce=True)). GPT-2's head
    is bias-free (init: `bias=False`), so the fused path is exact."""
    return params["out"]["w"]
