"""Qwen3 dense + MoE models in functional JAX form.

Behavioral parity with the reference (qwen/qwen3/qwen3_model.py:10-179,
qwen3_attention.py:8-150, qwen3_transformer_block.py:56-153):

- GQA with QK-RMSNorm applied BEFORE RoPE (Qwen3 training order), full-fp32
  RMSNorm cast (HF parity — reference: qwen3_attention.py:9-29)
- head_dim decoupled from emb_dim (d_out = n_heads·head_dim, out_proj back to
  emb_dim, all projections bias-free)
- tied output head: tied weights re-initialized Xavier-uniform for
  pretraining (reference: qwen3_model.py:36-45 — the tie makes the embedding
  share the Xavier init)
- gradient checkpointing via jax.checkpoint per block
- MoE variant: Qwen3MoE FFN with gate/routing replay in/out
  (reference: qwen3_model.py:97-179)
"""

import jax
import jax.numpy as jnp

from llm_quest_tpu.config import model_dtype
from llm_quest_tpu.inference import cache as kvc
from llm_quest_tpu.ops import moe as moe_ops
from llm_quest_tpu.ops import rope
from llm_quest_tpu.ops.attention import attention, merge_heads, split_heads
from llm_quest_tpu.ops.linear import embedding, init_embedding, init_linear, linear, tied_head
from llm_quest_tpu.ops.masks import causal_mask
from llm_quest_tpu.ops.mlp import init_swiglu, swiglu
from llm_quest_tpu.ops.norms import init_rms_norm, rms_norm_torch_parity
from llm_quest_tpu.ops.remat import checkpoint_block


def init_attention(key, cfg, dtype):
    d = cfg["emb_dim"]
    hd = cfg["head_dim"]
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "wq": init_linear(kq, d, cfg["n_heads"] * hd, bias=False, dtype=dtype),
        "wk": init_linear(kk, d, cfg["num_kv_groups"] * hd, bias=False, dtype=dtype),
        "wv": init_linear(kv, d, cfg["num_kv_groups"] * hd, bias=False, dtype=dtype),
        "out_proj": init_linear(ko, cfg["n_heads"] * hd, d, bias=False, dtype=dtype),
        "q_norm": init_rms_norm(hd, dtype=dtype),
        "k_norm": init_rms_norm(hd, dtype=dtype),
    }


def init_block(key, cfg, dtype, *, is_moe):
    ka, kf = jax.random.split(key)
    d = cfg["emb_dim"]
    block = {
        "pre_att_norm": init_rms_norm(d, dtype=dtype),
        "att": init_attention(ka, cfg, dtype),
        "pre_ffn_norm": init_rms_norm(d, dtype=dtype),
    }
    if is_moe:
        block["moe"] = moe_ops.init_qwen3_moe(kf, cfg, dtype=dtype)
    else:
        block["ffn"] = init_swiglu(kf, d, cfg["hidden_dim"], dtype=dtype)
    return block


def init(key, cfg):
    dtype = model_dtype(cfg)
    is_moe = cfg.get("model_type", "dense") == "moe"
    keys = jax.random.split(key, cfg["n_layers"] + 2)
    if cfg["tie_embeddings"]:
        # tied head shares the table; Xavier re-init replaces the N(0,1)
        # embedding init (reference: qwen3_model.py:42-45)
        bound = (6.0 / (cfg["vocab_size"] + cfg["emb_dim"])) ** 0.5
        tok_emb = {"w": jax.random.uniform(keys[0], (cfg["vocab_size"], cfg["emb_dim"]), dtype, -bound, bound)}
    else:
        tok_emb = init_embedding(keys[0], cfg["vocab_size"], cfg["emb_dim"], dtype=dtype)
    params = {
        "tok_emb": tok_emb,
        "blocks": [init_block(keys[1 + i], cfg, dtype, is_moe=is_moe) for i in range(cfg["n_layers"])],
        "final_norm": init_rms_norm(cfg["emb_dim"], dtype=dtype),
    }
    if not cfg["tie_embeddings"]:
        params["out"] = init_linear(keys[-1], cfg["emb_dim"], cfg["vocab_size"], bias=False, dtype=dtype)
    return params


def rope_tables(cfg):
    return rope.compute_angles(cfg["rope_base"], cfg["head_dim"], cfg["context_length"])


def init_cache(cfg, batch, max_len, *, dtype=None):
    return kvc.init_kv_cache(
        cfg["n_layers"], batch, cfg["num_kv_groups"], max_len, cfg["head_dim"],
        dtype=dtype or model_dtype(cfg), quant=cfg.get("kv_quant"),
    )


def _attention(params, cfg, x, mask, cos, sin, cache, layer_idx, position_ids, attn_mask=None,
               q_start=None):
    q = split_heads(linear(params["wq"], x), cfg["n_heads"])
    k = split_heads(linear(params["wk"], x), cfg["num_kv_groups"])
    v = split_heads(linear(params["wv"], x), cfg["num_kv_groups"])

    # QK-norm BEFORE RoPE (reference: qwen3_attention.py:108-115)
    q = rope.apply(rms_norm_torch_parity(params["q_norm"], q), cos, sin, position_ids)
    k = rope.apply(rms_norm_torch_parity(params["k_norm"], k), cos, sin, position_ids)

    if cache is not None:
        cache, k, v = kvc.update_layer(cache, layer_idx, k, v)

    # flash covers uncached full-sequence calls AND cached PREFILL (sq < sk
    # against the max_len cache view) when the query offset is static —
    # long-prompt TTFT streams KV instead of materializing (s, max_len) scores
    out = merge_heads(attention(
        q, k, v, cfg=cfg, mask=mask, causal=True, attn_mask=attn_mask,
        flash_ok=cache is None or q_start is not None, q_start=q_start,
    ))
    return linear(params["out_proj"], out), cache


def apply(
    params,
    cfg,
    x,
    *,
    attn_mask=None,
    cache=None,
    position_ids=None,
    gate_probas=None,
    training=False,
    output_hidden_states=False,
    **_,
):
    """Forward. x: (b, s) ids. Returns (logits, cache, aux).

    aux: "moe_loss" (MoE variant, training) summed over layers;
    "gate_probas" list per MoE layer (routing replay capture). gate_probas
    arg: list per layer (or single array broadcast) to REPLAY routing.
    """
    b, s = x.shape
    is_moe = cfg.get("model_type", "dense") == "moe"
    cos, sin = rope_tables(cfg)

    pos0 = cache["pos"] if cache is not None else 0
    if position_ids is None and cache is not None:
        position_ids = (pos0 + jnp.arange(s))[None, :] * jnp.ones((b, 1), jnp.int32)

    # static query offset for cached prefill (s > 1): concrete at trace time
    # for a fresh cache (pos created inside the jit), a Tracer inside the
    # decode scan — where flash doesn't apply anyway (s == 1)
    q_start_static = None
    if cache is not None and s > 1:
        try:
            q_start_static = int(pos0)
        except (TypeError, jax.errors.TracerIntegerConversionError, jax.errors.ConcretizationTypeError):
            q_start_static = None

    k_len = kvc.max_len(cache) if cache is not None else s
    # under context parallelism the dense (s, s) mask is exactly the O(s²)
    # object CP exists to avoid — the attention router streams causality
    # through the ring-flash kernel instead (ops/attention.py)
    cp_active = cfg.get("context_parallel") is not None and cache is None and attn_mask is None
    mask = None if cp_active else causal_mask(s, k_len, q_start=pos0, attn_mask=attn_mask)

    h = embedding(params["tok_emb"], x)

    use_ckpt = cfg.get("gradient_checkpointing", False) and training and cache is None
    aux = {"gate_probas": []} if is_moe else {}
    moe_loss = 0.0

    for i, block in enumerate(params["blocks"]):
        layer_gate_probas = None
        if gate_probas is not None:
            layer_gate_probas = gate_probas[i] if isinstance(gate_probas, (list, tuple)) else gate_probas

        def block_fn(block, h, cache):
            residual = h
            hn = rms_norm_torch_parity(block["pre_att_norm"], h)
            att_out, cache = _attention(
                block["att"], cfg, hn, mask, cos, sin, cache, i, position_ids, attn_mask,
                q_start=q_start_static,
            )
            h = residual + att_out

            residual = h
            hn = rms_norm_torch_parity(block["pre_ffn_norm"], h)
            if is_moe:
                ep = cfg.get("expert_parallel")
                if ep is not None and layer_gate_probas is None:
                    # explicit EP: all-to-all token dispatch over the mesh
                    # (parallel/expert_parallel.py); routing replay stays on
                    # the dense path (replayed probas are token-global)
                    from llm_quest_tpu.parallel.expert_parallel import ep_qwen3_moe

                    ffn_out, moe_aux = ep_qwen3_moe(
                        ep["mesh"],
                        block["moe"],
                        hn,
                        top_k=cfg["top_k"],
                        load_coeff=cfg["aux_loss_coef"],
                        capacity_factor=ep.get("capacity_factor"),
                        ep_axis=ep.get("ep_axis", "model"),
                        data_axis=ep.get("data_axis", "data"),
                        training=training,
                        pin_output=ep.get("pin_output", False),
                    )
                else:
                    ffn_out, moe_aux = moe_ops.qwen3_moe(
                        block["moe"],
                        hn,
                        top_k=cfg["top_k"],
                        load_coeff=cfg["aux_loss_coef"],
                        gate_probas=layer_gate_probas,
                        training=training,
                    )
            else:
                ffn_out, moe_aux = swiglu(block["ffn"], hn), {}
            h = residual + ffn_out
            return h, cache, moe_aux

        fn = checkpoint_block(cfg, block_fn) if use_ckpt else block_fn
        h, cache, moe_aux = fn(block, h, cache)
        if is_moe:
            aux["gate_probas"].append(moe_aux["gate_probas"])
            if "moe_loss" in moe_aux:
                moe_loss = moe_loss + moe_aux["moe_loss"]

    if is_moe and training:
        aux["moe_loss"] = moe_loss

    h = rms_norm_torch_parity(params["final_norm"], h)
    if cache is not None:
        cache = kvc.advance(cache, s)

    if output_hidden_states:
        return h, cache, aux
    if cfg["tie_embeddings"]:
        logits = tied_head(params["tok_emb"], h)
    else:
        logits = linear(params["out"], h)
    return logits, cache, aux


def head_weights(params, cfg):
    """(d, vocab) output-head matrix — for the fused-CE training path."""
    if cfg["tie_embeddings"]:
        return params["tok_emb"]["w"].T
    return params["out"]["w"]
