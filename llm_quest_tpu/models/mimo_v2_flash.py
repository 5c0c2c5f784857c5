"""Xiaomi MiMo-V2-Flash: SWA+sink hybrid with MoE and shrinking-slice MTP.

Behavioral parity with the reference (xiaomi/):

- GroupedQueryAttentionWithSink (mimo_v2_flash_attention.py:16-132):
  decoupled value_head_dim, QK-RMSNorm (fp32 parity) BEFORE partial RoPE
  (0.33), learnable per-head attention sink appended pre-softmax then dropped
  — SWA layers only; SWA = O(L²) masked attention (naive variant).
- layout (mimo_v2_flash_model.py:52-124): layer 0 = GA + dense SwiGLU FFN;
  layers 1+ = MoE (DeepSeekMoE with 0 shared experts), SWA unless
  (i+1) % hybrid_ratio == 0 → GA; different KV group counts for SWA vs GA;
  DUAL RoPE tables (rope_base for SWA, rope_base_ga for GA).
- MTP (mimo_v2_flash_model.py:10-49, 127-210): shrinking-slice logic — one
  (x, targets) pair sliced k:-1 per module instead of DSV3's pre-shifted
  collator; SWA + dense-FFN block; final norm before the shared head;
  loss = main + (coeff/depth)·Σ mtp.

TPU notes: decode uses a stacked KV cache padded to max(kv_groups) across
layer types (layers with fewer groups use the leading slice) so one cache
pytree + one sharding covers the hybrid stack.
"""

import jax
import jax.numpy as jnp
from jax import lax

from llm_quest_tpu.config import model_dtype
from llm_quest_tpu.inference import cache as kvc
from llm_quest_tpu.ops import moe as moe_ops
from llm_quest_tpu.ops import rope
from llm_quest_tpu.ops.attention import attention, merge_heads, split_heads
from llm_quest_tpu.ops.linear import embedding, init_embedding, init_linear, linear
from llm_quest_tpu.ops.losses import cross_entropy
from llm_quest_tpu.ops.masks import causal_mask
from llm_quest_tpu.ops.mlp import init_swiglu, swiglu
from llm_quest_tpu.ops.norms import init_rms_norm, rms_norm_torch_parity


def is_swa_layer(cfg, layer_idx):
    """Layer 0 is GA; otherwise SWA unless every hybrid_ratio-th layer
    (reference: mimo_v2_flash_model.py:68-76)."""
    if layer_idx == 0:
        return False
    return (layer_idx + 1) % cfg["hybrid_ratio"] != 0


def is_moe_layer(cfg, layer_idx):
    return layer_idx != 0


def init_attention(key, cfg, dtype, *, swa):
    d = cfg["emb_dim"]
    hd = cfg["head_dim"]
    vhd = cfg.get("value_head_dim") or hd
    groups = cfg["num_swa_kv_groups"] if swa else cfg["num_ga_kv_groups"]
    kq, kk, kv, ko, ksink = jax.random.split(key, 5)
    params = {
        "wq": init_linear(kq, d, cfg["n_heads"] * hd, bias=False, dtype=dtype),
        "wk": init_linear(kk, d, groups * hd, bias=False, dtype=dtype),
        "wv": init_linear(kv, d, groups * vhd, bias=False, dtype=dtype),
        "out_proj": init_linear(ko, cfg["n_heads"] * vhd, d, bias=False, dtype=dtype),
        "q_norm": init_rms_norm(hd, dtype=dtype),
        "k_norm": init_rms_norm(hd, dtype=dtype),
    }
    if swa:
        params["sink"] = 0.02 * jax.random.normal(ksink, (cfg["n_heads"],), dtype)
    return params


def init_block(key, cfg, dtype, layer_idx, *, swa=None, moe=None):
    swa = is_swa_layer(cfg, layer_idx) if swa is None else swa
    moe = is_moe_layer(cfg, layer_idx) if moe is None else moe
    ka, kf = jax.random.split(key)
    d = cfg["emb_dim"]
    block = {
        "norm1": init_rms_norm(d, dtype=dtype),
        "att": init_attention(ka, cfg, dtype, swa=swa),
        "norm2": init_rms_norm(d, dtype=dtype),
    }
    if moe:
        block["moe"] = moe_ops.init_deepseek_moe(kf, cfg, dtype=dtype)
    else:
        block["ffn"] = init_swiglu(kf, d, cfg["hidden_dim"], dtype=dtype)
    return block


def init_mtp_module(key, cfg, dtype):
    k1, k2 = jax.random.split(key)
    d = cfg["emb_dim"]
    return {
        "rms_input": init_rms_norm(d, dtype=dtype),
        "rms_h_prev": init_rms_norm(d, dtype=dtype),
        "final_norm": init_rms_norm(d, dtype=dtype),
        "down_proj": init_linear(k1, 2 * d, d, bias=False, dtype=dtype),
        "trf_block": init_block(k2, cfg, dtype, layer_idx=0, swa=True, moe=False),
    }


def init(key, cfg):
    dtype = model_dtype(cfg)
    depth = cfg.get("mtp_depth", 0)
    keys = jax.random.split(key, cfg["n_layers"] + depth + 2)
    return {
        "tok_emb": init_embedding(keys[0], cfg["vocab_size"], cfg["emb_dim"], dtype=dtype),
        "blocks": [init_block(keys[1 + i], cfg, dtype, layer_idx=i) for i in range(cfg["n_layers"])],
        "final_norm": init_rms_norm(cfg["emb_dim"], dtype=dtype),
        "out": init_linear(keys[cfg["n_layers"] + 1], cfg["emb_dim"], cfg["vocab_size"], bias=False, dtype=dtype),
        "mtp": [init_mtp_module(keys[cfg["n_layers"] + 2 + k], cfg, dtype) for k in range(depth)],
    }


def rope_tables(cfg):
    """Dual tables: (cos_swa, sin_swa), (cos_ga, sin_ga)."""
    swa = rope.compute_angles(
        cfg.get("rope_base", 10_000), cfg["head_dim"], cfg["context_length"],
        rotation_factor=cfg["partial_rope_factor"],
    )
    ga = rope.compute_angles(
        cfg.get("rope_base_ga", 640_000), cfg["head_dim"], cfg["context_length"],
        rotation_factor=cfg["partial_rope_factor"],
    )
    return swa, ga


def init_cache(cfg, batch, max_len, *, dtype=None):
    dtype = dtype or model_dtype(cfg)
    groups = max(cfg["num_swa_kv_groups"], cfg["num_ga_kv_groups"])
    vhd = cfg.get("value_head_dim") or cfg["head_dim"]
    return {
        "k": jnp.zeros((cfg["n_layers"], batch, groups, max_len, cfg["head_dim"]), dtype),
        "v": jnp.zeros((cfg["n_layers"], batch, groups, max_len, vhd), dtype),
        "pos": jnp.zeros((), jnp.int32),
    }


def _attention(params, cfg, x, mask, cos, sin, cache, layer_idx, position_ids, *, swa, attn_mask=None):
    groups = cfg["num_swa_kv_groups"] if swa else cfg["num_ga_kv_groups"]
    q = split_heads(linear(params["wq"], x), cfg["n_heads"])
    k = split_heads(linear(params["wk"], x), groups)
    v = split_heads(linear(params["wv"], x), groups)

    q = rope.apply(rms_norm_torch_parity(params["q_norm"], q), cos, sin, position_ids)
    k = rope.apply(rms_norm_torch_parity(params["k_norm"], k), cos, sin, position_ids)

    if cache is not None:
        # kvc.write_kv handles both scalar pos (batched decode) and (b,)
        # vector pos (continuous-batching serving pool), writing only this
        # layer type's `groups` head rows of the shared max-groups buffer
        pos = cache["pos"]
        kc = kvc.write_kv(cache["k"], k, layer_idx, pos)
        vc = kvc.write_kv(cache["v"], v, layer_idx, pos)
        cache = {**cache, "k": kc, "v": vc}
        k, v = kc[layer_idx, :, :groups], vc[layer_idx, :, :groups]

    out = merge_heads(attention(
        q, k, v, cfg=cfg, mask=mask, sink=params.get("sink"), causal=True,
        window_size=cfg["window_size"] if swa else None,
        attn_mask=attn_mask, flash_ok=cache is None,
    ))
    return linear(params["out_proj"], out), cache


def _block(block, cfg, h, mask, cos, sin, cache, layer_idx, position_ids, *, swa, attn_mask=None):
    residual = h
    hn = rms_norm_torch_parity(block["norm1"], h)
    att_out, cache = _attention(
        block["att"], cfg, hn, mask, cos, sin, cache, layer_idx, position_ids,
        swa=swa, attn_mask=attn_mask,
    )
    h = residual + att_out

    residual = h
    hn = rms_norm_torch_parity(block["norm2"], h)
    aux = {}
    if "moe" in block:
        ep = cfg.get("expert_parallel")
        if ep is not None:
            # explicit EP token dispatch (parallel/expert_parallel.py) —
            # MiMo's all-MoE layers share DeepSeek's shared+routed+bias form
            from llm_quest_tpu.parallel.expert_parallel import ep_deepseek_moe

            ffn_out, aux = ep_deepseek_moe(
                ep["mesh"], block["moe"], hn, top_k=cfg["top_k"],
                capacity_factor=ep.get("capacity_factor"),
                ep_axis=ep.get("ep_axis", "model"),
                data_axis=ep.get("data_axis", "data"),
            )
        else:
            ffn_out, aux = moe_ops.deepseek_moe(block["moe"], hn, top_k=cfg["top_k"])
    else:
        ffn_out = swiglu(block["ffn"], hn)
    return residual + ffn_out, cache, aux


def apply(params, cfg, x, *, attn_mask=None, cache=None, position_ids=None, **_):
    """Main-model forward. Returns (logits, cache, aux) with aux["hidden"],
    aux["moe_counts"]."""
    b, s = x.shape
    (cos_swa, sin_swa), (cos_ga, sin_ga) = rope_tables(cfg)

    pos0 = cache["pos"] if cache is not None else 0
    if position_ids is None and cache is not None:
        position_ids = (pos0 + jnp.arange(s))[None, :] * jnp.ones((b, 1), jnp.int32)

    k_len = cache["k"].shape[3] if cache is not None else s
    mask_ga = causal_mask(s, k_len, q_start=pos0, attn_mask=attn_mask)
    mask_swa = causal_mask(s, k_len, q_start=pos0, window_size=cfg["window_size"], attn_mask=attn_mask)

    h = embedding(params["tok_emb"], x)
    counts = []
    for i, block in enumerate(params["blocks"]):
        swa = is_swa_layer(cfg, i)
        mask, cos, sin = (mask_swa, cos_swa, sin_swa) if swa else (mask_ga, cos_ga, sin_ga)
        h, cache, aux_i = _block(
            block, cfg, h, mask, cos, sin, cache, i, position_ids, swa=swa, attn_mask=attn_mask
        )
        if "counts" in aux_i:
            counts.append(aux_i["counts"])

    if cache is not None:
        cache = {**cache, "pos": cache["pos"] + s}

    logits = linear(params["out"], rms_norm_torch_parity(params["final_norm"], h))
    return logits, cache, {"hidden": h, "moe_counts": counts}


def loss(params, cfg, x, targets, *, training=True):
    """main CE + (coeff/depth)·Σ MTP CE with SHRINKING slices
    (reference: mimo_v2_flash_model.py:143-210). targets: (b, s) already
    1-shifted. Returns (loss, aux)."""
    logits, _, aux = apply(params, cfg, x)
    main_loss = cross_entropy(logits.reshape(-1, logits.shape[-1]), targets.reshape(-1))

    depth = cfg.get("mtp_depth", 0)
    if not training or depth == 0:
        return main_loss, aux

    (cos_swa, sin_swa), _ = rope_tables(cfg)
    x_embeds = embedding(params["tok_emb"], x)

    h_prev = aux["hidden"]
    mtp_total = 0.0
    for i, mtp in enumerate(params["mtp"]):
        k = i + 1
        mtp_slice = x_embeds[:, k:-1]  # (b, s-k-1, d)
        mtp_target = x[:, k + 1 :]
        h_slice = h_prev[:, :-2] if k == 1 else h_prev[:, :-1]
        s_k = h_slice.shape[1]
        if s_k == 0:
            break

        xn = rms_norm_torch_parity(mtp["rms_input"], mtp_slice)
        hn = rms_norm_torch_parity(mtp["rms_h_prev"], h_slice)
        combined = linear(mtp["down_proj"], jnp.concatenate([xn, hn], axis=-1))

        mask = causal_mask(s_k, s_k, window_size=cfg["window_size"])
        h_curr, _, _ = _block(
            mtp["trf_block"], cfg, combined, mask, cos_swa, sin_swa, None, 0, None, swa=True
        )
        mtp_logits = linear(params["out"], rms_norm_torch_parity(mtp["final_norm"], h_curr))
        mtp_total = mtp_total + cross_entropy(mtp_logits.reshape(-1, mtp_logits.shape[-1]), mtp_target.reshape(-1))
        h_prev = h_curr

    return main_loss + (cfg["mtp_loss_coeff"] / depth) * mtp_total, aux


def update_moe_biases(params, cfg, moe_counts):
    """Fold aux-loss-free bias updates into the MoE blocks (non-gradient)."""
    rate = cfg["moe_bias_update_rate"]
    new_blocks = []
    it = iter(moe_counts)
    for block in params["blocks"]:
        if "moe" in block:
            c = next(it)
            moe = dict(block["moe"], biases=moe_ops.aux_free_bias_update(block["moe"]["biases"], c, rate))
            block = dict(block, moe=moe)
        new_blocks.append(block)
    return dict(params, blocks=new_blocks)
