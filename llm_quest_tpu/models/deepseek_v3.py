"""DeepSeek-V3 in functional JAX form: MLA + MTP + DeepSeekMoE.

Behavioral parity with the reference (llama3_to_deepseekv3/):

- MultiLatentAttention (deepseek_attention.py:9-110): q/kv down-up latent
  projections (q_rank=1536 default, kv_rank=4·head_dim), latent RMSNorms,
  decoupled RoPE halves (decoup_head_dim = head_dim/2; k-decoup projected
  from x and broadcast across heads), scaling by (head_dim+decoup)^-0.5,
  biases on all projections (torch nn.Linear defaults).
- Blocks (deepseek_transformer_block.py:110-155): first num_ffn layers dense
  SwiGLU, rest DeepSeekMoE (aux-loss-free bias balancing).
- MTP modules (deepseek_model.py:12-138): share embedding + output head with
  the main model, combine RMSNorm'd (embedded shifted input ‖ previous hidden
  state) through a 2d→d down-proj and one FFN transformer block; total loss =
  main + (coeff/depth)·Σ mtp_k.
  NOTE a deliberate divergence: the reference computes MTP logits from the
  down-projected INPUT (deepseek_model.py:47, `self.out_layer(x)`), not the
  block output — we follow the DeepSeek-V3 paper and use the block output
  h_curr, which is what makes the MTP losses train the MTP blocks.

TPU notes: the non-gradient MoE bias state is returned in aux["moe_counts"];
fold with update_moe_biases after the optimizer step. KV cache stores the
concatenated (roped-decoupled ‖ latent-up) keys so decode is cache-native
even though the reference's MLA has no cache path.
"""

import jax
import jax.numpy as jnp

from llm_quest_tpu.config import model_dtype
from llm_quest_tpu.inference import cache as kvc
from llm_quest_tpu.ops import moe as moe_ops
from llm_quest_tpu.ops import rope
from llm_quest_tpu.ops.attention import attention, merge_heads, split_heads
from llm_quest_tpu.ops.linear import embedding, init_embedding, init_linear, linear
from llm_quest_tpu.ops.losses import cross_entropy
from llm_quest_tpu.ops.masks import causal_mask
from llm_quest_tpu.ops.mlp import init_swiglu, swiglu
from llm_quest_tpu.ops.norms import init_rms_norm, rms_norm


def head_dims(cfg):
    hd = cfg["emb_dim"] // cfg["n_heads"]
    return hd, hd // 2  # (head_dim, decoup_head_dim)


def q_rank(cfg):
    # reference hardcodes 1536 (deepseek_attention.py:38); scale down for
    # small models via cfg override
    return cfg.get("q_rank", min(1536, 2 * cfg["emb_dim"]))


def init_mla(key, cfg, dtype):
    d = cfg["emb_dim"]
    hd, dhd = head_dims(cfg)
    qr = q_rank(cfg)
    kvr = 4 * hd
    ks = jax.random.split(key, 8)
    return {
        "wq_down": init_linear(ks[0], d, qr, bias=True, dtype=dtype),
        "wq_up": init_linear(ks[1], qr, d, bias=True, dtype=dtype),
        "wq_decoup": init_linear(ks[2], qr, cfg["n_heads"] * dhd, bias=True, dtype=dtype),
        "wkv_down": init_linear(ks[3], d, kvr, bias=True, dtype=dtype),
        "wk_up": init_linear(ks[4], kvr, d, bias=True, dtype=dtype),
        "wv_up": init_linear(ks[5], kvr, d, bias=True, dtype=dtype),
        "wk_decoup": init_linear(ks[6], d, dhd, bias=True, dtype=dtype),
        "out_proj": init_linear(ks[7], d, d, bias=True, dtype=dtype),
        "q_norm": init_rms_norm(qr, dtype=dtype),
        "kv_norm": init_rms_norm(kvr, dtype=dtype),
    }


def init_block(key, cfg, dtype, layer):
    ka, kf = jax.random.split(key)
    d = cfg["emb_dim"]
    block = {
        "norm_1": init_rms_norm(d, dtype=dtype),
        "att": init_mla(ka, cfg, dtype),
        "norm_2": init_rms_norm(d, dtype=dtype),
    }
    if layer < cfg["num_ffn"]:
        block["ffn"] = init_swiglu(kf, d, cfg["hidden_dim"], dtype=dtype)
    else:
        block["moe"] = moe_ops.init_deepseek_moe(kf, cfg, dtype=dtype)
    return block


def init_mtp_module(key, cfg, dtype):
    k1, k2 = jax.random.split(key)
    d = cfg["emb_dim"]
    return {
        "rms_input": init_rms_norm(d, dtype=dtype),
        "rms_h_prev": init_rms_norm(d, dtype=dtype),
        "down_proj": init_linear(k1, 2 * d, d, bias=True, dtype=dtype),
        "trf_block": init_block(k2, cfg, dtype, layer=0),  # layer 0 → dense FFN
    }


def init(key, cfg):
    dtype = model_dtype(cfg)
    depth = cfg["mtp_depth"]
    keys = jax.random.split(key, cfg["n_layers"] + depth + 2)
    return {
        "tok_emb": init_embedding(keys[0], cfg["vocab_size"], cfg["emb_dim"], dtype=dtype),
        "blocks": [init_block(keys[1 + i], cfg, dtype, layer=i) for i in range(cfg["n_layers"])],
        "final_norm": init_rms_norm(cfg["emb_dim"], dtype=dtype),
        "out": init_linear(keys[cfg["n_layers"] + 1], cfg["emb_dim"], cfg["vocab_size"], bias=False, dtype=dtype),
        "mtp": [init_mtp_module(keys[cfg["n_layers"] + 2 + k], cfg, dtype) for k in range(depth)],
    }


def rope_tables(cfg):
    _, dhd = head_dims(cfg)
    return rope.compute_angles(cfg["rope_base"], dhd, cfg["context_length"])


def init_cache(cfg, batch, max_len, *, dtype=None):
    hd, dhd = head_dims(cfg)
    return kvc.init_kv_cache(
        cfg["n_layers"], batch, cfg["n_heads"], max_len, hd + dhd, v_head_dim=hd,
        dtype=dtype or model_dtype(cfg), quant=cfg.get("kv_quant"),
    )


def _mla(params, cfg, x, mask, cos, sin, cache, layer_idx, position_ids, attn_mask=None):
    """Multi-Latent Attention (reference: deepseek_attention.py:57-110)."""
    n_heads = cfg["n_heads"]
    hd, dhd = head_dims(cfg)

    q_latent = rms_norm(params["q_norm"], linear(params["wq_down"], x))
    kv_latent = rms_norm(params["kv_norm"], linear(params["wkv_down"], x))

    q = split_heads(linear(params["wq_up"], q_latent), n_heads)  # (b, h, s, hd)
    k = split_heads(linear(params["wk_up"], kv_latent), n_heads)
    v = split_heads(linear(params["wv_up"], kv_latent), n_heads)

    q_dec = split_heads(linear(params["wq_decoup"], q_latent), n_heads)  # (b, h, s, dhd)
    k_dec = linear(params["wk_decoup"], x)[:, None, :, :]  # (b, 1, s, dhd) shared across heads
    k_dec = jnp.broadcast_to(k_dec, (x.shape[0], n_heads, x.shape[1], dhd))

    q_dec = rope.apply(q_dec, cos, sin, position_ids)
    k_dec = rope.apply(k_dec, cos, sin, position_ids)

    q = jnp.concatenate([q, q_dec], axis=-1)
    k = jnp.concatenate([k, k_dec], axis=-1)

    if cache is not None:
        cache, k, v = kvc.update_layer(cache, layer_idx, k, v)

    out = attention(
        q, k, v, cfg=cfg, mask=mask, causal=True, scale=(hd + dhd) ** -0.5,
        attn_mask=attn_mask, flash_ok=cache is None,
    )
    out = merge_heads(out)
    return linear(params["out_proj"], out), cache


def _block(block, cfg, h, mask, cos, sin, cache, layer_idx, position_ids, attn_mask=None):
    residual = h
    hn = rms_norm(block["norm_1"], h)
    att_out, cache = _mla(
        block["att"], cfg, hn, mask, cos, sin, cache, layer_idx, position_ids, attn_mask
    )
    h = residual + att_out

    residual = h
    hn = rms_norm(block["norm_2"], h)
    aux = {}
    if "ffn" in block:
        ffn_out = swiglu(block["ffn"], hn)
    else:
        ep = cfg.get("expert_parallel")
        if ep is not None:
            # explicit EP: shared experts run locally on every token, routed
            # experts dispatch via the 2-all_to_all pattern; aux "counts" are
            # already psum'd GLOBAL (parallel/expert_parallel.py), so the
            # aux-free bias fold sees the same totals as the dense path
            from llm_quest_tpu.parallel.expert_parallel import ep_deepseek_moe

            ffn_out, aux = ep_deepseek_moe(
                ep["mesh"], block["moe"], hn, top_k=cfg["top_k"],
                capacity_factor=ep.get("capacity_factor"),
                ep_axis=ep.get("ep_axis", "model"),
                data_axis=ep.get("data_axis", "data"),
                pin_output=ep.get("pin_output", False),
            )
        else:
            ffn_out, aux = moe_ops.deepseek_moe(block["moe"], hn, top_k=cfg["top_k"])
    return residual + ffn_out, cache, aux


def apply(params, cfg, x, *, attn_mask=None, cache=None, position_ids=None, **_):
    """Main-model forward (no MTP). Returns (logits, cache, aux); aux carries
    "hidden" (pre-final-norm states for MTP chaining), "moe_counts" (list per
    MoE layer, for the bias update) and "max_vio" (mean load metric)."""
    b, s = x.shape
    cos, sin = rope_tables(cfg)

    pos0 = cache["pos"] if cache is not None else 0
    if position_ids is None and cache is not None:
        position_ids = (pos0 + jnp.arange(s))[None, :] * jnp.ones((b, 1), jnp.int32)

    k_len = kvc.max_len(cache) if cache is not None else s
    mask = causal_mask(s, k_len, q_start=pos0, attn_mask=attn_mask)

    h = embedding(params["tok_emb"], x)
    counts, vios = [], []
    for i, block in enumerate(params["blocks"]):
        h, cache, aux_i = _block(block, cfg, h, mask, cos, sin, cache, i, position_ids, attn_mask)
        if "counts" in aux_i:
            counts.append(aux_i["counts"])
            vios.append(aux_i["max_vio"])

    if cache is not None:
        cache = kvc.advance(cache, s)

    logits = linear(params["out"], rms_norm(params["final_norm"], h))
    aux = {"hidden": h, "moe_counts": counts}
    if vios:
        aux["max_vio"] = jnp.mean(jnp.stack(vios))
    return logits, cache, aux


def mtp_forward(mtp_params, params, cfg, s_x, h_prev, mask, cos, sin):
    """One MTP module step (reference: deepseek_model.py:33-49): returns
    (logits, h_curr). Embedding and output head are the main model's."""
    x = embedding(params["tok_emb"], s_x)
    x = rms_norm(mtp_params["rms_input"], x)
    h_prev = rms_norm(mtp_params["rms_h_prev"], h_prev)
    x = linear(mtp_params["down_proj"], jnp.concatenate([x, h_prev], axis=-1))

    h_curr, _, _ = _block(mtp_params["trf_block"], cfg, x, mask, cos, sin, None, 0, None)
    logits = linear(params["out"], h_curr)  # paper-correct: block output (see module docstring)
    return logits, h_curr


def loss(params, cfg, x, y, shifted_x=None, shifted_y=None, *, training=True):
    """Total training loss = main CE + (coeff/depth)·Σ MTP CE
    (reference: deepseek_model.py:112-138). shifted_x/y: lists of depth
    pre-shifted (b, s) arrays from the MTP collator.

    Returns (loss, aux) — aux carries moe_counts for the bias update.
    """
    logits, _, aux = apply(params, cfg, x)
    main_loss = cross_entropy(logits.reshape(-1, logits.shape[-1]), y.reshape(-1))

    depth = cfg["mtp_depth"]
    if not training or depth == 0 or shifted_x is None:
        return main_loss, aux

    cos, sin = rope_tables(cfg)
    s = x.shape[1]
    mask = causal_mask(s, s)

    h_prev = aux["hidden"]
    mtp_losses = 0.0
    for k in range(depth):
        mtp_logits, h_prev = mtp_forward(params["mtp"][k], params, cfg, shifted_x[k], h_prev, mask, cos, sin)
        mtp_losses = mtp_losses + cross_entropy(
            mtp_logits.reshape(-1, mtp_logits.shape[-1]), shifted_y[k].reshape(-1)
        )

    return main_loss + (cfg["mtp_loss_coeff"] / depth) * mtp_losses, aux


def update_moe_biases(params, cfg, moe_counts):
    """Fold the aux-loss-free bias updates back into params (non-gradient
    state; reference: deepseek_moe.py:206-210). moe_counts: list aligned with
    the model's MoE layers in order."""
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
