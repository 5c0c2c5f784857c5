"""Qwen3-Next: GatedDeltaNet / GatedAttention hybrid with MoE blocks.

Behavioral parity with the reference (qwen/qwen3_next/):

- hybrid layout: block i uses GatedDeltaNet unless (i+1) % linear_sdpa_ratio
  == 0 → GatedAttention (qwen3_next_transformer_block.py:28-30)
- GatedAttention (qwen3_next_attention.py:162-261): FUSED q+gate projection
  (per-head [q‖gate] chunking — matches Qwen3.5 HF weight layout), zero-
  centered QK RMSNorm before partial RoPE (25%), sigmoid output gate
- GatedDeltaNet (:264-395): 3 depthwise causal convs + SiLU on q/k/v
  projections, clamp-variant L2 norm on q/k, QK-head→V-head repeat, β =
  sigmoid(w_β x), α = exp(−exp(log_A)·softplus(w_α x + dt_bias)), recurrent
  fp32 delta rule, per-v-head fp32 RMSNorm, fp32 SiLU gate product
- blocks end in Qwen3MoE with weighted shared expert; ZeroCenteredRMSNorm
  everywhere; untied output head (qwen3_next_model.py:9-56)

TPU redesign: the per-timestep python recurrence is a lax.scan (ops/gdn.py);
decode runs on a HYBRID static cache — stacked KV tensors for the GA layers +
rolling conv states and fp32 recurrent states for the GDN layers — one pytree
carried through the jitted decode scan (the reference trains uncached;
Qwen3.5's cache, utils.py:535-624, is the behavioral model here).
"""

import jax
import jax.numpy as jnp
from jax import lax

from llm_quest_tpu.config import model_dtype
from llm_quest_tpu.inference import cache as kv_cache
from llm_quest_tpu.ops import gdn as gdn_ops
from llm_quest_tpu.ops.remat import checkpoint_block
from llm_quest_tpu.ops import moe as moe_ops
from llm_quest_tpu.ops import rope
from llm_quest_tpu.ops.activations import silu
from llm_quest_tpu.ops.attention import attention, merge_heads, split_heads
from llm_quest_tpu.ops.linear import embedding, init_embedding, init_linear, linear
from llm_quest_tpu.ops.masks import causal_mask
from llm_quest_tpu.ops.norms import (
    init_rms_norm,
    init_zero_centered_rms_norm,
    rms_norm_torch_parity,
    zero_centered_rms_norm,
)


def is_gdn_layer(cfg, layer_idx):
    return (layer_idx + 1) % cfg["linear_sdpa_ratio"] != 0


def gdn_layer_indices(cfg):
    return [i for i in range(cfg["n_layers"]) if is_gdn_layer(cfg, i)]


def ga_layer_indices(cfg):
    return [i for i in range(cfg["n_layers"]) if not is_gdn_layer(cfg, i)]


# ---------------------------------------------------------------- GatedAttention


def init_gated_attention(key, cfg, dtype):
    d = cfg["emb_dim"]
    hd = cfg["head_dim"]
    d_out = cfg["n_heads"] * hd
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "wqg": init_linear(kq, d, d_out * 2, bias=False, dtype=dtype),  # fused q + gate
        "wk": init_linear(kk, d, cfg["num_kv_groups"] * hd, bias=False, dtype=dtype),
        "wv": init_linear(kv, d, cfg["num_kv_groups"] * hd, bias=False, dtype=dtype),
        "q_norm": init_zero_centered_rms_norm(hd, dtype=dtype),
        "k_norm": init_zero_centered_rms_norm(hd, dtype=dtype),
        "out_proj": init_linear(ko, d_out, d, bias=False, dtype=dtype),
    }


def gated_attention(params, cfg, x, mask, cos, sin, position_ids, kv_view, attn_mask=None):
    """kv_view: None (no cache) or (k_full, v_full, write_fn) from the cache."""
    b, s, _ = x.shape
    n_heads, hd = cfg["n_heads"], cfg["head_dim"]

    qg = linear(params["wqg"], x).reshape(b, s, n_heads, 2 * hd)
    q, gate = jnp.split(qg, 2, axis=-1)  # per-head chunk (HF fused layout)
    q = q.transpose(0, 2, 1, 3)  # (b, h, s, hd)
    gate = jax.nn.sigmoid(gate.reshape(b, s, n_heads * hd))

    k = split_heads(linear(params["wk"], x), cfg["num_kv_groups"])
    v = split_heads(linear(params["wv"], x), cfg["num_kv_groups"])

    q = rope.apply(zero_centered_rms_norm(params["q_norm"], q), cos, sin, position_ids)
    k = rope.apply(zero_centered_rms_norm(params["k_norm"], k), cos, sin, position_ids)

    if kv_view is not None:
        k, v = kv_view(k, v)

    out = merge_heads(attention(
        q, k, v, cfg=cfg, mask=mask, causal=True, attn_mask=attn_mask,
        flash_ok=kv_view is None,
    ))
    return linear(params["out_proj"], out * gate.astype(out.dtype))


# ---------------------------------------------------------------- GatedDeltaNet


def init_gdn(key, cfg, dtype):
    d = cfg["emb_dim"]
    d_qk = cfg["linear_num_qk_heads"] * cfg["linear_qk_head_dim"]
    d_vg = cfg["linear_num_value_heads"] * cfg["linear_value_head_dim"]
    ksz = cfg["linear_conv_kernel_size"]
    ks = jax.random.split(key, 10)
    return {
        "wq": init_linear(ks[0], d, d_qk, bias=False, dtype=dtype),
        "wk": init_linear(ks[1], d, d_qk, bias=False, dtype=dtype),
        "wv": init_linear(ks[2], d, d_vg, bias=False, dtype=dtype),
        "wb": init_linear(ks[3], d, cfg["linear_num_value_heads"], bias=False, dtype=dtype),
        "wa": init_linear(ks[4], d, cfg["linear_num_value_heads"], bias=False, dtype=dtype),
        # A ~ U(0,16), stored as log; fp32 island (reference: :301-303)
        "log_A": jnp.log(jax.random.uniform(ks[5], (cfg["linear_num_value_heads"],), jnp.float32, 0.0, 16.0)),
        "dt_bias": jnp.ones((cfg["linear_num_value_heads"],), dtype),
        "conv_q": gdn_ops.init_conv1d(ks[6], d_qk, ksz, dtype=dtype),
        "conv_k": gdn_ops.init_conv1d(ks[7], d_qk, ksz, dtype=dtype),
        "conv_v": gdn_ops.init_conv1d(ks[8], d_vg, ksz, dtype=dtype),
        "post_norm": init_rms_norm(cfg["linear_value_head_dim"], dtype=jnp.float32),
        "w_gate": init_linear(ks[9], d, d_vg, bias=False, dtype=dtype),
        "out_proj": init_linear(jax.random.split(ks[9])[0], d_vg, d, bias=False, dtype=dtype),
    }


def _gdn_heads(cfg, q, k, v):
    """(b, s, c) projections → multi-head (b, h, s, hd) with channel-major
    head split (matches the reference reshape(b, heads, head_dim, s))."""
    b, s, _ = q.shape
    nqk, dqk = cfg["linear_num_qk_heads"], cfg["linear_qk_head_dim"]
    nv, dv = cfg["linear_num_value_heads"], cfg["linear_value_head_dim"]
    q = jnp.moveaxis(q, 1, 2).reshape(b, nqk, dqk, s).transpose(0, 1, 3, 2)
    k = jnp.moveaxis(k, 1, 2).reshape(b, nqk, dqk, s).transpose(0, 1, 3, 2)
    v = jnp.moveaxis(v, 1, 2).reshape(b, nv, dv, s).transpose(0, 1, 3, 2)
    return q, k, v


def gated_delta_net(params, cfg, x, attn_mask_cur, gdn_state):
    """GDN over a full sequence (training / prefill).

    attn_mask_cur: (b, s) bool for the CURRENT tokens, True = real, or None.
    gdn_state: None, or dict {"conv_q","conv_k","conv_v","recurrent"} —
    when given, the recurrence starts from it and the new state is returned.
    Returns (out, new_gdn_state | None).
    """
    b, s, _ = x.shape
    num_repeat = cfg["linear_num_value_heads"] // cfg["linear_num_qk_heads"]
    ksz = cfg["linear_conv_kernel_size"]

    if attn_mask_cur is not None:
        x = x * attn_mask_cur[..., None].astype(x.dtype)

    q_in = linear(params["wq"], x)
    k_in = linear(params["wk"], x)
    v_in = linear(params["wv"], x)

    if gdn_state is not None:
        # resume from the stored taps (zero on fresh admits — identical to
        # the plain conv): chunked prefill / serving prefix caching continue
        # an earlier prefill exactly
        q_c, q_ext = gdn_ops.causal_conv1d_seeded(params["conv_q"], q_in, gdn_state["conv_q"])
        k_c, k_ext = gdn_ops.causal_conv1d_seeded(params["conv_k"], k_in, gdn_state["conv_k"])
        v_c, v_ext = gdn_ops.causal_conv1d_seeded(params["conv_v"], v_in, gdn_state["conv_v"])
        ext_mask = None if attn_mask_cur is None else jnp.concatenate(
            [jnp.ones((x.shape[0], ksz - 1), bool), attn_mask_cur], axis=1
        )
    else:
        q_c, q_ext = gdn_ops.causal_conv1d(params["conv_q"], q_in), q_in
        k_c, k_ext = gdn_ops.causal_conv1d(params["conv_k"], k_in), k_in
        v_c, v_ext = gdn_ops.causal_conv1d(params["conv_v"], v_in), v_in
        ext_mask = attn_mask_cur
    q, k, v = silu(q_c), silu(k_c), silu(v_c)

    q, k, v = _gdn_heads(cfg, q, k, v)
    q = gdn_ops.l2_norm_clamp(q)
    k = gdn_ops.l2_norm_clamp(k)
    if num_repeat > 1:
        q = jnp.repeat(q, num_repeat, axis=1)
        k = jnp.repeat(k, num_repeat, axis=1)

    beta = jax.nn.sigmoid(jnp.moveaxis(linear(params["wb"], x), 1, 2))  # (b, hv, s)
    alpha = jnp.moveaxis(
        gdn_ops.compute_alpha_factor(params["log_A"], linear(params["wa"], x), params["dt_bias"]), 1, 2
    )
    # pad tokens must be a state no-op (right-padded serving admission)
    beta, alpha = gdn_ops.freeze_masked_updates(beta, alpha, attn_mask_cur)

    prev = gdn_state["recurrent"] if gdn_state is not None else None
    # long sequences → fused Pallas kernel on TPU / chunked XLA form (exact;
    # MXU matmuls instead of an s-step recurrence); short ones → scan; under
    # cfg["context_parallel"] → the LASP sequence-sharded form
    ctx, final_state = gdn_ops.gated_delta_rule_dispatch(
        cfg, q, k, v, beta, alpha, prev_state=prev, allow_cp=gdn_state is None
    )

    out = _gdn_output(params, cfg, x, ctx)

    new_state = None
    if gdn_state is not None:
        new_state = {
            "conv_q": gdn_ops.conv_state_from_prefill(q_ext, ksz, mask=ext_mask),
            "conv_k": gdn_ops.conv_state_from_prefill(k_ext, ksz, mask=ext_mask),
            "conv_v": gdn_ops.conv_state_from_prefill(v_ext, ksz, mask=ext_mask),
            "recurrent": final_state,
        }
    return out, new_state


def gated_delta_net_step(params, cfg, x, conv_states, rec_stacked, layer):
    """Single-token GDN decode step with rolling conv + recurrent state.
    x: (b, 1, d); ``conv_states``: this layer's {"conv_q","conv_k","conv_v"}
    taps; ``rec_stacked``: the (n_gdn, b, h, dv, dk) stacked recurrent
    cache, updated in place at ``layer`` (Pallas whole-buffer aliasing — see
    ops/gdn.py::gated_delta_rule_step_stacked_auto). Returns
    (out (b, 1, d), new conv dict, updated rec_stacked)."""
    b = x.shape[0]
    num_repeat = cfg["linear_num_value_heads"] // cfg["linear_num_qk_heads"]
    nqk, dqk = cfg["linear_num_qk_heads"], cfg["linear_qk_head_dim"]
    nv, dv = cfg["linear_num_value_heads"], cfg["linear_value_head_dim"]
    x_t = x[:, 0, :]

    q_in = linear(params["wq"], x_t)
    k_in = linear(params["wk"], x_t)
    v_in = linear(params["wv"], x_t)

    q_c, conv_q = gdn_ops.causal_conv1d_update(params["conv_q"], q_in, conv_states["conv_q"])
    k_c, conv_k = gdn_ops.causal_conv1d_update(params["conv_k"], k_in, conv_states["conv_k"])
    v_c, conv_v = gdn_ops.causal_conv1d_update(params["conv_v"], v_in, conv_states["conv_v"])

    # channel-major head split (c = h·hd with channels grouped per head)
    q = gdn_ops.l2_norm_clamp(silu(q_c).reshape(b, nqk, dqk))
    k = gdn_ops.l2_norm_clamp(silu(k_c).reshape(b, nqk, dqk))
    v = silu(v_c).reshape(b, nv, dv)
    if num_repeat > 1:
        q = jnp.repeat(q, num_repeat, axis=1)
        k = jnp.repeat(k, num_repeat, axis=1)

    beta = jax.nn.sigmoid(linear(params["wb"], x_t))  # (b, hv)
    alpha = gdn_ops.compute_alpha_factor(params["log_A"], linear(params["wa"], x_t[:, None, :]), params["dt_bias"])[
        :, 0, :
    ]

    ctx, rec_stacked = gdn_ops.gated_delta_rule_step_stacked_auto(
        cfg, q, k, v, beta, alpha, rec_stacked, layer
    )

    out = _gdn_output(params, cfg, x, ctx[:, :, None, :])
    return out, {"conv_q": conv_q, "conv_k": conv_k, "conv_v": conv_v}, rec_stacked


def _gdn_output(params, cfg, x, ctx):
    """Post-norm (fp32, per v-head), fp32 SiLU gate product, out projection
    (reference: qwen3_next_attention.py:386-393). ctx: (b, h, s, dv)."""
    b, h, s, dv = ctx.shape
    ctx = rms_norm_torch_parity(params["post_norm"], ctx.astype(jnp.float32))
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, h * dv)
    gate = silu(linear(params["w_gate"], x).astype(jnp.float32))
    # collapse the fp32 gate island back to the model compute dtype (cfg,
    # not the weight's — int8-quantized out_proj has no fp "w" to peek at)
    out = (gate * ctx).astype(cfg["dtype"])
    return linear(params["out_proj"], out)


# ----------------------------------------------------------------------- model


def init_block(key, cfg, dtype, layer_idx):
    ka, kf = jax.random.split(key)
    d = cfg["emb_dim"]
    att = init_gdn(ka, cfg, dtype) if is_gdn_layer(cfg, layer_idx) else init_gated_attention(ka, cfg, dtype)
    return {
        "norm1": init_zero_centered_rms_norm(d, dtype=dtype),
        "att": att,
        "norm2": init_zero_centered_rms_norm(d, dtype=dtype),
        "moe": moe_ops.init_qwen3_moe(kf, cfg, dtype=dtype),
    }


def init(key, cfg):
    dtype = model_dtype(cfg)
    keys = jax.random.split(key, cfg["n_layers"] + 2)
    return {
        "tok_emb": init_embedding(keys[0], cfg["vocab_size"], cfg["emb_dim"], dtype=dtype),
        "blocks": [init_block(keys[1 + i], cfg, dtype, i) for i in range(cfg["n_layers"])],
        "final_norm": init_zero_centered_rms_norm(cfg["emb_dim"], dtype=dtype),
        "out": init_linear(keys[-1], cfg["emb_dim"], cfg["vocab_size"], bias=False, dtype=dtype),
    }


def rope_tables(cfg):
    return rope.compute_angles(
        cfg["rope_base"], cfg["head_dim"], cfg["context_length"], rotation_factor=cfg["partial_rope_factor"]
    )


def init_cache(cfg, batch, max_len, *, dtype=None):
    """Hybrid cache: stacked KV over GA layers + conv/recurrent GDN states."""
    dtype = dtype or model_dtype(cfg)
    n_ga = len(ga_layer_indices(cfg))
    n_gdn = len(gdn_layer_indices(cfg))
    d_qk = cfg["linear_num_qk_heads"] * cfg["linear_qk_head_dim"]
    d_vg = cfg["linear_num_value_heads"] * cfg["linear_value_head_dim"]
    ksz = cfg["linear_conv_kernel_size"]
    if cfg.get("kv_quant") == "int8":
        kv = kv_cache.init_kv_cache(
            n_ga, batch, cfg["num_kv_groups"], max_len, cfg["head_dim"], quant="int8"
        )
        kv.pop("pos")
    else:
        kv = {
            "k": jnp.zeros((n_ga, batch, cfg["num_kv_groups"], max_len, cfg["head_dim"]), dtype),
            "v": jnp.zeros((n_ga, batch, cfg["num_kv_groups"], max_len, cfg["head_dim"]), dtype),
        }
    return {
        **kv,
        "conv_q": jnp.zeros((n_gdn, batch, ksz - 1, d_qk), dtype),
        "conv_k": jnp.zeros((n_gdn, batch, ksz - 1, d_qk), dtype),
        "conv_v": jnp.zeros((n_gdn, batch, ksz - 1, d_vg), dtype),
        "recurrent": jnp.zeros(
            (n_gdn, batch, cfg["linear_num_value_heads"], cfg["linear_value_head_dim"], cfg["linear_qk_head_dim"]),
            jnp.float32,
        ),
        "pos": jnp.zeros((), jnp.int32),
    }


def _cur_token_mask(attn_mask, s, pos0):
    """Slice the (b, max_len) engine mask down to the s current positions;
    scalar or per-row-vector pos0 (continuous-batching serving)."""
    return kv_cache.cur_token_mask(attn_mask, s, pos0)


def apply(
    params,
    cfg,
    x,
    *,
    attn_mask=None,
    cache=None,
    position_ids=None,
    training=False,
    output_hidden_states=False,
    **_,
):
    """Forward. Returns (logits, cache, aux) — aux has moe_loss / gate_probas."""
    b, s = x.shape
    cos, sin = rope_tables(cfg)

    pos0 = cache["pos"] if cache is not None else 0
    if position_ids is None and cache is not None:
        if getattr(pos0, "ndim", 0) >= 1:  # per-row pool pointers (serving)
            position_ids = pos0[:, None] + jnp.arange(s)[None, :]
        else:
            position_ids = (pos0 + jnp.arange(s))[None, :] * jnp.ones((b, 1), jnp.int32)

    k_len = kv_cache.max_len(cache) if cache is not None else s
    # context parallelism skips the dense O(s²) mask: the attention router
    # streams causality through the ring-flash kernel, and the GDN layers
    # take the LASP sequence-sharded form (ops/gdn.py::gated_delta_rule_dispatch)
    cp_active = cfg.get("context_parallel") is not None and cache is None and attn_mask is None
    mask = None if cp_active else causal_mask(s, k_len, q_start=pos0, attn_mask=attn_mask)
    mask_cur = _cur_token_mask(attn_mask, s, pos0)

    h = embedding(params["tok_emb"], x)

    aux = {"gate_probas": []}
    moe_loss = 0.0
    ga_i = gdn_i = 0
    decode_step = cache is not None and s == 1
    use_ckpt = cfg.get("gradient_checkpointing", False) and training and cache is None

    for i, block in enumerate(params["blocks"]):
        if use_ckpt:
            # rematerialize the whole block in backward (activations of the
            # MoE/GDN inner matmuls dominate training memory)
            def block_fn(block, h, i=i):
                residual = h
                hn = zero_centered_rms_norm(block["norm1"], h)
                if is_gdn_layer(cfg, i):
                    att_out, _ = gated_delta_net(block["att"], cfg, hn, mask_cur, None)
                else:
                    att_out = gated_attention(
                        block["att"], cfg, hn, mask, cos, sin, position_ids, None,
                        attn_mask=attn_mask,
                    )
                h = residual + att_out
                residual = h
                hn = zero_centered_rms_norm(block["norm2"], h)
                ffn_out, moe_aux = moe_ops.qwen3_moe(
                    block["moe"], hn, top_k=cfg["top_k"], load_coeff=cfg["aux_loss_coef"], training=training,
                    capacity_factor=cfg.get("moe_capacity_factor") if training else None,
                )
                return residual + ffn_out, moe_aux

            h, moe_aux = checkpoint_block(cfg, block_fn)(block, h)
            aux["gate_probas"].append(moe_aux["gate_probas"])
            if "moe_loss" in moe_aux:
                moe_loss = moe_loss + moe_aux["moe_loss"]
            continue

        residual = h
        hn = zero_centered_rms_norm(block["norm1"], h)

        if is_gdn_layer(cfg, i):
            if cache is None:
                att_out, _ = gated_delta_net(block["att"], cfg, hn, mask_cur, None)
            elif decode_step:
                hn_m = hn if mask_cur is None else hn * mask_cur[..., None].astype(hn.dtype)
                att_out, convs, rec = gated_delta_net_step(
                    block["att"], cfg, hn_m,
                    {k_: cache[k_][gdn_i] for k_ in ("conv_q", "conv_k", "conv_v")},
                    cache["recurrent"], gdn_i,
                )
                cache = {
                    **cache,
                    "conv_q": cache["conv_q"].at[gdn_i].set(convs["conv_q"]),
                    "conv_k": cache["conv_k"].at[gdn_i].set(convs["conv_k"]),
                    "conv_v": cache["conv_v"].at[gdn_i].set(convs["conv_v"]),
                    "recurrent": rec,
                }
            else:
                st = {
                    "conv_q": cache["conv_q"][gdn_i],
                    "conv_k": cache["conv_k"][gdn_i],
                    "conv_v": cache["conv_v"][gdn_i],
                    "recurrent": cache["recurrent"][gdn_i],
                }
                att_out, st = gated_delta_net(block["att"], cfg, hn, mask_cur, st)
                cache = {
                    **cache,
                    "conv_q": cache["conv_q"].at[gdn_i].set(st["conv_q"]),
                    "conv_k": cache["conv_k"].at[gdn_i].set(st["conv_k"]),
                    "conv_v": cache["conv_v"].at[gdn_i].set(st["conv_v"]),
                    "recurrent": cache["recurrent"].at[gdn_i].set(st["recurrent"]),
                }
            gdn_i += 1
        else:
            kv_view = None
            if cache is not None:
                idx = ga_i

                def kv_view(k_new, v_new, idx=idx):
                    nonlocal cache
                    # handles scalar AND per-row-vector pos (serving), plus
                    # int8-quantized caches (returns QuantKV views)
                    cache, kc, vc = kv_cache.write_layer(cache, idx, k_new, v_new, pos0)
                    return kc, vc

            att_out = gated_attention(
                block["att"], cfg, hn, mask, cos, sin, position_ids, kv_view,
                attn_mask=attn_mask,
            )
            ga_i += 1

        h = residual + att_out

        residual = h
        hn = zero_centered_rms_norm(block["norm2"], h)
        ffn_out, moe_aux = moe_ops.qwen3_moe(
            block["moe"], hn, top_k=cfg["top_k"], load_coeff=cfg["aux_loss_coef"], training=training,
            capacity_factor=cfg.get("moe_capacity_factor") if training else None,
        )
        h = residual + ffn_out
        aux["gate_probas"].append(moe_aux["gate_probas"])
        if "moe_loss" in moe_aux:
            moe_loss = moe_loss + moe_aux["moe_loss"]

    if training:
        aux["moe_loss"] = moe_loss

    h = zero_centered_rms_norm(params["final_norm"], h)
    if cache is not None:
        cache = {**cache, "pos": cache["pos"] + s}

    if output_hidden_states:
        return h, cache, aux
    logits = linear(params["out"], h)
    return logits, cache, aux


def head_weights(params, cfg):
    """(d, vocab) output-head matrix — for the fused-CE training path."""
    return params["out"]["w"]
