"""Qwen3.5 VLM: 3D-patch ViT + hybrid FusedGDN/MRoPE-attention text model.

Behavioral parity with the reference (qwen/qwen3_5/):

Vision (qwen3_5_vision_model.py):
- PatchEmbedding3D (:47-109): Conv3d (t_patch, p, p) stride=kernel, bias —
  here a reshape + one MXU matmul (weights kept in conv layout for HF remap)
- Qwen3_5VisionModel (:241-367): learned SPATIAL pos-embeddings repeated per
  frame, 2D axial VisionRoPE, bidirectional blocks (fused QKV+bias, torch
  LayerNorm eps=1e-6, GELU-tanh FFN with bias)
- ViTMergeAdapter (:370-431): LayerNorm → 2×2 spatial merge concat → MLP →
  llm_dim

Text (qwen3_5_text_model.py):
- FusedGatedDeltaNet (:37-191): SINGLE fused QKV projection + SINGLE
  depthwise causal conv over the fused channels (HF weight layout);
  sequence-major head split after the conv; rest identical to Qwen3-Next GDN
  (l2-norm clamp, β/α, fp32 delta rule, fp32 post-norm/gate)
- MRoPEGatedAttention (:194-267): GatedAttention + RoPE.apply_mrope over
  (3, b, s) T/H/W position ids; text-only ids reduce it to standard RoPE
- dense SwiGLU FFN blocks, ZeroCenteredRMSNorm, tied head (:334-417)

VLM (qwen3_5_vlm_model.py):
- get_feeds_3d_shape (:46-83), compute_3d_position_ids (:85-176) — T/H/W
  global cumsum + local offsets with max-jump after each image (host-side
  numpy here: pure function of input ids, computed once per prompt)
- forward (:178-227): vision embeddings scattered into image-placeholder
  token slots, MRoPE ids, text forward over fused embeddings

TPU redesign: decode runs on the hybrid static cache (KV for attention
layers, rolling conv + fp32 recurrent states for GDN layers) inside one
jitted scan; the vision tower runs ONCE per prompt (the reference re-encodes
every step, qwen3_5_generate_multimodal.py:107-109 — combining its two
scripts' cached/uncached paths as SURVEY §3.3 prescribes).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from llm_quest_tpu.config import model_dtype
from llm_quest_tpu.inference import cache as kv_cache
from llm_quest_tpu.ops import gdn as gdn_ops
from llm_quest_tpu.ops import rope
from llm_quest_tpu.ops.activations import gelu_erf, gelu_tanh, silu
from llm_quest_tpu.ops.attention import attention, merge_heads, mha_packed, split_heads
from llm_quest_tpu.ops.linear import embedding, init_embedding, init_linear, linear, tied_head
from llm_quest_tpu.ops.masks import causal_mask
from llm_quest_tpu.ops.mlp import init_swiglu, swiglu
from llm_quest_tpu.ops.norms import (
    init_layer_norm,
    init_rms_norm,
    init_zero_centered_rms_norm,
    layer_norm_torch,
    rms_norm_torch_parity,
    zero_centered_rms_norm,
)

# ================================================================ vision tower


def n_patches_hw(cfg):
    return cfg["img_height"] // cfg["patch_size"], cfg["img_width"] // cfg["patch_size"]


def init_patch_embedding_3d(key, cfg, dtype):
    p = cfg["patch_size"]
    tp = cfg["temporal_patch_size"]
    c = cfg["in_channels"]
    d = cfg["vision_emb_dim"]
    kw, kb = jax.random.split(key)
    fan_in = c * tp * p * p
    bound = 1.0 / (fan_in**0.5)
    return {
        "conv_w": jax.random.uniform(kw, (d, c, tp, p, p), dtype, -bound, bound),
        "conv_b": jax.random.uniform(kb, (d,), dtype, -bound, bound),
    }


def patch_embedding_3d(params, cfg, x):
    """x: (b, c, T, H, W) → (b, N, vision_emb_dim); N = (T/tp)·(H/p)·(W/p).
    Conv3d stride=kernel as reshape + matmul."""
    b, c, t, hh, ww = x.shape
    p, tp = cfg["patch_size"], cfg["temporal_patch_size"]
    d = params["conv_w"].shape[0]
    nt, nh, nw = t // tp, hh // p, ww // p
    patches = (
        x.reshape(b, c, nt, tp, nh, p, nw, p)
        .transpose(0, 2, 4, 6, 1, 3, 5, 7)  # (b, nt, nh, nw, c, tp, p, p)
        .reshape(b, nt * nh * nw, c * tp * p * p)
    )
    w = params["conv_w"].reshape(d, -1).T
    return patches @ w + params["conv_b"]


def init_vision_block(key, cfg, dtype):
    d = cfg["vision_emb_dim"]
    kq, ko, k1, k2 = jax.random.split(key, 4)
    return {
        "norm1": init_layer_norm(d, dtype=dtype),
        "qkv": init_linear(kq, d, 3 * d, bias=True, dtype=dtype),
        "proj": init_linear(ko, d, d, bias=True, dtype=dtype),
        "norm2": init_layer_norm(d, dtype=dtype),
        "fc1": init_linear(k1, d, cfg["vision_hidden_dim"], bias=True, dtype=dtype),
        "fc2": init_linear(k2, cfg["vision_hidden_dim"], d, bias=True, dtype=dtype),
    }


def init_merge_adapter(key, cfg, dtype):
    d = cfg["vision_emb_dim"]
    m = cfg["spatial_merge_size"]
    merged = d * m * m
    k1, k2 = jax.random.split(key)
    return {
        "norm": init_layer_norm(d, dtype=dtype),
        "lin1": init_linear(k1, merged, merged, bias=True, dtype=dtype),
        "lin2": init_linear(k2, merged, cfg["llm_d_in"], bias=True, dtype=dtype),
    }


def merge_adapter(params, cfg, x):
    """LayerNorm → m×m spatial merge concat → GELU MLP → llm_dim
    (reference: qwen3_5_vision_model.py:411-431)."""
    b, n, d = x.shape
    m = cfg["spatial_merge_size"]
    nh, nw = n_patches_hw(cfg)
    t = n // (nh * nw)
    x = layer_norm_torch(params["norm"], x)
    x = x.reshape(b, t, nh // m, m, nw // m, m, d).transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, -1, d * m * m)
    return linear(params["lin2"], gelu_erf(linear(params["lin1"], x)))


def init_vision(key, cfg):
    dtype = model_dtype(cfg)
    n = cfg["vision_n_layers"]
    keys = jax.random.split(key, n + 3)
    return {
        "patch_embed": init_patch_embedding_3d(keys[0], cfg, dtype),
        "pos_embed": init_embedding(keys[1], cfg["num_position_embeddings"], cfg["vision_emb_dim"], dtype=dtype),
        "blocks": [init_vision_block(keys[2 + i], cfg, dtype) for i in range(n)],
        "merge": init_merge_adapter(keys[-1], cfg, dtype),
    }


def vision_rope_tables(cfg):
    nh, nw = n_patches_hw(cfg)
    return rope.compute_angles_2d(
        cfg["vision_rope_base"], cfg["vision_emb_dim"] // cfg["vision_num_heads"], nh, nw
    )


def _vision_attention(block, cfg, x, cos, sin):
    b, s, d = x.shape
    nhh = cfg["vision_num_heads"]
    q, k, v = jnp.split(linear(block["qkv"], x), 3, axis=-1)
    dh = q.shape[-1] // nhh
    # packed head layout end-to-end (no split/merge transposes): RoPE is
    # applied on the (b, s, h, d) VIEW, then the bidirectional maskless
    # attention runs on the packed (b, s, h·d) tensors (Pallas kernel on TPU)
    q = rope.apply_packed(q.reshape(b, s, nhh, dh), cos, sin).reshape(b, s, -1)
    k = rope.apply_packed(k.reshape(b, s, nhh, dh), cos, sin).reshape(b, s, -1)
    return linear(block["proj"], mha_packed(q, k, v, nhh, cfg=cfg))


def apply_vision(params, cfg, pixels):
    """pixels: (b, c, T, H, W) → (b, num_merged_patches, llm_d_in)."""
    nh, nw = n_patches_hw(cfg)
    n_spatial = nh * nw

    h = patch_embedding_3d(params["patch_embed"], cfg, pixels)
    seq_len = h.shape[1]
    n_frames = seq_len // n_spatial

    # spatial pos-embeddings repeated across frames (reference: :355-358)
    pos = embedding(params["pos_embed"], jnp.arange(n_spatial))
    h = h + jnp.tile(pos, (n_frames, 1))[None, :seq_len].astype(h.dtype)

    cos, sin = vision_rope_tables(cfg)
    cos = jnp.tile(cos, (n_frames, 1))
    sin = jnp.tile(sin, (n_frames, 1))

    for block in params["blocks"]:
        residual = h
        h = residual + _vision_attention(block, cfg, layer_norm_torch(block["norm1"], h), cos, sin)
        residual = h
        hn = layer_norm_torch(block["norm2"], h)
        h = residual + linear(block["fc2"], gelu_tanh(linear(block["fc1"], hn)))

    return merge_adapter(params["merge"], cfg, h)


# ================================================================= text model


def is_gdn_layer(cfg, layer_idx):
    return (layer_idx + 1) % cfg["linear_sdpa_ratio"] != 0


def gdn_layer_indices(cfg):
    return [i for i in range(cfg["n_layers"]) if is_gdn_layer(cfg, i)]


def attn_layer_indices(cfg):
    return [i for i in range(cfg["n_layers"]) if not is_gdn_layer(cfg, i)]


def _fused_dims(cfg):
    d_qk = cfg["linear_num_qk_heads"] * cfg["linear_qk_head_dim"]
    d_vg = cfg["linear_num_value_heads"] * cfg["linear_value_head_dim"]
    return d_qk, d_vg, 2 * d_qk + d_vg


def init_fused_gdn(key, cfg, dtype):
    d = cfg["emb_dim"]
    d_qk, d_vg, fused = _fused_dims(cfg)
    ks = jax.random.split(key, 7)
    return {
        "w_qkv": init_linear(ks[0], d, fused, bias=False, dtype=dtype),
        "w_gate": init_linear(ks[1], d, d_vg, bias=False, dtype=dtype),
        "w_beta": init_linear(ks[2], d, cfg["linear_num_value_heads"], bias=False, dtype=dtype),
        "w_alpha": init_linear(ks[3], d, cfg["linear_num_value_heads"], bias=False, dtype=dtype),
        "log_A": jnp.log(jax.random.uniform(ks[4], (cfg["linear_num_value_heads"],), jnp.float32, 0.0, 16.0)),
        "dt_bias": jnp.ones((cfg["linear_num_value_heads"],), dtype),
        "conv1d": gdn_ops.init_conv1d(ks[5], fused, cfg["linear_conv_kernel_size"], dtype=dtype),
        "post_norm": init_rms_norm(cfg["linear_value_head_dim"], dtype=jnp.float32),
        "out_proj": init_linear(ks[6], d_vg, d, bias=False, dtype=dtype),
    }


def _fused_gdn_heads(cfg, q, k, v):
    """Sequence-major head split (b, s, c) → (b, h, s, hd)
    (reference fused reshape: qwen3_5_text_model.py:152-156)."""
    b, s = q.shape[:2]
    nqk, dqk = cfg["linear_num_qk_heads"], cfg["linear_qk_head_dim"]
    nv, dv = cfg["linear_num_value_heads"], cfg["linear_value_head_dim"]
    q = q.reshape(b, s, nqk, dqk).transpose(0, 2, 1, 3)
    k = k.reshape(b, s, nqk, dqk).transpose(0, 2, 1, 3)
    v = v.reshape(b, s, nv, dv).transpose(0, 2, 1, 3)
    return q, k, v


def fused_gdn(params, cfg, x, attn_mask_cur, gdn_state):
    """Full-sequence FusedGDN (training / prefill). Returns (out, new_state|None)."""
    d_qk, d_vg, _ = _fused_dims(cfg)
    num_repeat = cfg["linear_num_value_heads"] // cfg["linear_num_qk_heads"]
    ksz = cfg["linear_conv_kernel_size"]

    if attn_mask_cur is not None:
        x = x * attn_mask_cur[..., None].astype(x.dtype)

    fused_in = linear(params["w_qkv"], x)  # (b, s, fused)
    beta = jax.nn.sigmoid(jnp.moveaxis(linear(params["w_beta"], x), 1, 2))
    alpha = jnp.moveaxis(
        gdn_ops.compute_alpha_factor(params["log_A"], linear(params["w_alpha"], x), params["dt_bias"]), 1, 2
    )
    # pad tokens must be a state no-op (right-padded serving admission)
    beta, alpha = gdn_ops.freeze_masked_updates(beta, alpha, attn_mask_cur)

    if gdn_state is not None:
        # resume from the stored taps (zero on fresh admits — identical to
        # the plain conv): chunked prefill / serving prefix caching continue
        # an earlier prefill exactly
        fused_c, conv_ext = gdn_ops.causal_conv1d_seeded(params["conv1d"], fused_in, gdn_state["conv"])
        ext_mask = None if attn_mask_cur is None else jnp.concatenate(
            [jnp.ones((x.shape[0], ksz - 1), bool), attn_mask_cur], axis=1
        )
    else:
        fused_c, conv_ext, ext_mask = gdn_ops.causal_conv1d(params["conv1d"], fused_in), fused_in, attn_mask_cur
    fused = silu(fused_c)
    q, k, v = jnp.split(fused, [d_qk, 2 * d_qk], axis=-1)
    q, k, v = _fused_gdn_heads(cfg, q, k, v)
    q = gdn_ops.l2_norm_clamp(q)
    k = gdn_ops.l2_norm_clamp(k)
    if num_repeat > 1:
        q = jnp.repeat(q, num_repeat, axis=1)
        k = jnp.repeat(k, num_repeat, axis=1)

    prev = gdn_state["recurrent"] if gdn_state is not None else None
    # under cfg["context_parallel"] the LASP sequence-sharded form takes over
    ctx, final_state = gdn_ops.gated_delta_rule_dispatch(
        cfg, q, k, v, beta, alpha, prev_state=prev, allow_cp=gdn_state is None
    )

    out = _gdn_output(params, cfg, x, ctx)
    new_state = None
    if gdn_state is not None:
        new_state = {
            "conv": gdn_ops.conv_state_from_prefill(conv_ext, ksz, mask=ext_mask),
            "recurrent": final_state,
        }
    return out, new_state


def fused_gdn_step(params, cfg, x, conv_state, rec_stacked, layer):
    """Single-token FusedGDN decode step. x: (b, 1, d); ``conv_state`` is
    THIS layer's rolling taps, ``rec_stacked`` the (n_gdn, b, h, dv, dk)
    stacked recurrent cache updated in place at ``layer`` (the Pallas step
    kernel aliases the whole buffer — no per-layer slice/update copies).
    Returns (out, new_conv_state, updated rec_stacked)."""
    b = x.shape[0]
    d_qk, d_vg, _ = _fused_dims(cfg)
    num_repeat = cfg["linear_num_value_heads"] // cfg["linear_num_qk_heads"]
    nqk, dqk = cfg["linear_num_qk_heads"], cfg["linear_qk_head_dim"]
    nv, dv = cfg["linear_num_value_heads"], cfg["linear_value_head_dim"]
    x_t = x[:, 0, :]

    fused_in = linear(params["w_qkv"], x_t)
    fused_c, conv_state = gdn_ops.causal_conv1d_update(params["conv1d"], fused_in, conv_state)
    fused_c = silu(fused_c)
    q, k, v = jnp.split(fused_c, [d_qk, 2 * d_qk], axis=-1)
    q = gdn_ops.l2_norm_clamp(q.reshape(b, nqk, dqk))
    k = gdn_ops.l2_norm_clamp(k.reshape(b, nqk, dqk))
    v = v.reshape(b, nv, dv)
    if num_repeat > 1:
        q = jnp.repeat(q, num_repeat, axis=1)
        k = jnp.repeat(k, num_repeat, axis=1)

    beta = jax.nn.sigmoid(linear(params["w_beta"], x_t))
    alpha = gdn_ops.compute_alpha_factor(
        params["log_A"], linear(params["w_alpha"], x_t[:, None, :]), params["dt_bias"]
    )[:, 0, :]

    ctx, rec_stacked = gdn_ops.gated_delta_rule_step_stacked_auto(
        cfg, q, k, v, beta, alpha, rec_stacked, layer
    )
    out = _gdn_output(params, cfg, x, ctx[:, :, None, :])
    return out, conv_state, rec_stacked


def _gdn_output(params, cfg, x, ctx):
    b, h, s, dv = ctx.shape
    ctx = rms_norm_torch_parity(params["post_norm"], ctx.astype(jnp.float32))
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, h * dv)
    gate = silu(linear(params["w_gate"], x).astype(jnp.float32))
    # collapse the fp32 gate island back to the model compute dtype (cfg,
    # not the weight's — int8-quantized out_proj has no fp "w" to peek at)
    out = (gate * ctx).astype(cfg["dtype"])
    return linear(params["out_proj"], out)


def init_mrope_attention(key, cfg, dtype):
    d = cfg["emb_dim"]
    hd = cfg["head_dim"]
    d_out = cfg["n_heads"] * hd
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "wqg": init_linear(kq, d, d_out * 2, bias=False, dtype=dtype),  # fused q+gate
        "wk": init_linear(kk, d, cfg["num_kv_groups"] * hd, bias=False, dtype=dtype),
        "wv": init_linear(kv, d, cfg["num_kv_groups"] * hd, bias=False, dtype=dtype),
        "q_norm": init_zero_centered_rms_norm(hd, dtype=dtype),
        "k_norm": init_zero_centered_rms_norm(hd, dtype=dtype),
        "out_proj": init_linear(ko, d_out, d, bias=False, dtype=dtype),
    }


def mrope_attention(params, cfg, x, mask, cos, sin, position_ids, kv_view, attn_mask=None,
                    q_start=None):
    """GatedAttention with MRoPE. position_ids: (3, b, s) or None (→ standard
    sequential ids on all 3 dims)."""
    b, s, _ = x.shape
    n_heads, hd = cfg["n_heads"], cfg["head_dim"]

    qg = linear(params["wqg"], x).reshape(b, s, n_heads, 2 * hd)
    q, gate = jnp.split(qg, 2, axis=-1)
    q = q.transpose(0, 2, 1, 3)
    gate = jax.nn.sigmoid(gate.reshape(b, s, n_heads * hd))

    k = split_heads(linear(params["wk"], x), cfg["num_kv_groups"])
    v = split_heads(linear(params["wv"], x), cfg["num_kv_groups"])

    q = zero_centered_rms_norm(params["q_norm"], q)
    k = zero_centered_rms_norm(params["k_norm"], k)
    q = rope.apply_mrope(q, cos, sin, position_ids, cfg["mrope_section"])
    k = rope.apply_mrope(k, cos, sin, position_ids, cfg["mrope_section"])

    if kv_view is not None:
        k, v = kv_view(k, v)

    # flash covers uncached calls AND cached prefill (sq < max_len view)
    # when the query offset is static — long-prompt TTFT streams KV
    out = merge_heads(attention(
        q, k, v, cfg=cfg, mask=mask, causal=True, attn_mask=attn_mask,
        flash_ok=kv_view is None or q_start is not None, q_start=q_start,
    ))
    return linear(params["out_proj"], out * gate.astype(out.dtype))


def init_text_block(key, cfg, dtype, layer_idx):
    ka, kf = jax.random.split(key)
    d = cfg["emb_dim"]
    att = init_fused_gdn(ka, cfg, dtype) if is_gdn_layer(cfg, layer_idx) else init_mrope_attention(ka, cfg, dtype)
    return {
        "norm1": init_zero_centered_rms_norm(d, dtype=dtype),
        "att": att,
        "norm2": init_zero_centered_rms_norm(d, dtype=dtype),
        "ffn": init_swiglu(kf, d, cfg["hidden_dim"], dtype=dtype),
    }


def init_text(key, cfg):
    dtype = model_dtype(cfg)
    keys = jax.random.split(key, cfg["n_layers"] + 2)
    if cfg["tie_embeddings"]:
        bound = (6.0 / (cfg["vocab_size"] + cfg["emb_dim"])) ** 0.5
        tok_emb = {"w": jax.random.uniform(keys[0], (cfg["vocab_size"], cfg["emb_dim"]), dtype, -bound, bound)}
    else:
        tok_emb = init_embedding(keys[0], cfg["vocab_size"], cfg["emb_dim"], dtype=dtype)
    params = {
        "tok_emb": tok_emb,
        "blocks": [init_text_block(keys[1 + i], cfg, dtype, i) for i in range(cfg["n_layers"])],
        "final_norm": init_zero_centered_rms_norm(cfg["emb_dim"], dtype=dtype),
    }
    if not cfg["tie_embeddings"]:
        params["out"] = init_linear(keys[-1], cfg["emb_dim"], cfg["vocab_size"], bias=False, dtype=dtype)
    return params


def rope_tables(cfg):
    return rope.compute_angles(
        cfg["rope_base"], cfg["head_dim"], cfg["context_length"], rotation_factor=cfg["partial_rope_factor"]
    )


def init_cache(cfg, batch, max_len, *, dtype=None):
    """Hybrid cache: stacked KV (attention layers) + fused conv / recurrent
    states (GDN layers) — the functional Qwen3_5Cache (reference:
    utils.py:535-624)."""
    dtype = dtype or model_dtype(cfg)
    n_attn = len(attn_layer_indices(cfg))
    n_gdn = len(gdn_layer_indices(cfg))
    _, _, fused = _fused_dims(cfg)
    ksz = cfg["linear_conv_kernel_size"]
    if cfg.get("kv_quant") == "int8":
        # int8 KV for the full-attention layers (inference/cache.py design);
        # the GDN conv/recurrent states stay fp — tiny and precision-critical
        kv = kv_cache.init_kv_cache(
            n_attn, batch, cfg["num_kv_groups"], max_len, cfg["head_dim"], quant="int8"
        )
        kv.pop("pos")
    else:
        kv = {
            "k": jnp.zeros((n_attn, batch, cfg["num_kv_groups"], max_len, cfg["head_dim"]), dtype),
            "v": jnp.zeros((n_attn, batch, cfg["num_kv_groups"], max_len, cfg["head_dim"]), dtype),
        }
    return {
        **kv,
        "conv": jnp.zeros((n_gdn, batch, ksz - 1, fused), dtype),
        "recurrent": jnp.zeros(
            (n_gdn, batch, cfg["linear_num_value_heads"], cfg["linear_value_head_dim"], cfg["linear_qk_head_dim"]),
            jnp.float32,
        ),
        "pos": jnp.zeros((), jnp.int32),
    }


def _cur_token_mask(attn_mask, s, pos0):
    # scalar or per-row-vector pos0 (continuous-batching serving)
    return kv_cache.cur_token_mask(attn_mask, s, pos0)


def apply_text(
    params,
    cfg,
    x=None,
    *,
    attn_mask=None,
    inputs_embs=None,
    position_ids=None,
    cache=None,
    output_hidden_states=False,
    **_,
):
    """Text forward. position_ids: (3, b, s) MRoPE ids or None (text-only →
    sequential on all 3 dims). Returns (logits, cache, aux);
    ``output_hidden_states=True`` returns the final-norm hidden states
    instead of logits (the fused-head-CE training path — the (tokens,
    248k-vocab) logit tensor never materializes; see
    training/engine.py::make_train_step + ``head_weights``)."""
    h = inputs_embs if inputs_embs is not None else embedding(params["tok_emb"], x)
    b, s = h.shape[:2]
    cos, sin = rope_tables(cfg)

    pos0 = cache["pos"] if cache is not None else 0
    if position_ids is None:
        if getattr(pos0, "ndim", 0) >= 1:  # per-row pool pointers (serving)
            seq = pos0[:, None] + jnp.arange(s)[None, :]
        else:
            seq = (pos0 + jnp.arange(s))[None, :] * jnp.ones((b, 1), jnp.int32)
        position_ids = jnp.broadcast_to(seq[None], (3, b, s))
    elif position_ids.ndim == 2:  # (b, s) 1-D ids (generic decode engine) → T=H=W
        position_ids = jnp.broadcast_to(position_ids[None], (3, b, s))

    k_len = kv_cache.max_len(cache) if cache is not None else s
    # context parallelism skips the dense O(s²) mask: the attention router
    # streams causality through the ring-flash kernel, and the GDN layers
    # take the LASP sequence-sharded form (ops/gdn.py::gated_delta_rule_dispatch)
    cp_active = cfg.get("context_parallel") is not None and cache is None and attn_mask is None
    mask = None if cp_active else causal_mask(s, k_len, q_start=pos0, attn_mask=attn_mask)
    mask_cur = _cur_token_mask(attn_mask, s, pos0)

    # static query offset for cached prefill (see models/qwen3.py)
    q_start_static = None
    if cache is not None and s > 1:
        try:
            q_start_static = int(pos0)
        except (TypeError, jax.errors.TracerIntegerConversionError, jax.errors.ConcretizationTypeError):
            q_start_static = None

    attn_i = gdn_i = 0
    decode_step = cache is not None and s == 1

    for i, block in enumerate(params["blocks"]):
        residual = h
        hn = zero_centered_rms_norm(block["norm1"], h)

        if is_gdn_layer(cfg, i):
            if cache is None:
                att_out, _ = fused_gdn(block["att"], cfg, hn, mask_cur, None)
            else:
                if decode_step:
                    hn_m = hn if mask_cur is None else hn * mask_cur[..., None].astype(hn.dtype)
                    att_out, new_conv, rec = fused_gdn_step(
                        block["att"], cfg, hn_m, cache["conv"][gdn_i], cache["recurrent"], gdn_i
                    )
                    cache = {
                        **cache,
                        "conv": cache["conv"].at[gdn_i].set(new_conv),
                        "recurrent": rec,
                    }
                else:
                    st = {"conv": cache["conv"][gdn_i], "recurrent": cache["recurrent"][gdn_i]}
                    att_out, st = fused_gdn(block["att"], cfg, hn, mask_cur, st)
                    cache = {
                        **cache,
                        "conv": cache["conv"].at[gdn_i].set(st["conv"]),
                        "recurrent": cache["recurrent"].at[gdn_i].set(st["recurrent"]),
                    }
            gdn_i += 1
        else:
            kv_view = None
            if cache is not None:
                idx = attn_i

                def kv_view(k_new, v_new, idx=idx):
                    nonlocal cache
                    # handles scalar AND per-row-vector pos (serving), plus
                    # int8-quantized caches (returns QuantKV views)
                    cache, kc, vc = kv_cache.write_layer(cache, idx, k_new, v_new, pos0)
                    return kc, vc

            att_out = mrope_attention(
                block["att"], cfg, hn, mask, cos, sin, position_ids, kv_view,
                attn_mask=attn_mask, q_start=q_start_static,
            )
            attn_i += 1

        h = residual + att_out
        residual = h
        h = residual + swiglu(block["ffn"], zero_centered_rms_norm(block["norm2"], h))

    h = zero_centered_rms_norm(params["final_norm"], h)
    if cache is not None:
        cache = {**cache, "pos": cache["pos"] + s}

    if output_hidden_states:
        return h, cache, {}
    if cfg["tie_embeddings"]:
        logits = tied_head(params["tok_emb"], h)
    else:
        logits = linear(params["out"], h)
    return logits, cache, {}


def head_weights(params, cfg):
    """(d, vocab) output-head matrix — the fused-CE training path. The
    flagship ties the head to the 248,320-row embedding table."""
    if cfg["tie_embeddings"]:
        return params["tok_emb"]["w"].T
    return params["out"]["w"]


# ==================================================================== VLM


def init(key, cfg):
    kv, kt = jax.random.split(key)
    return {"vision": init_vision(kv, cfg), "text": init_text(kt, cfg)}


def get_feeds_3d_shape(cfg, image_pixels_shape):
    """(t_patches, h_patches, w_patches) of the single feed
    (reference: qwen3_5_vlm_model.py:46-83). image_pixels_shape: 5D shape."""
    nh, nw = n_patches_hw(cfg)
    n_frames = image_pixels_shape[2] // cfg["temporal_patch_size"]
    return np.asarray([[n_frames, nh, nw]])


def compute_3d_position_ids(cfg, input_ids, feeds_3d_shape=None):
    """Host-side (numpy) MRoPE position builder
    (reference: qwen3_5_vlm_model.py:85-176). input_ids: (b, s) np array.
    Returns (3, b, s) int32."""
    input_ids = np.asarray(input_ids)
    b, s = input_ids.shape
    if feeds_3d_shape is None:
        return np.broadcast_to(np.arange(s, dtype=np.int32)[None, None], (3, b, s)).copy()

    merge = cfg["spatial_merge_size"]
    image_mask = input_ids == cfg["image_token_id"]
    pos_increments = (~image_mask).astype(np.int64)
    local = np.zeros((3, b, s), np.int64)

    for b_idx in range(b):
        img_indices = np.where(image_mask[b_idx])[0]
        if len(img_indices) == 0:
            continue
        pos = 0
        for t, h, w in np.asarray(feeds_3d_shape):
            mh, mw = h // merge, w // merge
            num_tokens = int(t * mh * mw)
            if pos + num_tokens > len(img_indices):
                break
            cur = img_indices[pos : pos + num_tokens]
            pos_increments[b_idx, cur[-1]] = max(int(t), mh, mw)
            li = np.arange(num_tokens)
            local[0, b_idx, cur] = li // (mh * mw)
            local[1, b_idx, cur] = (li % (mh * mw)) // mw
            local[2, b_idx, cur] = li % mw
            pos += num_tokens

    global_pos = np.cumsum(pos_increments, axis=1) - pos_increments
    return (global_pos[None] + local).astype(np.int32)


def fuse_embeddings(params, cfg, input_ids, image_pixels):
    """Embed ids, scatter vision embeddings into image-placeholder slots
    (reference: qwen3_5_vlm_model.py:198-211). Returns (b, s, d) embeddings."""
    inputs_embs = embedding(params["text"]["tok_emb"], input_ids)
    if image_pixels is None:
        return inputs_embs
    vision = apply_vision(params["vision"], cfg, image_pixels)  # (b, Nv, d)
    image_mask = input_ids == cfg["image_token_id"]  # (b, s)
    # masked_scatter as a gather: position j takes vision[cumsum(mask)-1]
    # where mask, else the text embedding (placeholder counts == Nv)
    idx = jnp.cumsum(image_mask, axis=1) - 1
    idx = jnp.clip(idx, 0, vision.shape[1] - 1)
    scattered = jnp.take_along_axis(vision.astype(inputs_embs.dtype), idx[..., None], axis=1)
    return jnp.where(image_mask[..., None], scattered, inputs_embs)


def apply(params, cfg, input_ids, *, image_pixels=None, attn_mask=None, cache=None, position_ids=None, **_):
    """Full VLM forward (reference: qwen3_5_vlm_model.py:178-227).
    position_ids: optional precomputed (3, b, s) — computed host-side when
    None and jit-tracing is not active."""
    inputs_embs = fuse_embeddings(params, cfg, input_ids, image_pixels)
    if position_ids is None and not isinstance(input_ids, jax.core.Tracer):
        feeds = get_feeds_3d_shape(cfg, image_pixels.shape) if image_pixels is not None else None
        position_ids = jnp.asarray(compute_3d_position_ids(cfg, np.asarray(input_ids), feeds))
    return apply_text(
        params["text"], cfg, attn_mask=attn_mask, inputs_embs=inputs_embs, position_ids=position_ids, cache=cache
    )


# whole-generation jit cache for generate_multimodal: one compiled program per
# (cfg, shapes, sampler flags) — same trick (and freeze helper) as
# inference/generate.py. Without it the prefill dispatches op-by-op
# (catastrophic over remote transports).
_MM_JIT_CACHE = {}


def generate_multimodal(
    params, cfg, input_ids, image_pixels, *, max_gen, temp=0.0, top_k=None, top_p=None, min_p=None,
    eos_ids=None, pad_id=0, rng=None,
):
    """Encode image ONCE, prefill the hybrid cache, scan 1-token decode steps
    (fixes the reference's per-step re-encode, see module docstring). The 3-D
    position ids are computed host-side from the concrete prompt, then the
    whole encode+prefill+decode program runs as ONE jitted computation
    (cached per cfg/shape/sampler signature).

    input_ids: (b, s) prompt with image placeholders already expanded.
    Returns dict {"sequences": (b, s+max_gen)}.
    """
    from llm_quest_tpu.inference.generate import _freeze

    b, prompt_len = input_ids.shape
    if rng is None:
        rng = jax.random.PRNGKey(0)
    eos_list = list(eos_ids) if isinstance(eos_ids, (list, tuple)) else [eos_ids if eos_ids is not None else -1]

    ids_np = np.asarray(input_ids)
    feeds = get_feeds_3d_shape(cfg, image_pixels.shape) if image_pixels is not None else None
    prompt_pos = jnp.asarray(compute_3d_position_ids(cfg, ids_np, feeds))  # (3, b, s)

    key = (
        _freeze(cfg), ids_np.shape, None if image_pixels is None else tuple(image_pixels.shape),
        max_gen, temp, top_k, top_p, min_p, tuple(eos_list), pad_id,
    )
    fn = _MM_JIT_CACHE.get(key)
    if fn is None:
        fn = jax.jit(
            partial(
                _generate_multimodal_device, cfg=cfg, max_gen=max_gen, temp=temp, top_k=top_k,
                top_p=top_p, min_p=min_p, eos_list=tuple(eos_list), pad_id=pad_id,
            )
        )
        _MM_JIT_CACHE[key] = fn
    return {"sequences": fn(params, jnp.asarray(ids_np), image_pixels, prompt_pos, rng)}


def _generate_multimodal_device(
    params, input_ids, image_pixels, prompt_pos, rng, *, cfg, max_gen, temp, top_k, top_p, min_p,
    eos_list, pad_id,
):
    from llm_quest_tpu.ops.sampling import sampling

    b, prompt_len = input_ids.shape
    max_total = prompt_len + max_gen
    eos_arr = jnp.asarray(list(eos_list), jnp.int32)
    next_pos0 = jnp.max(prompt_pos, axis=(0, 2)) + 1  # (b,) next sequential position per row

    cache = init_cache(cfg, b, max_total)
    mask_buf = jnp.concatenate([jnp.ones((b, prompt_len), bool), jnp.zeros((b, max_gen), bool)], axis=1)

    inputs_embs = fuse_embeddings(params, cfg, input_ids, image_pixels)
    logits, cache, _ = apply_text(
        params["text"], cfg, attn_mask=mask_buf, inputs_embs=inputs_embs, position_ids=prompt_pos, cache=cache
    )
    logits = logits[:, -1]

    finished = jnp.zeros((b,), bool)

    def step(carry, i):
        cache, mask_buf, finished, logits, rng = carry
        rng, sub = jax.random.split(rng)
        sampled = sampling(sub, logits, top_k=top_k, top_p=top_p, min_p=min_p, temp=temp)
        tok = jnp.where(finished, pad_id, sampled)
        finished = finished | jnp.any(tok[:, None] == eos_arr[None], axis=-1)
        mask_buf = mask_buf.at[:, prompt_len + i].set(~finished)

        pos = (next_pos0 + i)[None, :, None] * jnp.ones((3, 1, 1), jnp.int32)  # (3, b, 1)
        logits_new, cache, _ = apply_text(
            params["text"], cfg, tok[:, None], attn_mask=mask_buf, position_ids=pos, cache=cache
        )
        return (cache, mask_buf, finished, logits_new[:, 0], rng), tok

    (_, _, _, _, _), tokens = lax.scan(step, (cache, mask_buf, finished, logits, rng), jnp.arange(max_gen))
    return jnp.concatenate([input_ids, tokens.T], axis=1)
