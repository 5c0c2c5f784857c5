"""Vision Transformer (from scratch) in functional JAX form.

Behavioral parity with the reference (multimodal/vision_transformer/):

- PatchEmbedding2D (vit_model.py:19-89): patchify + linear projection with
  bias, learnable CLS token prepended
- ViTModel (vit_model.py:92-160): learnable (1, N+1, d) positional embedding,
  dropout, pre-LN encoder blocks (GPT LayerNorm/GELU-erf FFN, bidirectional
  attention with attention-weight dropout), final LN, CLS classifier head,
  ``output_hidden_states`` toggle

TPU redesign: the stride=kernel Conv2d is algebraically a patch-reshape +
matmul — implemented as reshape/transpose + one MXU matmul (identical math,
no conv lowering). Weight kept in conv layout (emb, c, p, p) so HF/torch
checkpoints remap 1:1.
"""

import jax
import jax.numpy as jnp

from llm_quest_tpu.config import model_dtype
from llm_quest_tpu.ops.attention import mha_packed
from llm_quest_tpu.ops.dropout import dropout
from llm_quest_tpu.ops.linear import init_linear, linear
from llm_quest_tpu.ops.mlp import init_mlp_gelu, mlp_gelu
from llm_quest_tpu.ops.norms import init_layer_norm, layer_norm


def num_patches(cfg):
    return (cfg["img_width"] * cfg["img_height"]) // cfg["patch_size"] ** 2


def init_patch_embedding(key, cfg, dtype):
    p = cfg["patch_size"]
    c = cfg["num_channels"]
    d = cfg["emb_dim"]
    kw, kb, kc = jax.random.split(key, 3)
    fan_in = c * p * p
    bound = 1.0 / (fan_in**0.5)
    return {
        "conv_w": jax.random.uniform(kw, (d, c, p, p), dtype, -bound, bound),
        "conv_b": jax.random.uniform(kb, (d,), dtype, -bound, bound),
        "cls_token": jax.random.normal(kc, (1, 1, d), dtype),
    }


def patch_embedding(params, cfg, x):
    """x: (b, c, H, W) → (b, N+1, d) with CLS prepended."""
    b, c, hh, ww = x.shape
    p = cfg["patch_size"]
    d = params["conv_w"].shape[0]
    nh, nw = hh // p, ww // p
    # patchify: (b, c, nh, p, nw, p) → (b, nh, nw, c, p, p) → (b, N, c·p·p)
    patches = x.reshape(b, c, nh, p, nw, p).transpose(0, 2, 4, 1, 3, 5).reshape(b, nh * nw, c * p * p)
    w = params["conv_w"].reshape(d, -1).T  # (c·p·p, d)
    emb = patches @ w + params["conv_b"]
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, d)).astype(emb.dtype)
    return jnp.concatenate([cls, emb], axis=1)


def init_attention(key, cfg, dtype):
    d = cfg["emb_dim"]
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "wq": init_linear(kq, d, d, bias=cfg["qkv_bias"], dtype=dtype),
        "wk": init_linear(kk, d, d, bias=cfg["qkv_bias"], dtype=dtype),
        "wv": init_linear(kv, d, d, bias=cfg["qkv_bias"], dtype=dtype),
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
    keys = jax.random.split(key, cfg["n_layers"] + 4)
    return {
        "patch_emb": init_patch_embedding(keys[0], cfg, dtype),
        "pos_emb": jax.random.normal(keys[1], (1, num_patches(cfg) + 1, cfg["emb_dim"]), dtype),
        "blocks": [init_block(keys[2 + i], cfg, dtype) for i in range(cfg["n_layers"])],
        "final_ln": init_layer_norm(cfg["emb_dim"], dtype=dtype),
        "classifier": init_linear(keys[-1], cfg["emb_dim"], cfg["num_classes"], bias=True, dtype=dtype),
    }


def _attention(params, cfg, x, rng, deterministic, layer_idx=None):
    # bidirectional, maskless (reference: vit_attention.py:44-91); attention-
    # weight dropout approximated as output dropout under XLA fusion. The
    # packed path keeps the (b, s, h·d) projection layout end-to-end — no
    # split/merge head transposes (kernels/fused_mha.py::packed_mha on TPU)
    out = mha_packed(
        linear(params["wq"], x), linear(params["wk"], x), linear(params["wv"], x),
        cfg["n_heads"], cfg=cfg, layer_idx=layer_idx,
    )
    out = dropout(rng, out, cfg.get("drop_rate", 0.0), deterministic)
    return linear(params["out_proj"], out)


def calibrate_int8_scales(params, cfg, x):
    """Per-layer (q_scale, k_scale) for static int8 score quantization (PTQ).

    Runs one fp forward on calibration images, capturing max|q| / max|k| at
    each layer's attention input. Feed the result back as
    cfg["int8_qk_scales"] (with cfg["int8_scores"]=True): the quantize then
    compiles to a fused elementwise epilogue — the dynamic per-tensor max is
    a global reduce whose extra HBM passes eat the int8 win (measured).
    """
    cfg = dict(cfg, int8_scores=False, drop_rate=0.0)

    @jax.jit
    def probe(params, x):
        h = patch_embedding(params["patch_emb"], cfg, x)
        h = h + params["pos_emb"].astype(h.dtype)
        maxes = []
        for block in params["blocks"]:
            hn = layer_norm(block["ln_1"], h)
            q = linear(block["att"]["wq"], hn)
            k = linear(block["att"]["wk"], hn)
            maxes.append(jnp.stack([jnp.max(jnp.abs(q.astype(jnp.float32))),
                                    jnp.max(jnp.abs(k.astype(jnp.float32)))]))
            residual = h
            h = residual + _attention(block["att"], cfg, hn, None, True)
            residual = h
            h = residual + mlp_gelu(block["ffn"], layer_norm(block["ln_2"], h))
        return jnp.stack(maxes)  # (n_layers, 2)

    m = jax.device_get(probe(params, x))
    return [(float(mq) / 127.0, float(mk) / 127.0) for mq, mk in m]


def apply(params, cfg, x, *, output_hidden_states=False, deterministic=True, rng=None, **_):
    """x: (b, c, H, W) images. Returns (b, num_classes) logits, or the final
    (b, N+1, d) hidden states when output_hidden_states."""
    drop = cfg.get("drop_rate", 0.0)
    rngs = jax.random.split(rng, 1 + 2 * cfg["n_layers"]) if rng is not None else [None] * (1 + 2 * cfg["n_layers"])

    h = patch_embedding(params["patch_emb"], cfg, x)
    h = h + params["pos_emb"].astype(h.dtype)
    h = dropout(rngs[0], h, drop, deterministic)

    for i, block in enumerate(params["blocks"]):
        residual = h
        hn = layer_norm(block["ln_1"], h)
        h = residual + dropout(rngs[1 + 2 * i], _attention(block["att"], cfg, hn, rngs[1 + 2 * i], deterministic, layer_idx=i), drop, deterministic)
        residual = h
        hn = layer_norm(block["ln_2"], h)
        h = residual + dropout(rngs[2 + 2 * i], mlp_gelu(block["ffn"], hn), drop, deterministic)

    h = layer_norm(params["final_ln"], h)
    if output_hidden_states:
        return h
    return linear(params["classifier"], h[:, 0])
