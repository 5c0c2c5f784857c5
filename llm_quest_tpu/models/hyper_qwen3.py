"""Qwen3 with hyper-connections (classic HC / mHC / mHC-lite).

Behavioral parity with the reference (common/hyper_connections/hyper_qwen3.py:57-265):
the token embedding expands to n residual streams; each sub-block
(attention, FFN) is wrapped as residual = H_res·x, y = block(H_pre·x),
out = residual + H_post·y; streams are SUMMED (not averaged) before the
final norm; separate HC bundles for the attention and FFN halves.
"""

import jax.numpy as jnp

from llm_quest_tpu.models import qwen3
from llm_quest_tpu.ops import hyper_connections as hc
from llm_quest_tpu.ops.linear import embedding, linear, tied_head
from llm_quest_tpu.ops.masks import causal_mask
from llm_quest_tpu.ops.mlp import swiglu
from llm_quest_tpu.ops.norms import rms_norm_torch_parity


def init(key, cfg, *, hc_type="hc", expansion_rate=4):
    params = qwen3.init(key, cfg)
    d = cfg["emb_dim"]
    init_set = (
        (lambda: hc.init_hc_set(d, expansion_rate))
        if hc_type == "hc"
        else (lambda: hc.init_mhc_set(d, expansion_rate, lite=(hc_type == "mhc-lite")))
    )
    for block in params["blocks"]:
        block["hc_attn"] = init_set()
        block["hc_ffn"] = init_set()
    return params


def apply(params, cfg, x, *, hc_type="hc", expansion_rate=4, attn_mask=None, position_ids=None, **_):
    """Forward with n-stream hyper-connections. Returns (logits, None, aux)."""
    b, s = x.shape
    cos, sin = qwen3.rope_tables(cfg)
    mask = causal_mask(s, s, attn_mask=attn_mask)

    h = embedding(params["tok_emb"], x)
    h = jnp.broadcast_to(h[:, :, None, :], (b, s, expansion_rate, cfg["emb_dim"]))  # expand streams

    for i, block in enumerate(params["blocks"]):

        def attn_fn(single):
            hn = rms_norm_torch_parity(block["pre_att_norm"], single)
            out, _ = qwen3._attention(block["att"], cfg, hn, mask, cos, sin, None, i, position_ids)
            return out

        def ffn_fn(single):
            hn = rms_norm_torch_parity(block["pre_ffn_norm"], single)
            return swiglu(block["ffn"], hn)

        h = hc.hc_wrap(block["hc_attn"], h, attn_fn, hc_type=hc_type, n=expansion_rate)
        h = hc.hc_wrap(block["hc_ffn"], h, ffn_fn, hc_type=hc_type, n=expansion_rate)

    # SUM streams — the model learns to split features 1/n across streams
    # (reference: hyper_qwen3.py:222-225)
    h = jnp.sum(h, axis=-2)
    h = rms_norm_torch_parity(params["final_norm"], h)

    if cfg["tie_embeddings"]:
        logits = tied_head(params["tok_emb"], h)
    else:
        logits = linear(params["out"], h)
    return logits, None, {}
