"""Interop with the reference torch package's OWN module state_dicts.

The HF rules in interop.py target HuggingFace checkpoint names; these rule
sets target the reference implementation's module names (e.g.
``trf_blocks.0.att.w_queries.weight``), so a model trained with the torch
reference can be ported into this framework — and, just as importantly, so
logit parity against the reference can be measured without network access
(tests/test_parity_torch.py). Oracle for the loading behavior:
reference utils.py:956-1060.

All loaders take a ``state_dict`` of torch tensors or numpy arrays (anything
np.asarray accepts — call ``{k: v.detach().numpy() for ...}`` on the torch
side first if you want to avoid importing torch here).

Layout notes (same as interop.py): torch nn.Linear stores (out, in), ours
store (in, out) → transpose=True; torch depthwise Conv1d stores (c, 1, k),
ours (c, k) → squeeze; reference per-expert nn.ModuleList entries are
gathered into stacked (n_experts, in, out) arrays.
"""

import re

import numpy as np

from llm_quest_tpu.weights.interop import (
    convert_weights,
    flatten_params,
    gather_stacked_experts,
    report_loading_status,
    unflatten_into,
)

T = True


def _squeeze_conv(w):
    return np.asarray(w)[:, 0, :]  # (c, 1, k) → (c, k)


_BUFFER_PREFIXES = (
    "mask", "cos", "sin",
    "main_model.mask", "main_model.cos", "main_model.sin",
)


# ------------------------------------------------------------------ GPT-2

# reference: gpt/gpt_model.py:20-41, gpt/gpt_attention.py (w_queries/w_keys/
# w_values/out_proj), gpt_transformer_block.py:68-83 (ffn.layers.0/2)
GPT2_REF_RULES = [
    # pos rule first: "pos_emb_dict.weight" CONTAINS "emb_dict.weight", and
    # an exact full-name match breaks out of the rule chain
    ("pos_emb_dict.weight", "pos_emb/w"),
    ("emb_dict.weight", "tok_emb/w"),
    ("final_ln.scale", "final_ln/scale"),
    ("final_ln.shift", "final_ln/shift"),
    ("out.weight", "out/w", T),
    ("trf_blocks.", "blocks/"),
    (".att.w_queries.weight", "/att/wq/w", T),
    (".att.w_queries.bias", "/att/wq/b"),
    (".att.w_keys.weight", "/att/wk/w", T),
    (".att.w_keys.bias", "/att/wk/b"),
    (".att.w_values.weight", "/att/wv/w", T),
    (".att.w_values.bias", "/att/wv/b"),
    (".att.out_proj.weight", "/att/out_proj/w", T),
    (".att.out_proj.bias", "/att/out_proj/b"),
    (".ln_1.scale", "/ln_1/scale"),
    (".ln_1.shift", "/ln_1/shift"),
    (".ln_2.scale", "/ln_2/scale"),
    (".ln_2.shift", "/ln_2/shift"),
    (".ffn.layers.0.weight", "/ffn/fc/w", T),
    (".ffn.layers.0.bias", "/ffn/fc/b"),
    (".ffn.layers.2.weight", "/ffn/proj/w", T),
    (".ffn.layers.2.bias", "/ffn/proj/b"),
]


def load_ref_gpt2(params, state_dict, *, log=print):
    target = flatten_params(params)
    converted = convert_weights(
        state_dict, target, GPT2_REF_RULES,
        ignored_prefixes=_BUFFER_PREFIXES + tuple(f"trf_blocks.{i}.att.mask" for i in range(64)),
        log=log,
    )
    missing = report_loading_status(target, converted, log=log)
    assert not missing, f"unmapped target params: {missing}"
    return unflatten_into(params, converted)


# ------------------------------------------------------------------ Qwen3

# reference: qwen/qwen3/qwen3_model.py:18-58, qwen3_transformer_block.py:43-53
QWEN3_REF_RULES = [
    ("emb_dict.weight", "tok_emb/w"),
    ("final_norm.weight", "final_norm/scale"),
    ("out_head.weight", "out/w", T),
    ("trf_blocks.", "blocks/"),
    (".att.w_queries.weight", "/att/wq/w", T),
    (".att.w_keys.weight", "/att/wk/w", T),
    (".att.w_values.weight", "/att/wv/w", T),
    (".att.out_proj.weight", "/att/out_proj/w", T),
    (".att.q_norm.weight", "/att/q_norm/scale"),
    (".att.k_norm.weight", "/att/k_norm/scale"),
    (".norm1.weight", "/pre_att_norm/scale"),
    (".norm2.weight", "/pre_ffn_norm/scale"),
    (".ffn.lin_gate.weight", "/ffn/gate/w", T),
    (".ffn.lin1.weight", "/ffn/up/w", T),
    (".ffn.lin2.weight", "/ffn/down/w", T),
    (".moe.gate.weight", "/moe/gate_w", T),
]

# Which branch gets the silu differs BETWEEN reference MoE families:
# qwen3_moe.py Expert activates lin_gate (x1 · silu(x_gate)) while
# deepseek_moe.py Expert activates lin1 (silu(x1) · x_gate). Our expert stack
# always activates the "gate" array, so the maps swap accordingly.
_EXPERT_MAP = {"lin_gate": "gate", "lin1": "lin1", "lin2": "lin2"}
_EXPERT_MAP_DEEPSEEK = {"lin1": "gate", "lin_gate": "lin1", "lin2": "lin2"}


def _gather_grouped_experts(state_dict, pattern, expert_map=_EXPERT_MAP):
    """Stack per-expert tensors matched by ``pattern`` — groups (layer,
    experts|routed_experts|shared_experts, expert_idx, proj) — into
    (n, in, out) arrays under blocks/{layer}/moe/{experts|routed|shared}/{proj}."""
    group_names = {"experts": "experts", "routed_experts": "routed", "shared_experts": "shared"}
    buckets = {}
    for name, w in state_dict.items():
        m = re.match(pattern, name)
        if not m:
            continue
        key = f"blocks/{m.group(1)}/moe/{group_names[m.group(2)]}/{expert_map[m.group(4)]}"
        buckets.setdefault(key, {})[int(m.group(3))] = np.asarray(w).T
    return {k: np.stack([v[i] for i in range(len(v))]) for k, v in buckets.items()}


def load_ref_qwen3(params, cfg, state_dict, *, log=print):
    target = flatten_params(params)
    converted = convert_weights(
        state_dict, target, QWEN3_REF_RULES, ignored_prefixes=_BUFFER_PREFIXES, log=log
    )
    if cfg.get("model_type", "dense") == "moe":
        converted.update(
            gather_stacked_experts(
                state_dict,
                r"trf_blocks\.(\d+)\.moe\.experts\.(\d+)\.(lin_gate|lin1|lin2)\.weight",
                "blocks/{layer}/moe/experts/{proj}",
                cfg["num_experts"],
                mapping=_EXPERT_MAP,
            )
        )
    missing = report_loading_status(target, converted, log=log)
    assert not missing, f"unmapped target params: {missing}"
    return unflatten_into(params, converted)


# ------------------------------------------------------------- Qwen3-Next

# reference: qwen/qwen3_next/qwen3_next_attention.py (GatedDeltaNet +
# GatedAttention), qwen3_next_model.py:29-33, moe/qwen3_moe.py:80-103
QWEN3_NEXT_REF_RULES = [
    ("emb_dict.weight", "tok_emb/w"),
    ("final_norm.scale", "final_norm/scale"),
    ("out_head.weight", "out/w", T),
    ("trf_blocks.", "blocks/"),
    # GDN linear-attention layer
    (".att.log_A", "/att/log_A"),
    (".att.dt_bias", "/att/dt_bias"),
    (".att.w_beta.weight", "/att/wb/w", T),
    (".att.w_alpha.weight", "/att/wa/w", T),
    (".att.conv_queries.weight", "/att/conv_q/w", _squeeze_conv),
    (".att.conv_keys.weight", "/att/conv_k/w", _squeeze_conv),
    (".att.conv_values.weight", "/att/conv_v/w", _squeeze_conv),
    (".att.post_norm.weight", "/att/post_norm/scale"),
    (".att.w_gate.weight", "/att/w_gate/w", T),
    # gated full-attention layers (fused query‖gate) + shared projections
    (".att.w_queries_gate.weight", "/att/wqg/w", T),
    (".att.w_queries.weight", "/att/wq/w", T),
    (".att.w_keys.weight", "/att/wk/w", T),
    (".att.w_values.weight", "/att/wv/w", T),
    (".att.out_proj.weight", "/att/out_proj/w", T),
    (".att.q_norm.scale", "/att/q_norm/scale"),
    (".att.k_norm.scale", "/att/k_norm/scale"),
    (".norm1.scale", "/norm1/scale"),
    (".norm2.scale", "/norm2/scale"),
    (".moe.gate.weight", "/moe/gate_w", T),
    (".moe.shared_expert_gate.weight", "/moe/shared_gate_w", T),
]


def load_ref_qwen3_next(params, cfg, state_dict, *, log=print):
    target = flatten_params(params)
    converted = convert_weights(
        state_dict, target, QWEN3_NEXT_REF_RULES, ignored_prefixes=_BUFFER_PREFIXES, log=log
    )
    converted.update(
        gather_stacked_experts(
            state_dict,
            r"trf_blocks\.(\d+)\.moe\.experts\.(\d+)\.(lin_gate|lin1|lin2)\.weight",
            "blocks/{layer}/moe/experts/{proj}",
            cfg["num_experts"],
            mapping=_EXPERT_MAP,
        )
    )
    # shared expert: a single Expert module → stacked (1, in, out) arrays
    for name, w in state_dict.items():
        m = re.match(r"trf_blocks\.(\d+)\.moe\.shared_expert\.(lin_gate|lin1|lin2)\.weight", name)
        if m:
            converted[f"blocks/{m.group(1)}/moe/shared/{_EXPERT_MAP[m.group(2)]}"] = (
                np.asarray(w).T[None]
            )
    missing = report_loading_status(target, converted, log=log)
    assert not missing, f"unmapped target params: {missing}"
    return unflatten_into(params, converted)


# ------------------------------------------------------------ Qwen3.5 text

# reference: qwen/qwen3_5/qwen3_5_text_model.py (FusedGatedDeltaNet +
# GatedAttention blocks)
QWEN3_5_TEXT_REF_RULES = [
    ("emb_dict.weight", "tok_emb/w"),
    ("final_norm.scale", "final_norm/scale"),
    ("out_head.weight", "out/w", T),
    ("trf_blocks.", "blocks/"),
    # FusedGatedDeltaNet layer
    (".att.log_A", "/att/log_A"),
    (".att.dt_bias", "/att/dt_bias"),
    (".att.w_qkv.weight", "/att/w_qkv/w", T),
    (".att.w_gate.weight", "/att/w_gate/w", T),
    (".att.w_beta.weight", "/att/w_beta/w", T),
    (".att.w_alpha.weight", "/att/w_alpha/w", T),
    (".att.conv1d.weight", "/att/conv1d/w", _squeeze_conv),
    (".att.post_norm.weight", "/att/post_norm/scale"),
    # gated full-attention layer
    (".att.w_queries_gate.weight", "/att/wqg/w", T),
    (".att.w_keys.weight", "/att/wk/w", T),
    (".att.w_values.weight", "/att/wv/w", T),
    (".att.q_norm.scale", "/att/q_norm/scale"),
    (".att.k_norm.scale", "/att/k_norm/scale"),
    (".att.out_proj.weight", "/att/out_proj/w", T),
    (".norm1.scale", "/norm1/scale"),
    (".norm2.scale", "/norm2/scale"),
    (".ffn.lin_gate.weight", "/ffn/gate/w", T),
    (".ffn.lin1.weight", "/ffn/up/w", T),
    (".ffn.lin2.weight", "/ffn/down/w", T),
]


def load_ref_qwen3_5_text(params, state_dict, *, log=print):
    target = flatten_params(params)
    converted = convert_weights(
        state_dict, target, QWEN3_5_TEXT_REF_RULES, ignored_prefixes=_BUFFER_PREFIXES, log=log
    )
    missing = report_loading_status(target, converted, log=log)
    assert not missing, f"unmapped target params: {missing}"
    return unflatten_into(params, converted)


# ------------------------------------------------------------- DeepSeek-V3

# reference: llama3_to_deepseekv3/deepseek_model.py (MainModel + MTPModule;
# MTP emb/out are SHARED with the main model → their state_dict entries are
# duplicates and ignored here), deepseek_attention.py:38-60 (MLA projections,
# bias=True default)
DEEPSEEK_REF_RULES = [
    ("main_model.emb_layer.weight", "tok_emb/w"),
    ("main_model.final_norm.scale", "final_norm/scale"),
    ("main_model.out_layer.weight", "out/w", T),
    # leaf rules first (they consume the '.att.'/'.norm_x.' dots) ...
    (".att.wq_down_proj.weight", "/att/wq_down/w", T),
    (".att.wq_down_proj.bias", "/att/wq_down/b"),
    (".att.wq_up_proj.weight", "/att/wq_up/w", T),
    (".att.wq_up_proj.bias", "/att/wq_up/b"),
    (".att.wq_decoup.weight", "/att/wq_decoup/w", T),
    (".att.wq_decoup.bias", "/att/wq_decoup/b"),
    (".att.wkv_down_proj.weight", "/att/wkv_down/w", T),
    (".att.wkv_down_proj.bias", "/att/wkv_down/b"),
    (".att.wk_up_proj.weight", "/att/wk_up/w", T),
    (".att.wk_up_proj.bias", "/att/wk_up/b"),
    (".att.wv_up_proj.weight", "/att/wv_up/w", T),
    (".att.wv_up_proj.bias", "/att/wv_up/b"),
    (".att.wk_decoup.weight", "/att/wk_decoup/w", T),
    (".att.wk_decoup.bias", "/att/wk_decoup/b"),
    (".att.out_proj.weight", "/att/out_proj/w", T),
    (".att.out_proj.bias", "/att/out_proj/b"),
    (".att.q_rms_norm.scale", "/att/q_norm/scale"),
    (".att.kv_rms_norm.scale", "/att/kv_norm/scale"),
    (".norm_1.scale", "/norm_1/scale"),
    (".norm_2.scale", "/norm_2/scale"),
    (".ffn.lin_gate.weight", "/ffn/gate/w", T),
    (".ffn.lin1.weight", "/ffn/up/w", T),
    (".ffn.lin2.weight", "/ffn/down/w", T),
    # MoE layers reuse the ".ffn." module name in the reference
    (".ffn.gate.weight", "/moe/gate_w", T),
    (".ffn.gate.bias", "/moe/gate_b"),
    (".ffn.biases", "/moe/biases"),
    # shared experts are VectorizedLinear — ALREADY stacked (n, in, out)
    (".ffn.shared_experts.lin1.weight", "/moe/shared/lin1"),
    (".ffn.shared_experts.lin1.bias", "/moe/shared/b1"),
    (".ffn.shared_experts.lin2.weight", "/moe/shared/lin2"),
    (".ffn.shared_experts.lin2.bias", "/moe/shared/b2"),
    (".rms_h_prev.scale", "/rms_h_prev/scale"),
    (".rms_input.scale", "/rms_input/scale"),
    (".down_proj.weight", "/down_proj/w", T),
    (".down_proj.bias", "/down_proj/b"),
    # ... then the container renames
    ("main_model.trf_blocks.", "blocks/"),
    ("mtp_modules.", "mtp/"),
    (".trf_block/", "/trf_block/"),
]


def load_ref_deepseek_v3(params, cfg, state_dict, *, log=print):
    target = flatten_params(params)
    ignored = _BUFFER_PREFIXES + tuple(
        f"mtp_modules.{i}.{leaf}" for i in range(cfg.get("mtp_depth", 0)) for leaf in ("emb_layer", "out_layer")
    )
    converted = convert_weights(state_dict, target, DEEPSEEK_REF_RULES, ignored_prefixes=ignored, log=log)
    converted.update(
        _gather_grouped_experts(
            state_dict,
            r"main_model\.trf_blocks\.(\d+)\.ffn\.(routed_experts)\.(\d+)\.(lin_gate|lin1|lin2)\.weight",
            expert_map=_EXPERT_MAP_DEEPSEEK,
        )
    )
    # expert-centroid bias (aux-free balancing) has no torch-side tensor match
    missing = report_loading_status(target, converted, log=log)
    missing = [m for m in missing if not m.endswith("centroid_bias")]
    assert not missing, f"unmapped target params: {missing}"
    return unflatten_into(params, converted)


# ---------------------------------------------------------- MiMo-V2-Flash

# reference: xiaomi/mimo_v2_flash_model.py (MainModel "layers", MTPModule
# with its own final_norm + shared emb/out), mimo_v2_flash_attention.py
# (sinks on SWA layers only)
MIMO_REF_RULES = [
    ("main_model.emb_layer.weight", "tok_emb/w"),
    ("main_model.final_norm.weight", "final_norm/scale"),
    ("main_model.out_head.weight", "out/w", T),
    (".att.sink", "/att/sink"),
    (".att.w_queries.weight", "/att/wq/w", T),
    (".att.w_keys.weight", "/att/wk/w", T),
    (".att.w_values.weight", "/att/wv/w", T),
    (".att.out_proj.weight", "/att/out_proj/w", T),
    (".att.q_norm.weight", "/att/q_norm/scale"),
    (".att.k_norm.weight", "/att/k_norm/scale"),
    (".norm1.weight", "/norm1/scale"),
    (".norm2.weight", "/norm2/scale"),
    (".feed_forward.lin_gate.weight", "/ffn/gate/w", T),
    (".feed_forward.lin1.weight", "/ffn/up/w", T),
    (".feed_forward.lin2.weight", "/ffn/down/w", T),
    (".feed_forward.gate.weight", "/moe/gate_w", T),
    (".feed_forward.gate.bias", "/moe/gate_b"),
    (".feed_forward.biases", "/moe/biases"),
    (".rms_h_prev.weight", "/rms_h_prev/scale"),
    (".rms_input.weight", "/rms_input/scale"),
    (".final_norm.weight", "/final_norm/scale"),
    (".down_proj.weight", "/down_proj/w", T),
    (".down_proj.bias", "/down_proj/b"),
    ("main_model.layers.", "blocks/"),
    ("mtp_modules.", "mtp/"),
    (".trf_block/", "/trf_block/"),
]


def load_ref_mimo(params, cfg, state_dict, *, log=print):
    target = flatten_params(params)
    ignored = _BUFFER_PREFIXES + tuple(
        f"mtp_modules.{i}.{leaf}" for i in range(cfg.get("mtp_depth", 0)) for leaf in ("emb_layer", "out_layer")
    )
    converted = convert_weights(state_dict, target, MIMO_REF_RULES, ignored_prefixes=ignored, log=log)
    converted.update(
        _gather_grouped_experts(
            state_dict,
            r"main_model\.layers\.(\d+)\.feed_forward\.(routed_experts|shared_experts)\.(\d+)\.(lin_gate|lin1|lin2)\.weight",
            expert_map=_EXPERT_MAP_DEEPSEEK,
        )
    )
    missing = report_loading_status(target, converted, log=log)
    missing = [m for m in missing if not m.endswith("centroid_bias")]
    assert not missing, f"unmapped target params: {missing}"
    return unflatten_into(params, converted)


# ------------------------------------------------------------- Qwen3.5 VLM

# reference: qwen/qwen3_5/qwen3_5_vision_model.py (Conv3d patch embed,
# nn.LayerNorm weight/bias → scale/shift, fused qkv, ViTMergeAdapter) — the
# text half reuses QWEN3_5_TEXT_REF_RULES on the "language_model." subtree
QWEN3_5_VISION_REF_RULES = [
    ("patch_embed.conv_proj.weight", "patch_embed/conv_w"),
    ("patch_embed.conv_proj.bias", "patch_embed/conv_b"),
    ("pos_embed.weight", "pos_embed/w"),
    ("merge_adapter.norm.weight", "merge/norm/scale"),
    ("merge_adapter.norm.bias", "merge/norm/shift"),
    ("merge_adapter.lin1.weight", "merge/lin1/w", T),
    ("merge_adapter.lin1.bias", "merge/lin1/b"),
    ("merge_adapter.lin2.weight", "merge/lin2/w", T),
    ("merge_adapter.lin2.bias", "merge/lin2/b"),
    ("blocks.", "blocks/"),
    (".norm1.weight", "/norm1/scale"),
    (".norm1.bias", "/norm1/shift"),
    (".norm2.weight", "/norm2/scale"),
    (".norm2.bias", "/norm2/shift"),
    (".att.qkv.weight", "/qkv/w", T),
    (".att.qkv.bias", "/qkv/b"),
    (".att.proj.weight", "/proj/w", T),
    (".att.proj.bias", "/proj/b"),
    (".ffn.lin1.weight", "/fc1/w", T),
    (".ffn.lin1.bias", "/fc1/b"),
    (".ffn.lin2.weight", "/fc2/w", T),
    (".ffn.lin2.bias", "/fc2/b"),
]


def load_ref_qwen3_5_vlm(params, state_dict, *, log=print):
    """Load a reference Qwen3_5VLM state_dict. The text and vision module
    trees reuse FFN/attention submodule names that map to DIFFERENT targets,
    so the two subtrees are converted separately."""
    text_sd = {
        k[len("language_model.") :]: v for k, v in state_dict.items() if k.startswith("language_model.")
    }
    vision_sd = {
        k[len("vision_model.") :]: v for k, v in state_dict.items() if k.startswith("vision_model.")
    }
    params = dict(params)
    params["text"] = load_ref_qwen3_5_text(params["text"], text_sd, log=log)

    target = flatten_params(params["vision"])
    converted = convert_weights(
        vision_sd, target, QWEN3_5_VISION_REF_RULES, ignored_prefixes=_BUFFER_PREFIXES, log=log
    )
    missing = report_loading_status(target, converted, log=log)
    assert not missing, f"unmapped vision params: {missing}"
    params["vision"] = unflatten_into(params["vision"], converted)
    return params


# -------------------------------------------------------------- Llama-3.2

# reference: gpt_to_llama3/ (RMSNorm param "scale"; FFN lin1=up, lin_gate=gate,
# lin2=down; out_head.weight is tied to emb_dict.weight → ignored duplicate)
LLAMA3_REF_RULES = [
    ("emb_dict.weight", "tok_emb/w"),
    ("final_norm.scale", "final_norm/scale"),
    ("trf_blocks.", "blocks/"),
    (".att.w_queries.weight", "/att/wq/w", T),
    (".att.w_keys.weight", "/att/wk/w", T),
    (".att.w_values.weight", "/att/wv/w", T),
    (".att.out_proj.weight", "/att/out_proj/w", T),
    (".att.out_proj.bias", "/att/out_proj/b"),
    (".norm_1.scale", "/pre_att_norm/scale"),
    (".norm_2.scale", "/pre_ffn_norm/scale"),
    (".ffn.lin_gate.weight", "/ffn/gate/w", T),
    (".ffn.lin1.weight", "/ffn/up/w", T),
    (".ffn.lin2.weight", "/ffn/down/w", T),
]


def load_ref_llama3(params, state_dict, *, log=print):
    target = flatten_params(params)
    converted = convert_weights(
        state_dict, target, LLAMA3_REF_RULES,
        ignored_prefixes=_BUFFER_PREFIXES + ("out_head.",), log=log,
    )
    missing = report_loading_status(target, converted, log=log)
    assert not missing, f"unmapped target params: {missing}"
    return unflatten_into(params, converted)


# --------------------------------------------------------------- Gemma-3

# reference: llama3_to_gemma3/ (4 RMSNorms per block; QK LayerNorm with
# scale+shift; GeGLU lin1=up, lin_gate=gate; tied out_head ignored)
GEMMA3_REF_RULES = [
    ("emb_dict.weight", "tok_emb/w"),
    ("final_norm.scale", "final_norm/scale"),
    ("trf_blocks.", "blocks/"),
    (".att.w_queries.weight", "/att/wq/w", T),
    (".att.w_keys.weight", "/att/wk/w", T),
    (".att.w_values.weight", "/att/wv/w", T),
    (".att.out_proj.weight", "/att/out_proj/w", T),
    (".att.out_proj.bias", "/att/out_proj/b"),
    (".att.q_norm.scale", "/att/q_norm/scale"),
    (".att.q_norm.shift", "/att/q_norm/shift"),
    (".att.k_norm.scale", "/att/k_norm/scale"),
    (".att.k_norm.shift", "/att/k_norm/shift"),
    (".pre_att_norm.scale", "/pre_att_norm/scale"),
    (".post_att_norm.scale", "/post_att_norm/scale"),
    (".pre_ffn_norm.scale", "/pre_ffn_norm/scale"),
    (".post_ffn_norm.scale", "/post_ffn_norm/scale"),
    (".ffn.lin_gate.weight", "/ffn/gate/w", T),
    (".ffn.lin1.weight", "/ffn/up/w", T),
    (".ffn.lin2.weight", "/ffn/down/w", T),
]


def load_ref_gemma3(params, state_dict, *, log=print):
    target = flatten_params(params)
    converted = convert_weights(
        state_dict, target, GEMMA3_REF_RULES,
        ignored_prefixes=_BUFFER_PREFIXES + ("out_head.", "swa_mask"), log=log,
    )
    missing = report_loading_status(target, converted, log=log)
    assert not missing, f"unmapped target params: {missing}"
    return unflatten_into(params, converted)


# ------------------------------------------------------------- ViT (scratch)

# reference: multimodal/vision_transformer/ (Conv2d patch embed kept in conv
# layout (d, c, p, p); GPT-style LayerNorm scale/shift; FFN layers.0/2)
VIT_REF_RULES = [
    ("patch_embedding.conv_proj.weight", "patch_emb/conv_w"),
    ("patch_embedding.conv_proj.bias", "patch_emb/conv_b"),
    ("patch_embedding.cls_token", "patch_emb/cls_token"),
    ("pos_embedding", "pos_emb"),
    ("final_ln.scale", "final_ln/scale"),
    ("final_ln.shift", "final_ln/shift"),
    ("classifier.weight", "classifier/w", T),
    ("classifier.bias", "classifier/b"),
    ("transformer_blocks.", "blocks/"),
    (".att.w_queries.weight", "/att/wq/w", T),
    (".att.w_queries.bias", "/att/wq/b"),
    (".att.w_keys.weight", "/att/wk/w", T),
    (".att.w_keys.bias", "/att/wk/b"),
    (".att.w_values.weight", "/att/wv/w", T),
    (".att.w_values.bias", "/att/wv/b"),
    (".att.out_proj.weight", "/att/out_proj/w", T),
    (".att.out_proj.bias", "/att/out_proj/b"),
    (".ln_1.scale", "/ln_1/scale"),
    (".ln_1.shift", "/ln_1/shift"),
    (".ln_2.scale", "/ln_2/scale"),
    (".ln_2.shift", "/ln_2/shift"),
    (".ffn.layers.0.weight", "/ffn/fc/w", T),
    (".ffn.layers.0.bias", "/ffn/fc/b"),
    (".ffn.layers.2.weight", "/ffn/proj/w", T),
    (".ffn.layers.2.bias", "/ffn/proj/b"),
]


def load_ref_vit(params, state_dict, *, log=print):
    target = flatten_params(params)
    converted = convert_weights(state_dict, target, VIT_REF_RULES, ignored_prefixes=_BUFFER_PREFIXES, log=log)
    missing = report_loading_status(target, converted, log=log)
    assert not missing, f"unmapped target params: {missing}"
    return unflatten_into(params, converted)
