"""HF/torch checkpoint interop: remap-rules engine + param-tree loading.

Behavioral parity with the reference (utils.py:923-1060,
gpt/gpt_download_weights.py:96-156, qwen3_weight_loading.py:19-114):

- download_hf_weights: snapshot download, sharded-index or single
  safetensors file (numpy-loaded — no torch needed)
- convert_weights: ordered substring remapping rules, first-exact-match
  break, shape checks with warnings, ignored prefixes, load reporting
- per-model rule sets (GPT-2, Qwen3 dense/MoE, Qwen3.5 text+vision)

Layout conversions the torch reference doesn't need:
- torch nn.Linear stores (out, in); our linears store (in, out) → rules can
  flag ``transpose=True`` (HF GPT-2's Conv1D already stores (in, out)).
- stacked-expert arrays: per-expert HF tensors ``...experts.N...`` are
  gathered into one (n_experts, ...) array per matrix.

Param pytrees address leaves by "/"-joined paths (blocks/0/att/wq/w) via
flatten_params / unflatten_params.
"""

import json
import os
import re

import jax.numpy as jnp
import numpy as np


def flatten_params(params, prefix=""):
    """Pytree → {path: array} with '/'-joined paths."""
    flat = {}
    if isinstance(params, dict):
        for k, v in params.items():
            flat.update(flatten_params(v, f"{prefix}{k}/"))
    elif isinstance(params, (list, tuple)):
        for i, v in enumerate(params):
            flat.update(flatten_params(v, f"{prefix}{i}/"))
    else:
        flat[prefix[:-1]] = params
    return flat


def unflatten_into(params, flat_updates):
    """Return a copy of params with leaves replaced by flat_updates entries."""

    def walk(node, prefix):
        if isinstance(node, dict):
            return {k: walk(v, f"{prefix}{k}/") for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return [walk(v, f"{prefix}{i}/") for i, v in enumerate(node)]
        path = prefix[:-1]
        if path in flat_updates:
            # jnp.array (NOT asarray): on the CPU backend asarray can alias the
            # source buffer zero-copy — if that buffer is a live torch-module
            # view, later in-place updates (e.g. MoE bias balancing in eval
            # forward, reference deepseek_moe.py:206-210) would silently mutate
            # the "loaded" parameter.
            return jnp.array(flat_updates[path], dtype=node.dtype)
        return node

    return walk(params, "")


def download_hf_weights(hf_model_name):
    """Snapshot-download a HF repo's safetensors as numpy arrays
    (reference: utils.py:923-954)."""
    from huggingface_hub import hf_hub_download, snapshot_download
    from safetensors.numpy import load_file

    repo_dir = snapshot_download(repo_id=hf_model_name)
    index_path = os.path.join(repo_dir, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        state = {}
        for filename in set(index["weight_map"].values()):
            state.update(load_file(os.path.join(repo_dir, filename)))
        return state
    return load_file(hf_hub_download(repo_id=hf_model_name, filename="model.safetensors"))


def convert_weights(src_state_dict, target_flat, remapping_rules, *, ignored_prefixes=(), log=print):
    """Ordered substring-rule remapping (reference: utils.py:956-997).

    remapping_rules: list of (pattern, replacement) or (pattern, replacement,
    transpose: bool). Returns {target_path: np array} of matched weights.
    """
    converted, skipped = {}, []
    for src_name, weight in src_state_dict.items():
        if ignored_prefixes and any(src_name.startswith(p) for p in ignored_prefixes):
            skipped.append(src_name)
            continue

        our_name = src_name
        transform = None
        for rule in remapping_rules:
            pattern, replacement = rule[0], rule[1]
            if pattern in our_name:
                our_name = our_name.replace(pattern, replacement)
                if len(rule) > 2 and rule[2]:
                    transform = rule[2]
                if pattern == src_name:
                    break

        w = np.asarray(weight)
        if transform is True and w.ndim == 2:
            w = w.T
        elif callable(transform):
            w = transform(w)
        if our_name in target_flat:
            if w.shape == tuple(target_flat[our_name].shape):
                converted[our_name] = w
            else:
                log(f"WARNING: Shape mismatch: {our_name}: src {w.shape} vs ours {tuple(target_flat[our_name].shape)}")
        else:
            log(f"WARNING: No match for weight '{src_name}' → tried '{our_name}'")

    if skipped:
        log(f"Skipped {len(skipped)} weights")
    return converted


def report_loading_status(target_flat, converted, *, log=print):
    """Loaded/missing report (reference: utils.py:1023-1034). Returns the
    missing-path list."""
    missing = [k for k in target_flat if k not in converted]
    log(f"Loaded {len(converted)}/{len(target_flat)} weights successfully")
    if missing:
        log(f"Missing keys ({len(missing)}): {missing[:20]}{'...' if len(missing) > 20 else ''}")
    return missing


# -------------------------------------------------------------- GPT-2 rules

# OpenAI-GPT-2-from-HF ("gpt2" repo): Conv1D weights already (in, out)
GPT2_HF_RULES = [
    ("wte.weight", "tok_emb/w"),
    ("wpe.weight", "pos_emb/w"),
    ("ln_f.weight", "final_ln/scale"),
    ("ln_f.bias", "final_ln/shift"),
    ("h.", "blocks/"),
    (".attn.c_proj.weight", "/att/out_proj/w"),
    (".attn.c_proj.bias", "/att/out_proj/b"),
    (".mlp.c_fc.weight", "/ffn/fc/w"),
    (".mlp.c_fc.bias", "/ffn/fc/b"),
    (".mlp.c_proj.weight", "/ffn/proj/w"),
    (".mlp.c_proj.bias", "/ffn/proj/b"),
    (".ln_1.weight", "/ln_1/scale"),
    (".ln_1.bias", "/ln_1/shift"),
    (".ln_2.weight", "/ln_2/scale"),
    (".ln_2.bias", "/ln_2/shift"),
]


def load_hf_gpt2(params, state_dict, *, log=print):
    """Load an HF GPT-2 state dict (handles the fused c_attn → wq/wk/wv split
    and out-head weight tying to wte). Returns new params."""
    target = flatten_params(params)
    converted = convert_weights(
        state_dict, target, GPT2_HF_RULES, ignored_prefixes=("h_bias",), log=lambda *_: None
    )

    # fused qkv split: c_attn weight (in, 3d), bias (3d,)
    for name, w in state_dict.items():
        m = re.match(r"h\.(\d+)\.attn\.c_attn\.(weight|bias)", name)
        if not m:
            continue
        i, kind = m.group(1), m.group(2)
        w = np.asarray(w)
        parts = np.split(w, 3, axis=-1)
        for part, proj in zip(parts, ("wq", "wk", "wv")):
            converted[f"blocks/{i}/att/{proj}/{'w' if kind == 'weight' else 'b'}"] = part

    # tied output head
    if "out/w" in target and "wte.weight" in state_dict:
        converted["out/w"] = np.asarray(state_dict["wte.weight"]).T  # (d, v)

    report_loading_status(target, converted, log=log)
    return unflatten_into(params, converted)


# -------------------------------------------------------------- Qwen3 rules


def qwen3_rules(cfg):
    """HF Qwen3 → our paths (reference: qwen3_weight_loading.py:19-86);
    torch Linear (out, in) → transpose."""
    t = True
    rules = [
        ("model.embed_tokens.weight", "tok_emb/w"),
        ("model.norm.weight", "final_norm/scale"),
        ("model.layers.", "blocks/"),
        (".self_attn.q_proj.weight", "/att/wq/w", t),
        (".self_attn.k_proj.weight", "/att/wk/w", t),
        (".self_attn.v_proj.weight", "/att/wv/w", t),
        (".self_attn.o_proj.weight", "/att/out_proj/w", t),
        (".self_attn.q_norm.weight", "/att/q_norm/scale"),
        (".self_attn.k_norm.weight", "/att/k_norm/scale"),
        (".input_layernorm.weight", "/pre_att_norm/scale"),
        (".post_attention_layernorm.weight", "/pre_ffn_norm/scale"),
    ]
    if not cfg["tie_embeddings"]:
        rules.append(("lm_head.weight", "out/w", t))
    if cfg.get("model_type", "dense") == "moe":
        rules += [
            (".mlp.gate.weight", "/moe/gate_w", t),
        ]
    else:
        rules += [
            (".mlp.gate_proj.weight", "/ffn/gate/w", t),
            (".mlp.up_proj.weight", "/ffn/up/w", t),
            (".mlp.down_proj.weight", "/ffn/down/w", t),
        ]
    return rules


def gather_stacked_experts(state_dict, layer_pattern, our_path_fmt, n_experts, *, mapping=None):
    """Per-expert HF tensors → stacked (n_experts, in, out) arrays.

    layer_pattern: regex with groups (layer, expert, proj) e.g.
    r"model\\.layers\\.(\\d+)\\.mlp\\.experts\\.(\\d+)\\.(gate_proj|up_proj|down_proj)\\.weight".
    our_path_fmt: e.g. "blocks/{layer}/moe/experts/{proj}" with mapping
    {"gate_proj": "gate", ...}. Returns {our_path: stacked np array}.
    """
    mapping = mapping or {"gate_proj": "gate", "up_proj": "lin1", "down_proj": "lin2"}
    buckets = {}
    for name, w in state_dict.items():
        m = re.match(layer_pattern, name)
        if not m:
            continue
        layer, expert, proj = m.group(1), int(m.group(2)), m.group(3)
        key = our_path_fmt.format(layer=layer, proj=mapping[proj])
        buckets.setdefault(key, {})[expert] = np.asarray(w).T  # (in, out)
    out = {}
    for key, experts in buckets.items():
        out[key] = np.stack([experts[i] for i in range(n_experts)])
    return out


def load_hf_qwen3(params, cfg, state_dict, *, log=print):
    """Load an HF Qwen3 (dense or MoE) state dict into our params."""
    target = flatten_params(params)
    converted = convert_weights(state_dict, target, qwen3_rules(cfg), log=lambda *_: None)
    if cfg.get("model_type", "dense") == "moe":
        converted.update(
            gather_stacked_experts(
                state_dict,
                r"model\.layers\.(\d+)\.mlp\.experts\.(\d+)\.(gate_proj|up_proj|down_proj)\.weight",
                "blocks/{layer}/moe/experts/{proj}",
                cfg["num_experts"],
                mapping={"gate_proj": "gate", "up_proj": "lin1", "down_proj": "lin2"},
            )
        )
    report_loading_status(target, converted, log=log)
    return unflatten_into(params, converted)


# ------------------------------------------------------------- Qwen3.5 rules


def _squeeze1(w):
    return w[:, 0, :]  # torch depthwise Conv1d (c, 1, k) → (c, k)


def qwen3_5_text_rules():
    """HF Qwen3.5 text → our paths (reference: qwen3_5_weight_loading.py:20-56)."""
    t = True
    return [
        ("model.language_model.embed_tokens.weight", "tok_emb/w"),
        ("model.language_model.norm.weight", "final_norm/scale"),
        ("model.language_model.layers.", "blocks/"),
        (".input_layernorm.weight", "/norm1/scale"),
        (".post_attention_layernorm.weight", "/norm2/scale"),
        # full attention (HF q_proj is fused [query ‖ gate])
        (".self_attn.q_proj.weight", "/att/wqg/w", t),
        (".self_attn.k_proj.weight", "/att/wk/w", t),
        (".self_attn.v_proj.weight", "/att/wv/w", t),
        (".self_attn.o_proj.weight", "/att/out_proj/w", t),
        (".self_attn.q_norm.weight", "/att/q_norm/scale"),
        (".self_attn.k_norm.weight", "/att/k_norm/scale"),
        # FusedGatedDeltaNet
        (".linear_attn.A_log", "/att/log_A"),
        (".linear_attn.dt_bias", "/att/dt_bias"),
        (".linear_attn.in_proj_qkv.weight", "/att/w_qkv/w", t),
        (".linear_attn.in_proj_z.weight", "/att/w_gate/w", t),
        (".linear_attn.in_proj_b.weight", "/att/w_beta/w", t),
        (".linear_attn.in_proj_a.weight", "/att/w_alpha/w", t),
        (".linear_attn.conv1d.weight", "/att/conv1d/w", _squeeze1),
        (".linear_attn.norm.weight", "/att/post_norm/scale"),
        (".linear_attn.out_proj.weight", "/att/out_proj/w", t),
        # dense MLP
        (".mlp.gate_proj.weight", "/ffn/gate/w", t),
        (".mlp.up_proj.weight", "/ffn/up/w", t),
        (".mlp.down_proj.weight", "/ffn/down/w", t),
    ]


def qwen3_5_vision_rules():
    """HF Qwen3.5 vision → our paths (reference: :58-80)."""
    t = True
    return [
        ("model.visual.patch_embed.proj.weight", "patch_embed/conv_w"),
        ("model.visual.patch_embed.proj.bias", "patch_embed/conv_b"),
        ("model.visual.pos_embed.weight", "pos_embed/w"),
        ("model.visual.blocks.", "blocks/"),
        (".attn.qkv.weight", "/qkv/w", t),
        (".attn.qkv.bias", "/qkv/b"),
        (".attn.proj.weight", "/proj/w", t),
        (".attn.proj.bias", "/proj/b"),
        (".mlp.linear_fc1.weight", "/fc1/w", t),
        (".mlp.linear_fc1.bias", "/fc1/b"),
        (".mlp.linear_fc2.weight", "/fc2/w", t),
        (".mlp.linear_fc2.bias", "/fc2/b"),
        (".norm1.weight", "/norm1/scale"),
        (".norm1.bias", "/norm1/shift"),
        (".norm2.weight", "/norm2/scale"),
        (".norm2.bias", "/norm2/shift"),
        ("model.visual.merger.norm.weight", "merge/norm/scale"),
        ("model.visual.merger.norm.bias", "merge/norm/shift"),
        ("model.visual.merger.linear_fc1.weight", "merge/lin1/w", t),
        ("model.visual.merger.linear_fc1.bias", "merge/lin1/b"),
        ("model.visual.merger.linear_fc2.weight", "merge/lin2/w", t),
        ("model.visual.merger.linear_fc2.bias", "merge/lin2/b"),
    ]


def load_hf_qwen3_5_vlm(params, cfg, state_dict, *, log=print):
    """Load text + vision weights into the {"vision", "text"} VLM pytree
    (reference: :119-178)."""
    text_target = flatten_params(params["text"])
    text_conv = convert_weights(
        state_dict, text_target, qwen3_5_text_rules(),
        ignored_prefixes=("model.visual.", "mtp."), log=lambda *_: None,
    )
    vision_target = flatten_params(params["vision"])
    vision_conv = convert_weights(
        state_dict, vision_target, qwen3_5_vision_rules(),
        ignored_prefixes=("model.language_model.", "lm_head.", "mtp."), log=lambda *_: None,
    )
    report_loading_status({**{f"text/{k}": v for k, v in text_target.items()},
                           **{f"vision/{k}": v for k, v in vision_target.items()}},
                          {**{f"text/{k}": v for k, v in text_conv.items()},
                           **{f"vision/{k}": v for k, v in vision_conv.items()}}, log=log)
    return {
        "text": unflatten_into(params["text"], text_conv),
        "vision": unflatten_into(params["vision"], vision_conv),
    }
