"""Analytic model-FLOPs accounting → MFU / MBU reporting.

The reference instruments throughput only as raw tok/s + memory GB
(reference: engine.py:270-374); it has no utilization readout. On TPU the
meaningful completion of that subsystem is hardware-utilization numbers:

- **MFU** (model FLOPs utilization): achieved matmul FLOP/s over the chip's
  peak — the right lens for training and batched encode, which are
  compute-bound.
- **MBU** (model bandwidth utilization): achieved HBM byte/s over peak
  bandwidth — the right lens for small-batch autoregressive decode, which
  streams the weights once per token and is bandwidth-bound (MFU at b=1
  decode is <1% on ANY hardware; quoting it alone would be misleading).

FLOP counts are analytic from the model config (matmul FLOPs only — norms,
softmax, activations, and RoPE are VPU noise next to the MXU terms), using
the standard 2·m·n·k per matmul and 3× forward for a train step
(backward ≈ 2× forward).
"""

import jax


# ---------------------------------------------------------------- hardware

# (peak dense-matmul FLOP/s by dtype, peak HBM GB/s) per device kind.
# v5e: 197 bf16 TFLOP/s / 394 int8 TOP/s, 819 GB/s HBM.
_DEVICE_PEAKS = {
    "TPU v5 lite": {"bf16": 197e12, "int8": 394e12, "hbm_gbps": 819.0},
    # v5p / v4 entries for portability of the helper (not the bench target)
    "TPU v5p": {"bf16": 459e12, "int8": 918e12, "hbm_gbps": 2765.0},
    "TPU v4": {"bf16": 275e12, "int8": 275e12, "hbm_gbps": 1228.0},
}
_DEFAULT_PEAK = _DEVICE_PEAKS["TPU v5 lite"]


def device_peaks(device=None):
    """Peak-rate dict for the local device kind (v5e numbers as fallback —
    CPU-mesh test runs still get deterministic, comparable ratios)."""
    try:
        kind = (device or jax.devices()[0]).device_kind
    except Exception:
        kind = ""
    return _DEVICE_PEAKS.get(kind, _DEFAULT_PEAK)


def mfu(rate_per_sec, flops_per_unit, *, dtype="bf16", device=None):
    """Fraction of peak matmul throughput: (units/s · FLOPs/unit) / peak."""
    return rate_per_sec * flops_per_unit / device_peaks(device)[dtype]


def mbu(tok_per_sec, bytes_per_token, *, device=None):
    """Fraction of peak HBM bandwidth streamed by decode (weights + state
    read once per token). Lower bound: ignores activation traffic."""
    return tok_per_sec * bytes_per_token / (device_peaks(device)["hbm_gbps"] * 1e9)


def param_bytes(params):
    """Total on-device bytes of a param pytree (int8-quantized trees count
    their scales too — whatever is streamed is what's counted)."""
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))


# ---------------------------------------------------------- text models


def _ffn_flops(cfg):
    """Per-token FLOPs of one FFN/MoE sublayer."""
    d = cfg["emb_dim"]
    if cfg.get("model_type") == "moe" or ("num_experts" in cfg and "moe_hidden_dim" in cfg):
        e, k = cfg["num_experts"], cfg["top_k"]
        ff = cfg["moe_hidden_dim"]
        router = 2 * d * e
        experts = k * 3 * 2 * d * ff  # SwiGLU: gate/up/down per routed expert
        shared = 3 * 2 * d * cfg["shared_expert_hidden_dim"] if cfg.get("shared_expert_hidden_dim") else 0
        return router + experts + shared
    if "hidden_dim" in cfg:
        return 3 * 2 * d * cfg["hidden_dim"]  # SwiGLU
    return 2 * 2 * d * 4 * d  # GPT-2 GELU MLP (up+down at 4d)


def _attn_layer_flops(cfg, kv_len):
    """Per-token FLOPs of one full-attention sublayer at context kv_len."""
    d = cfg["emb_dim"]
    nq = cfg["n_heads"]
    hd = cfg.get("head_dim", d // nq)
    vhd = cfg.get("value_head_dim", hd)
    nkv = cfg.get("num_kv_groups", nq)
    gated = "linear_sdpa_ratio" in cfg  # hybrids fuse a sigmoid out-gate with Q
    q = 2 * d * nq * hd * (2 if gated else 1)
    kv = 2 * d * nkv * (hd + vhd)
    o = 2 * nq * vhd * d
    scores = 2 * kv_len * nq * (hd + vhd)  # QKᵀ + AV
    return q + kv + o + scores


def _gdn_layer_flops(cfg):
    """Per-token FLOPs of one GatedDeltaNet sublayer (decode-step form;
    the chunked training form does the same MACs reassociated)."""
    d = cfg["emb_dim"]
    nqk, dk = cfg["linear_num_qk_heads"], cfg["linear_qk_head_dim"]
    nv, dv = cfg["linear_num_value_heads"], cfg["linear_value_head_dim"]
    fused = 2 * nqk * dk + 2 * nv * dv + 2 * nv  # q,k,v,z,b,a fused in-proj
    in_proj = 2 * d * fused
    conv = 2 * cfg["linear_conv_kernel_size"] * (2 * nqk * dk + nv * dv)
    # delta rule per head: S@k, β(v−S@k)kᵀ outer, decay scale, q@S ≈ 4 dk·dv MACs
    delta = 8 * nv * dk * dv
    out = 2 * nv * dv * d
    return in_proj + conv + delta + out


def text_forward_flops_per_token(cfg, *, kv_len):
    """Forward matmul FLOPs per generated/processed token at attention
    context kv_len. Covers dense MHA/GQA (GPT-2/Llama/Gemma/Qwen3), MoE
    FFNs, and the GDN/attention hybrids (Qwen3-Next, Qwen3.5 text)."""
    layers = cfg["n_layers"]
    ratio = cfg.get("linear_sdpa_ratio")
    n_attn = layers // ratio if ratio else layers
    n_gdn = layers - n_attn
    total = n_attn * _attn_layer_flops(cfg, kv_len)
    if n_gdn:
        total += n_gdn * _gdn_layer_flops(cfg)
    total += layers * _ffn_flops(cfg)
    total += 2 * cfg["emb_dim"] * cfg["vocab_size"]  # LM head
    return total


def text_train_flops_per_token(cfg, *, seq_len):
    """Train-step FLOPs per token: 3× forward (bwd ≈ 2× fwd), causal
    attention averaged over positions (mean context = seq_len/2)."""
    return 3 * text_forward_flops_per_token(cfg, kv_len=seq_len // 2)


def decode_bytes_per_token(params, cfg, *, kv_len, batch=1):
    """HBM bytes streamed per decode step ÷ batch: full weight pass plus the
    per-sequence KV read at context kv_len (hybrid GDN state included)."""
    weights = param_bytes(params)
    ratio = cfg.get("linear_sdpa_ratio")
    layers = cfg["n_layers"]
    n_attn = layers // ratio if ratio else layers
    nkv = cfg.get("num_kv_groups", cfg["n_heads"])
    hd = cfg.get("head_dim", cfg["emb_dim"] // cfg["n_heads"])
    vhd = cfg.get("value_head_dim", hd)
    itemsize = 2  # bf16 cache (int8 KV halves this — callers may override)
    kv = n_attn * kv_len * nkv * (hd + vhd) * itemsize
    state = 0
    if ratio:
        nv, dk, dv = (cfg["linear_num_value_heads"], cfg["linear_qk_head_dim"],
                      cfg["linear_value_head_dim"])
        state = (layers - n_attn) * nv * dk * dv * 4  # fp32 recurrent state read
    # one weight pass per step is shared by the whole batch; cache reads are
    # per sequence
    return weights // batch + kv + state


# ----------------------------------------------------------------- vision


def vit_flops_per_image(cfg):
    """Forward matmul FLOPs per image for the scratch ViT (CLS + patches,
    bidirectional attention, GELU MLP at 4·d)."""
    p = cfg["patch_size"]
    n_patches = (cfg["img_height"] // p) * (cfg["img_width"] // p)
    n = n_patches + 1  # CLS
    d = cfg["emb_dim"]
    patchify = 2 * n_patches * cfg["num_channels"] * p * p * d
    per_layer = n * (8 * d * d + 16 * d * d) + 4 * n * n * d  # QKVO+MLP / scores
    head = 2 * d * cfg["num_classes"]
    return patchify + cfg["n_layers"] * per_layer + head


def vit_train_flops_per_image(cfg):
    return 3 * vit_flops_per_image(cfg)
