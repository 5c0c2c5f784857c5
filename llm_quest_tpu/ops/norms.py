"""Normalization layers.

Numerics notes (parity with the reference is formula-level, not code-level):

- ``layer_norm``: GPT-2 variant normalizing by (std + eps) with biased std, NOT
  sqrt(var + eps) (reference: gpt/gpt_transformer_block.py:35-39). The two
  differ slightly; we keep the reference formula as the parity oracle.
- ``rms_norm``: Llama-style, fp32 mean-square island, scale applied in input
  dtype (reference: gpt_to_llama3/llama_transformer_block.py:15-38).
- ``rms_norm_torch_parity``: full-fp32 wrapper matching torch's nn.RMSNorm /
  HF Qwen3 cast behavior — everything incl. the weight multiply in fp32, cast
  at the end (reference: qwen/qwen3/qwen3_attention.py:8-29).
- ``zero_centered_rms_norm``: Qwen3-Next (1 + weight) RMSNorm with
  zero-initialized weight (reference: qwen3_next_attention.py:20-46).
- ``dynamic_tanh``: DyT γ·tanh(αx)+β normalization-free layer
  (reference: common/dynamic_tanh.py:10-35).
"""

import jax.numpy as jnp
from jax import lax


def init_layer_norm(dim, *, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "shift": jnp.zeros((dim,), dtype)}


def layer_norm(params, x, *, eps=1e-5):
    """GPT-2 LayerNorm: scale * (x - mean)/(std + eps) + shift, biased std."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    std = jnp.sqrt(jnp.var(x, axis=-1, keepdims=True))  # biased, torch.std(unbiased=False)
    norm_x = (x - mean) / (std + eps)
    return params["scale"] * norm_x + params["shift"]


def layer_norm_torch(params, x, *, eps=1e-6):
    """Standard torch nn.LayerNorm: (x − μ)/sqrt(σ² + eps)·γ + β — eps INSIDE
    the sqrt, unlike the GPT-2 (std + eps) variant above. Used by the Qwen3.5
    vision tower (reference: qwen3_5_vision_model.py:224-226, nn.LayerNorm)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    norm_x = (x - mean) * lax.rsqrt(var + eps)
    return params["scale"] * norm_x + params["shift"]


def init_rms_norm(dim, *, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype)}


def rms_norm(params, x, *, eps=1e-6):
    """Llama-style RMSNorm: fp32 mean-square island, eps added OUTSIDE the
    sqrt — x / (RMS(x) + eps) — and partial cast (scale applied after casting
    the normed value back), matching the reference formula exactly
    (reference: gpt_to_llama3/llama_transformer_block.py:28-38)."""
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    rms = jnp.sqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True))
    normed = x32 / (rms + eps)
    return (params["scale"] * normed.astype(dt)).astype(dt)


def rms_norm_torch_parity(params, x, *, eps=1e-6):
    """HF/torch nn.RMSNorm cast parity: the whole op (incl. weight multiply)
    runs in fp32, result cast back to input dtype
    (reference: qwen3_attention.py:8-29 — keeps HF logit parity for Qwen3)."""
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    ms = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    normed = x32 * lax.rsqrt(ms + eps)
    out = params["scale"].astype(jnp.float32) * normed
    return out.astype(dt)


def init_zero_centered_rms_norm(dim, *, dtype=jnp.float32):
    """Weight initialized to ZERO; effective scale is (1 + weight)."""
    return {"scale": jnp.zeros((dim,), dtype)}


def zero_centered_rms_norm(params, x, *, eps=1e-6):
    """Qwen3-Next ZeroCenteredRMSNorm: fp32 compute, (1+weight) scaling
    (reference: qwen3_next_attention.py:20-46)."""
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    ms = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    normed = x32 * lax.rsqrt(ms + eps)
    out = (1.0 + params["scale"].astype(jnp.float32)) * normed
    return out.astype(dt)


def l2_norm(x, *, eps=1e-6):
    """L2 normalize along the last dim (Qwen3-Next q/k normalization,
    reference: qwen3_next_attention.py:51-67)."""
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    inv = lax.rsqrt(jnp.sum(x32 * x32, axis=-1, keepdims=True) + eps)
    return (x32 * inv).astype(dt)


def init_dynamic_tanh(dim, *, alpha0=0.5, dtype=jnp.float32):
    return {
        "alpha": jnp.asarray(alpha0, dtype),
        "gamma": jnp.ones((dim,), dtype),
        "beta": jnp.zeros((dim,), dtype),
    }


def dynamic_tanh(params, x):
    """DyT: γ * tanh(α x) + β (reference: common/dynamic_tanh.py:10-35)."""
    return params["gamma"] * jnp.tanh(params["alpha"] * x) + params["beta"]
