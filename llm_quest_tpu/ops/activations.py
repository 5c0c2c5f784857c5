"""Activation functions.

- ``gelu_erf``: exact GELU x·Φ(x) via erf (reference GPT-2 uses the erf form,
  gpt/gpt_transformer_block.py:42-60).
- ``gelu_tanh``: tanh approximation (Qwen3.5 vision FFN, ViT).
- ``silu``: x·sigmoid(x) (Llama/Qwen SwiGLU gates).
- ``softplus``: used by the GatedDeltaNet decay computation.
"""

import jax
import jax.numpy as jnp


def gelu_erf(x):
    return x * 0.5 * (1.0 + jax.lax.erf(x / jnp.sqrt(2.0).astype(x.dtype)))


def gelu_tanh(x):
    c = jnp.sqrt(2.0 / jnp.pi).astype(x.dtype)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


def silu(x):
    return x * jax.nn.sigmoid(x)


def softplus(x):
    return jax.nn.softplus(x)


def softcap(x, cap):
    """Logits soft-capping: cap * tanh(x / cap)
    (reference: llama3_to_gemma3/logits_softcapping.py:8-19)."""
    return cap * jnp.tanh(x / cap)
