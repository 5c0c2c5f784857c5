"""Feed-forward blocks shared across architectures.

- ``mlp_gelu``: GPT-2/ViT two-layer FFN with GELU
  (reference: gpt/gpt_transformer_block.py:63-84).
- ``swiglu``: Llama/Qwen gated FFN silu(x·W_gate) ⊙ (x·W_up) · W_down
  (reference: gpt_to_llama3/llama_transformer_block.py:41-107).
"""

import jax
import jax.numpy as jnp

from llm_quest_tpu.ops.activations import gelu_erf, gelu_tanh, silu
from llm_quest_tpu.ops.linear import init_linear, linear


def init_mlp_gelu(key, emb_dim, hidden_dim, *, bias=True, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "fc": init_linear(k1, emb_dim, hidden_dim, bias=bias, dtype=dtype),
        "proj": init_linear(k2, hidden_dim, emb_dim, bias=bias, dtype=dtype),
    }


def mlp_gelu(params, x, *, tanh_approx=False):
    act = gelu_tanh if tanh_approx else gelu_erf
    return linear(params["proj"], act(linear(params["fc"], x)))


def init_swiglu(key, emb_dim, hidden_dim, *, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "gate": init_linear(k1, emb_dim, hidden_dim, bias=False, dtype=dtype),
        "up": init_linear(k2, emb_dim, hidden_dim, bias=False, dtype=dtype),
        "down": init_linear(k3, hidden_dim, emb_dim, bias=False, dtype=dtype),
    }


def swiglu(params, x):
    return linear(params["down"], silu(linear(params["gate"], x)) * linear(params["up"], x))
