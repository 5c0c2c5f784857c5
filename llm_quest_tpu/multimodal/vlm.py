"""ViT→GPT-2 VLM: adapter, early fusion, captioning loss and generation.

Behavioral parity with the reference (multimodal/vit_engine.py:9-59,
vlm_engine.py:5-316, vlm_generation.py:7-96):

- ViTAdapter: "simple" linear or "ffn" (1-hidden GELU) projector from the
  ViT hidden dim to the LLM embedding dim
- early fusion: [vision embeddings ‖ text embeddings] fed to GPT-2 via its
  ``input_embedded`` entry; vision positions always attended
- vlm_loss: CE on logits sliced [num_vision_tokens−1 : −1] (the last vision
  token predicts the first text token), padding masked to −100
- generation: autoregressive captioning in embedding space

TPU redesign: generation prefills the fused sequence into the static KV
cache once and scans single-token steps (the reference re-runs the full
fused sequence each step, vlm_generation.py:63-86).
"""

import jax
import jax.numpy as jnp
from jax import lax

from llm_quest_tpu.models import gpt2
from llm_quest_tpu.ops.activations import gelu_erf
from llm_quest_tpu.ops.linear import init_linear, linear
from llm_quest_tpu.ops.losses import cross_entropy
from llm_quest_tpu.ops import sampling as sampling_ops


def init_adapter(key, vit_d_out, llm_d_in, *, adapter_type="simple", hidden_size_factor=4, bias=False,
                 dtype=jnp.float32):
    if adapter_type == "simple":
        return {"proj": init_linear(key, vit_d_out, llm_d_in, bias=bias, dtype=dtype)}
    if adapter_type == "ffn":
        k1, k2 = jax.random.split(key)
        hidden = vit_d_out * hidden_size_factor
        return {
            "fc": init_linear(k1, vit_d_out, hidden, bias=bias, dtype=dtype),
            "proj": init_linear(k2, hidden, llm_d_in, bias=bias, dtype=dtype),
        }
    raise ValueError(f"Invalid adapter type: {adapter_type}")


def adapter_apply(params, x):
    # adapter type inferred from structure ("fc" present → ffn) so params
    # stay a pure array pytree (jax.grad-able)
    if "fc" in params:
        return linear(params["proj"], gelu_erf(linear(params["fc"], x)))
    return linear(params["proj"], x)


def fuse(vit_model, vit_params, vit_cfg, adapter_params, llm_params, images, input_ids, text_attention_mask):
    """Encode images, project, early-fuse with text embeddings.

    Returns (combined_embeddings, combined_mask, num_vision_tokens)."""
    vit_hidden = vit_model.apply(vit_params, vit_cfg, images, output_hidden_states=True)
    vit_hidden = jax.lax.stop_gradient(vit_hidden)  # frozen ViT (reference: vlm_engine.py:81-83)
    vision_emb = adapter_apply(adapter_params, vit_hidden)  # (b, Nv, llm_d)

    text_emb = llm_params["tok_emb"]["w"][input_ids]
    combined = jnp.concatenate([vision_emb.astype(text_emb.dtype), text_emb], axis=1)

    b, nv = vision_emb.shape[:2]
    vision_mask = jnp.ones((b, nv), bool)
    combined_mask = jnp.concatenate([vision_mask, text_attention_mask.astype(bool)], axis=1)
    return combined, combined_mask, nv


def vlm_loss(logits, labels, text_attention_mask, num_vision_tokens):
    """CE over text positions; last vision token predicts the first text
    token (reference: vlm_engine.py:23-42)."""
    shifted = logits[:, num_vision_tokens - 1 : -1, :]
    labels = jnp.where(text_attention_mask.astype(bool), labels, -100)
    return cross_entropy(shifted.reshape(-1, shifted.shape[-1]), labels.reshape(-1))


def vlm_forward_loss(vit_model, vit_params, vit_cfg, adapter_params, llm_params, llm_cfg, batch):
    """One fused forward + captioning loss. batch: {"image", "input_ids",
    "attention_mask"}."""
    combined, mask, nv = fuse(
        vit_model, vit_params, vit_cfg, adapter_params, llm_params,
        batch["image"], batch["input_ids"], batch["attention_mask"],
    )
    logits, _, _ = gpt2.apply(llm_params, llm_cfg, combined, attn_mask=mask, input_embedded=True)
    return vlm_loss(logits, batch["input_ids"], batch["attention_mask"], nv)


def vlm_generate(
    vit_model, vit_params, vit_cfg, adapter_params, llm_params, llm_cfg, images, bos_id,
    *, max_gen=30, eos_id=None, pad_id=50256,
):
    """Greedy caption generation with KV cache: encode image once, prefill
    the fused [vision ‖ BOS] sequence, then scan 1-token steps."""
    b = images.shape[0]
    vit_hidden = vit_model.apply(vit_params, vit_cfg, images, output_hidden_states=True)
    vision_emb = adapter_apply(adapter_params, vit_hidden)
    bos_emb = llm_params["tok_emb"]["w"][jnp.full((b, 1), bos_id)]
    combined = jnp.concatenate([vision_emb.astype(bos_emb.dtype), bos_emb], axis=1)

    prefill_len = combined.shape[1]
    max_total = prefill_len + max_gen
    cache = gpt2.init_cache(llm_cfg, b, max_total)
    mask_buf = jnp.concatenate([jnp.ones((b, prefill_len), bool), jnp.zeros((b, max_gen), bool)], axis=1)

    logits, cache, _ = gpt2.apply(llm_params, llm_cfg, combined, attn_mask=mask_buf, cache=cache, input_embedded=True)
    logits = logits[:, -1]

    eos = -1 if eos_id is None else eos_id
    finished = jnp.zeros((b,), bool)

    def step(carry, i):
        cache, mask_buf, finished, logits = carry
        tok = sampling_ops.greedy_argmax(logits)
        tok = jnp.where(finished, pad_id, tok)
        finished = finished | (tok == eos)
        mask_buf = mask_buf.at[:, prefill_len + i].set(~finished)
        # embedding-space step; input_embedded bypasses positional embeddings
        # entirely, matching the reference fused path (gpt_model.py:74-77)
        emb = llm_params["tok_emb"]["w"][tok[:, None]]
        logits_new, cache, _ = gpt2.apply(
            llm_params, llm_cfg, emb, attn_mask=mask_buf, cache=cache, input_embedded=True
        )
        return (cache, mask_buf, finished, logits_new[:, 0]), tok

    (_, _, _, _), tokens = lax.scan(step, (cache, mask_buf, finished, logits), jnp.arange(max_gen))
    return tokens.T  # (b, max_gen)
