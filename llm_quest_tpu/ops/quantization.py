"""Weight-only int8 quantization for serving (TPU-native, beyond the reference).

Small-batch decode is HBM-bandwidth-bound: every generated token re-reads
every weight matrix once, so bytes-per-weight — not FLOPs — sets the
tokens/sec ceiling. Storing linear weights as int8 (+ a per-output-channel
fp32 scale) halves the bytes vs bf16; XLA fuses the int8→bf16 convert into
the dot's operand read, so the weights stream from HBM at 1 byte/element and
never materialize in bf16.

Design (contrast with the reference, which has no quantization):
- **Symmetric per-channel** scales over the contraction dim: because the
  scale depends only on the OUTPUT column, ``y = (x @ w_q) * scale`` is exact
  dequantization applied *after* the matmul — a free (out,)-vector epilogue,
  no per-element dequant tensor.
- **Optional sub-channel blocks** (``block_size``): scale shape
  (in/block, out) for tighter error on long contraction dims; the matmul
  becomes a blocked einsum with the scale contraction as the final reduce.
- **Pytree transform, not a model change**: ``quantize_params_int8`` walks
  any model's params and rewrites ``{"w": (in, out)}`` linears to
  ``{"w_q": int8, "w_scale": fp32}``; ``ops.linear.linear`` dispatches on the
  ``"w_q"`` key, so every model (and the shared decode engine) serves
  quantized checkpoints unchanged.

Excluded by default: embeddings (``tok_emb`` — row-gather, not a matmul) and
the depthwise conv taps (``conv*`` — tiny, VPU-bound). Biases and LoRA
adapters pass through in full precision.

Tied-head models (Qwen3/Qwen3.5/Llama-3.2/Gemma-3 configs set
``tie_embeddings``) compute logits as ``h @ tok_emb.w.T`` — so the
embedding table IS streamed from HBM once per decode step like any other
linear (508 MB bf16 at Qwen3.5-0.8B's 248,320 vocab: the single largest
matrix in the model). ``quantize_embeddings=True`` quantizes it with
per-ROW scales, which serve both uses exactly: the head matmul's output
channel is the vocab row (``(h @ w_q.T) * scale`` — free vector epilogue,
ops/linear.py::tied_head) and the input gather dequants only the rows it
touches (ops/linear.py::embedding).

Note on TP serving: the sharding path-rules (parallel/sharding.py) match
both ``w`` and ``w_q``/``w_scale`` suffixes, so tensor-parallel decode of a
quantized checkpoint shards the int8 weights the same way.
"""

import re
from typing import NamedTuple

import jax
import jax.numpy as jnp


class QuantKV(NamedTuple):
    """An int8-quantized attention operand: ``data`` (…, d) int8 with
    per-row symmetric ``scale`` (…) fp32. Returned by the quantized KV
    cache (inference/cache.py) in place of the bf16 k/v views; a plain
    pytree, so it flows through jit/scan carries unchanged. The attention
    router either streams it through the flash-decode kernel
    (kernels/flash_decode.py) or falls back to ``dequant``."""

    data: jax.Array
    scale: jax.Array

    @property
    def shape(self):
        return self.data.shape

    def dequant(self, dtype):
        return self.data.astype(dtype) * self.scale[..., None].astype(dtype)


def quantize_rows_int8(x):
    """Symmetric per-row (last-dim absmax) int8 quantization of activations
    — the KV-cache write-time transform. Returns (int8 data, fp32 scales
    shaped x.shape[:-1])."""
    x32 = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(x32 / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def _qdtype(bits):
    assert bits in (8, 4), bits
    return (jnp.int8, 127.0) if bits == 8 else (jnp.int4, 7.0)


def quantize_linear_int8(p, *, block_size=None, bits=8):
    """{"w": (in, out) fp[, "b", "lora"]} → {"w_q": int8/int4, "w_scale": fp32, ...}.

    Symmetric round-to-nearest onto [-qmax, qmax] (127 for int8, 7 for
    int4 — XLA packs s4 two-per-byte in HBM, another 2× on weight
    bandwidth; pair int4 with ``block_size`` ≤128 sub-channel scales to
    keep the error usable). ``block_size`` groups the contraction dim into
    in//block_size sub-channels per output column (requires
    in % block_size == 0); None = one scale per output column.
    """
    dtype, qmax = _qdtype(bits)
    w = jnp.asarray(p["w"], jnp.float32)
    d_in, d_out = w.shape
    if block_size is not None:
        assert d_in % block_size == 0, (d_in, block_size)
        nb = d_in // block_size
        wb = w.reshape(nb, block_size, d_out)
        scale = jnp.max(jnp.abs(wb), axis=1) / qmax  # (nb, out)
        scale = jnp.maximum(scale, 1e-12)
        w_q = jnp.clip(jnp.round(wb / scale[:, None, :]), -qmax, qmax)
        w_q = w_q.astype(dtype).reshape(d_in, d_out)
    else:
        scale = jnp.max(jnp.abs(w), axis=0) / qmax  # (out,)
        scale = jnp.maximum(scale, 1e-12)
        w_q = jnp.clip(jnp.round(w / scale[None, :]), -qmax, qmax).astype(dtype)
    out = {"w_q": w_q, "w_scale": scale.astype(jnp.float32)}
    for k in p:
        if k != "w":
            out[k] = p[k]
    return out


def dequantize_int8(w_q, scale):
    """Reference dequantization (tests / interop): int8 → fp32 (in, out)."""
    if scale.ndim == 1:
        return w_q.astype(jnp.float32) * scale[None, :]
    nb, d_out = scale.shape
    wb = w_q.reshape(nb, -1, d_out).astype(jnp.float32) * scale[:, None, :]
    return wb.reshape(w_q.shape)


def int8_matmul(x, w_q, scale):
    """x @ dequant(w_q) with the dequant folded around the MXU matmul.

    Per-channel (scale (out,)): ``(x @ w_q) * scale`` — the int8→x.dtype
    convert fuses into the dot's weight read (weights stay int8 in HBM),
    the scale is a vector epilogue. Per-block (scale (nb, out)): blocked
    einsum with the block reduce carrying the scales, fp32 partials.
    """
    if scale.ndim == 1:
        y = x @ w_q.astype(x.dtype)
        return y * scale.astype(x.dtype)
    nb, d_out = scale.shape
    bs = w_q.shape[0] // nb
    xb = x.reshape(*x.shape[:-1], nb, bs)
    part = jnp.einsum(
        "...nb,nbo->...no",
        xb,
        w_q.reshape(nb, bs, d_out).astype(x.dtype),
        preferred_element_type=jnp.float32,
    )
    return jnp.einsum("...no,no->...o", part, scale).astype(x.dtype)


def quantize_embedding_int8(p, *, bits=8):
    """{"w": (vocab, emb) fp} → {"w_q": int8/int4, "w_scale": fp32 (vocab,)}.

    Per-ROW symmetric scales — the row is simultaneously the gather unit
    (input embedding) and the output channel of the tied head matmul
    (``logits = h @ w.T``), so one quantized array serves both exactly:
    the head dequant is a (vocab,)-vector epilogue and the gather dequant
    touches only the looked-up rows."""
    dtype, qmax = _qdtype(bits)
    w = jnp.asarray(p["w"], jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=1) / qmax, 1e-12)  # (vocab,)
    w_q = jnp.clip(jnp.round(w / scale[:, None]), -qmax, qmax).astype(dtype)
    out = {"w_q": w_q, "w_scale": scale.astype(jnp.float32)}
    for k in p:
        if k != "w":
            out[k] = p[k]
    return out


_EXPERT_MATS = ("lin1", "gate", "lin2")


def quantize_expert_stack_int8(experts, *, bits=8):
    """Stacked MoE expert weights (E, in, out) → int8/int4 with per-(expert,
    output-channel) scales (E, out). Exact through the sort-based
    ``ragged_dot`` dispatch: every output row belongs to exactly one expert
    group, so dequant is a row-indexed scale epilogue
    (``ops/moe.py::_expert_mlp_ragged``). Biases pass through."""
    dtype, qmax = _qdtype(bits)
    out = {}
    for k, w in experts.items():
        if k in _EXPERT_MATS and getattr(w, "ndim", 0) == 3:
            w32 = jnp.asarray(w, jnp.float32)
            scale = jnp.maximum(jnp.max(jnp.abs(w32), axis=1) / qmax, 1e-12)  # (E, out)
            w_q = jnp.clip(jnp.round(w32 / scale[:, None, :]), -qmax, qmax).astype(dtype)
            out[k + "_q"] = w_q
            out[k + "_scale"] = scale.astype(jnp.float32)
        else:
            out[k] = w
    return out


def quantize_params_int8(
    params, *, exclude=r"tok_emb|conv", block_size=None, min_size=4096,
    quantize_experts=True, quantize_embeddings=False, bits=8,
):
    """Walk a model's params pytree and quantize every 2-D ``{"w": ...}``
    linear whose path doesn't match ``exclude`` and whose weight has at
    least ``min_size`` elements (tiny projections gain no bandwidth and
    lose accuracy), plus stacked MoE expert dicts (3-D lin1/gate/lin2)
    when ``quantize_experts``. ``quantize_embeddings=True`` additionally
    quantizes ``tok_emb`` tables with per-row scales (exact through both
    the gather and a tied output head — see quantize_embedding_int8; the
    big win for tied-head decode, where the table is the largest streamed
    matrix). Returns a new pytree; the original is untouched.
    """
    pat = re.compile(exclude) if exclude else None

    def rec(node, path):
        if isinstance(node, dict):
            w = node.get("w")
            if (
                quantize_embeddings
                and path.endswith("tok_emb")
                and hasattr(w, "ndim")
                and w.ndim == 2
                and w.size >= min_size
            ):
                return quantize_embedding_int8(node, bits=bits)
            if (
                hasattr(w, "ndim")
                and w.ndim == 2
                and w.size >= min_size
                and (pat is None or not pat.search(path))
            ):
                return quantize_linear_int8(node, block_size=block_size, bits=bits)
            if (
                quantize_experts
                and getattr(node.get("lin1"), "ndim", 0) == 3
                and (pat is None or not pat.search(path))
            ):
                return quantize_expert_stack_int8(node, bits=bits)
            return {k: rec(v, f"{path}/{k}") for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(rec(v, f"{path}/{i}") for i, v in enumerate(node))
        return node

    return rec(params, "")


def _leaf_bytes(x):
    # ml_dtypes reports itemsize 1 for int4; XLA packs s4 two-per-byte in HBM
    if x.dtype in (jnp.int4, jnp.uint4):
        return x.size * 0.5
    return x.size * x.dtype.itemsize


def quantized_byte_fraction(params_q, params_fp):
    """Diagnostic: total parameter bytes of the quantized tree vs the fp
    tree (same model) — how much of the HBM weight traffic was cut."""
    bq = sum(_leaf_bytes(x) for x in jax.tree.leaves(params_q))
    bf = sum(_leaf_bytes(x) for x in jax.tree.leaves(params_fp))
    return bq / bf
