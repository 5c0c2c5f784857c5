"""Core scaled-dot-product attention in XLA-friendly form.

One attention core serves every architecture in the framework; variants are
expressed through arguments instead of separate modules:

- GQA: k/v may have fewer heads than q (heads are repeated logically via
  reshape, no materialized repeat_interleave).
- attention sinks (MiMo-V2): learnable per-head logit appended pre-softmax and
  dropped after (reference: xiaomi/mimo_v2_flash_attention.py:69-127).
- score softcapping (Gemma-style) via ``softcap``.
- masks are boolean (b|1, 1, q, k), True = masked, filled with finfo.min/2
  (reference: gpt/gpt_attention.py:196-200).

Softmax runs in fp32 regardless of input dtype (standard TPU practice; the
reference implicitly does this in fp32 models and relies on SDPA elsewhere).
The Pallas flash-attention kernel in kernels/ is a drop-in replacement for the
full-sequence path; this XLA version is the reference implementation and the
decode(q_len small) path.
"""

from functools import partial

import jax
import jax.numpy as jnp

from llm_quest_tpu.ops.masks import mask_value
from llm_quest_tpu.ops.quantization import QuantKV


def sdpa(q, k, v, *, mask=None, scale=None, sink=None, softcap=None, out_dtype=None):
    """Scaled dot-product attention.

    Args:
        q: (b, hq, sq, d)
        k: (b, hkv, sk, d)
        v: (b, hkv, sk, dv)
        mask: bool (b|1, 1|hq, sq, sk), True = masked, or None
        scale: attention scaling; default d**-0.5
        sink: optional (hq,) learnable per-head sink logits appended as an
            extra key column before softmax, dropped after
        softcap: optional score soft-capping value

    Returns: (b, hq, sq, dv)
    """
    b, hq, sq, d = q.shape
    hkv = k.shape[1]
    out_dtype = out_dtype or q.dtype
    if scale is None:
        scale = d**-0.5

    if hq != hkv:
        group = hq // hkv
        q_g = q.reshape(b, hkv, group, sq, d)
        scores = jnp.einsum("bkgqd,bkld->bkgql", q_g, k, preferred_element_type=jnp.float32)
        scores = scores.reshape(b, hq, sq, k.shape[2])
    else:
        scores = jnp.einsum("bhqd,bhld->bhql", q, k, preferred_element_type=jnp.float32)

    scores = scores * scale

    if softcap is not None:
        scores = softcap * jnp.tanh(scores / softcap)

    if mask is not None:
        scores = jnp.where(mask, jnp.float32(mask_value(jnp.float32)), scores)

    if sink is not None:
        # append per-head sink logit column: softmax normalizes against it,
        # then the sink's probability mass is dropped (not used for values)
        sink_col = jnp.broadcast_to(
            sink.astype(jnp.float32)[None, :, None, None], (b, hq, sq, 1)
        )
        full = jnp.concatenate([scores, sink_col], axis=-1)
        weights = jnp.exp(full - jnp.max(full, axis=-1, keepdims=True))
        weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
        weights = weights[..., :-1]
    else:
        m = jnp.max(scores, axis=-1, keepdims=True)
        weights = jnp.exp(scores - m)
        weights = weights / jnp.sum(weights, axis=-1, keepdims=True)

    weights = weights.astype(v.dtype)
    if hq != hkv:
        group = hq // hkv
        w_g = weights.reshape(b, hkv, group, sq, k.shape[2])
        out = jnp.einsum("bkgql,bkld->bkgqd", w_g, v, preferred_element_type=jnp.float32)
        out = out.reshape(b, hq, sq, v.shape[-1])
    else:
        out = jnp.einsum("bhql,bhld->bhqd", weights, v, preferred_element_type=jnp.float32)

    return out.astype(out_dtype)


def attention(
    q,
    k,
    v,
    *,
    cfg=None,
    mask=None,
    causal=True,
    window_size=None,
    attn_mask=None,
    sink=None,
    softcap=None,
    scale=None,
    flash_ok=True,
    q_start=None,
):
    """Attention router: Pallas flash kernel when legal + profitable, XLA sdpa
    otherwise.

    The flash path activates when ``cfg["use_flash"]`` is set, the call is a
    full-sequence one (sq == sk — training or uncached forward; the KV-cache
    decode path stays on sdpa where single-token matmuls beat kernel launch),
    and the sequence clears ``cfg["flash_min_seq"]`` (default 256 — below
    that XLA's fused softmax wins, measured on ViT's s=197).

    Flash callers pass the STRUCTURED mask info (causal/window_size/attn_mask
    as a (b, sk) validity mask); ``mask`` is the dense boolean fallback for
    sdpa (kept so models build it once per forward).

    INVARIANT (flash is opt-out on TPU): when both are given, ``mask`` must be
    exactly the dense rendering of (causal, window_size, attn_mask) — the
    flash kernel reads only the structured args and silently ignores ``mask``.
    A dense mask with NO structured causal/window counterpart (causal=False,
    no window) cannot be represented to the kernel, so that combination is
    routed to sdpa here rather than mis-masked.
    """
    # head-sharded kernel routing: cfg["head_shard"] = {"mesh", "axis"} maps
    # this call over the TP head axis with shard_map — each shard runs the
    # normal single-device router (Pallas kernels included) on its resident
    # heads with ZERO collectives, because heads are independent in attention
    # and the contiguous head split preserves GQA grouping (q-head block i is
    # exactly group_size × kv-head block i). This is how multi-chip serving
    # (inference/serving.py mesh=) keeps the flash/flash-decode kernels that
    # an un-shard_mapped pallas_call would force XLA to gather for.
    hs = cfg.get("head_shard") if cfg is not None else None
    if hs is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as _P

        mesh, axis = hs["mesh"], hs.get("axis", "model")
        tp = mesh.shape[axis]
        kh = k.data.shape[1] if isinstance(k, QuantKV) else k.shape[1]
        cfg_local = {kk: vv for kk, vv in cfg.items() if kk != "head_shard"}
        if (
            tp > 1 and kh % tp == 0 and q.shape[1] % tp == 0 and sink is None
            # a PER-HEAD dense mask can't be replicated against local heads
            and (mask is None or mask.shape[1] == 1)
        ):
            head = _P(None, axis, None, None)
            hk = QuantKV(head, _P(None, axis, None)) if isinstance(k, QuantKV) else head
            rep = lambda x: jax.tree.map(lambda _: _P(), x)  # noqa: E731
            operands = (q, k, v, mask, attn_mask)
            in_specs = (head, hk, hk, rep(mask), rep(attn_mask))

            @partial(
                shard_map, mesh=mesh, in_specs=in_specs,
                out_specs=head, check_vma=False,
            )
            def _sharded(q_, k_, v_, mask_, attn_mask_):
                return attention(
                    q_, k_, v_, cfg=cfg_local, mask=mask_, causal=causal,
                    window_size=window_size, attn_mask=attn_mask_, softcap=softcap,
                    scale=scale, flash_ok=flash_ok, q_start=q_start,
                )

            return _sharded(*operands)
        cfg = cfg_local  # indivisible heads (or sinks): single-device routing

    # int8 KV cache (inference/cache.py quant="int8"): k/v arrive as QuantKV
    # views. The single-token decode step — the shape where KV bytes dominate
    # — streams them int8 through the flash-decode kernel (dequant reassociated
    # in VMEM, exact); every other shape (prefill, CPU-incompatible head dims)
    # dequantizes once and takes the normal paths below.
    if isinstance(k, QuantKV):
        from llm_quest_tpu.kernels.flash_decode import flash_decode, supports_flash_decode

        if (
            supports_flash_decode(q, k.data, sink=sink, softcap=softcap)
            and mask is not None
            and (cfg is None or cfg.get("use_flash_decode", True))
        ):
            from llm_quest_tpu.kernels.flash_attention import NEG_INF

            bias = jnp.where(mask[:, 0, 0, :], NEG_INF, 0.0).astype(jnp.float32)
            if bias.shape[0] != q.shape[0]:
                bias = jnp.broadcast_to(bias, (q.shape[0], bias.shape[1]))
            return flash_decode(
                q, k.data, k.scale, v.data, v.scale, bias,
                scale=scale, interpret=jax.default_backend() != "tpu",
            )
        k = k.dequant(q.dtype)
        v = v.dequant(q.dtype)

    # context parallelism: when cfg["context_parallel"] = {"mesh", "axis"} is
    # set, full-sequence causal training calls route through the ring-flash
    # sequence-parallel kernel (parallel/sequence.py) — KV blocks stream
    # around the ICI ring, activations stay sequence-sharded, context scales
    # with the number of devices. Covers the plain-causal case only (padding/
    # window/sink/softcap shapes fall through to the local paths below).
    cp = cfg.get("context_parallel") if cfg is not None else None
    if (
        cp is not None
        and flash_ok
        and causal
        and q.shape[2] == k.shape[2]
        and q.shape[2] % (cp["mesh"].shape[cp.get("axis", "data")] * 8) == 0
        and mask is None  # callers skip building the dense (s, s) mask under CP
        and attn_mask is None
        and sink is None
        and softcap is None
        and window_size is None
    ):
        from llm_quest_tpu.parallel.sequence import ring_flash_attention

        return ring_flash_attention(
            cp["mesh"], cp.get("axis", "data"), q, k, v,
            causal=True, scale=scale, interpret=jax.default_backend() != "tpu",
        )

    # fused short-seq kernel: whole (s, s) score tile in VMEM, one program
    # per group of (b·h) pairs — the ViT/vision-encoder hot path (measured
    # faster than XLA sdpa at ViT-B s=197 where flash's grid overhead loses).
    # Engages only for the maskless equal-heads full-sequence case.
    use_fused = (
        flash_ok
        and cfg is not None
        and cfg.get("use_fused_mha", True)
        and q.shape[1] == k.shape[1]
        and q.shape[2] == k.shape[2]
        and v.shape[-1] == q.shape[-1]
        and 2 <= q.shape[2] <= cfg.get("fused_mha_max_seq", 512)
        and mask is None
        and attn_mask is None
        and sink is None
        and softcap is None
        and window_size is None
        and jax.default_backend() == "tpu"
    )
    if use_fused:
        from llm_quest_tpu.kernels.fused_mha import fused_mha

        return fused_mha(q, k, v, causal=causal, scale=scale).astype(q.dtype)

    # default ON for TPU executions (streamed-KV kernel beats materialized
    # scores from ~2k ctx and is required for SWA to be O(L·w) not O(L²));
    # default OFF elsewhere so CPU tests exercise the XLA reference path —
    # set cfg["use_flash"] explicitly to force either way
    flash_default = jax.default_backend() == "tpu"
    # full-sequence calls (sq == sk) stream as-is; CACHED PREFILL (sq < sk:
    # prompt queries against the pre-allocated max_len cache view) qualifies
    # too when the caller supplies the STATIC query offset — long-prompt TTFT
    # would otherwise materialize (s × max_len) scores on the sdpa path
    shape_ok = q.shape[2] == k.shape[2] or (
        causal and q_start is not None and q.shape[2] < k.shape[2]
    )
    use_flash = (
        flash_ok
        and cfg is not None
        and cfg.get("use_flash", flash_default)
        and shape_ok
        and q.shape[2] >= cfg.get("flash_min_seq", 256)
        # a dense mask without any structured equivalent can't reach the
        # kernel (flash ignores `mask`) — see the invariant in the docstring
        and (mask is None or causal or window_size is not None)
    )
    if use_flash:
        from llm_quest_tpu.kernels.flash_attention import flash_attention

        return flash_attention(
            q, k, v,
            attn_mask=attn_mask, sink=sink, causal=causal,
            window_size=window_size, scale=scale, softcap=softcap,
            q_start=q_start or 0,
            interpret=jax.default_backend() != "tpu",
        ).astype(q.dtype)
    if mask is None and causal and q.shape[2] > 1:
        # a CP-skipped dense mask that fell through (shape didn't qualify for
        # the ring path) still needs causal semantics on the sdpa fallback
        from llm_quest_tpu.ops.masks import causal_mask

        mask = causal_mask(q.shape[2], k.shape[2], q_start=k.shape[2] - q.shape[2], attn_mask=attn_mask)
    return sdpa(q, k, v, mask=mask, scale=scale, sink=sink, softcap=softcap)


def mha_packed(q, k, v, n_heads, *, cfg=None, scale=None, layer_idx=None):
    """Bidirectional maskless MHA on packed (b, s, h·d) projection outputs.

    On TPU this dispatches to the transpose-free packed Pallas kernel
    (kernels/fused_mha.py::packed_mha) — the vision-encoder hot path, where
    head split/merge transposes and HBM score traffic otherwise dominate.
    Elsewhere (and for shapes the kernel doesn't cover) it falls back to
    split-heads + sdpa + merge-heads.
    """
    b, s, hd = q.shape
    d = hd // n_heads
    use_kernel = (
        (cfg is None or cfg.get("use_fused_mha", True))
        and hd % 128 == 0
        and d in (32, 64, 128)
        and 2 <= s <= (cfg.get("fused_mha_max_seq", 512) if cfg else 512)
        and jax.default_backend() == "tpu"
    )
    if use_kernel:
        if cfg is not None and cfg.get("int8_scores", False):
            # int8 QKᵀ on the MXU int path (1.59× the bf16 small-K rate,
            # measured) with fp32 softmax — opt-in: ~1e-2 output deviation
            # from per-tensor symmetric quantization of q/k. With calibrated
            # cfg["int8_qk_scales"] (per-layer (q_s, k_s)) the quantize fuses
            # into the projections; otherwise a dynamic per-tensor max runs.
            from llm_quest_tpu.kernels.fused_mha import packed_mha_int8

            scales = cfg.get("int8_qk_scales")
            if scales is not None:
                if isinstance(scales[0], (tuple, list)):
                    scales = tuple(scales[layer_idx if layer_idx is not None else 0])
                else:
                    scales = tuple(scales)
            if cfg.get("int8_scores_mode") == "inkernel" and scales is not None:
                # experiment variant (VERDICT r3 #10): q/k stay bf16 in HBM,
                # quantize happens VMEM-locally inside the kernel — isolates
                # the int8 MXU rate gain from quantize HBM traffic
                from llm_quest_tpu.kernels.fused_mha import packed_mha_int8_inkernel

                return packed_mha_int8_inkernel(
                    q, k, v, n_heads=n_heads, static_scales=scales, scale=scale
                )
            return packed_mha_int8(q, k, v, n_heads, scale, False, scales)
        from llm_quest_tpu.kernels.fused_mha import packed_mha

        return packed_mha(q, k, v, n_heads, scale)
    out = sdpa(split_heads(q, n_heads), split_heads(k, n_heads), split_heads(v, n_heads), scale=scale)
    return merge_heads(out)


def merge_heads(x):
    """(b, h, s, d) → (b, s, h*d)."""
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def split_heads(x, num_heads):
    """(b, s, h*d) → (b, h, s, d)."""
    b, s, hd = x.shape
    return x.reshape(b, s, num_heads, hd // num_heads).transpose(0, 2, 1, 3)
