"""Fused multi-head attention kernel for SHORT sequences (ViT-class).

flash_attention.py streams KV blocks for long sequences; below ~512 tokens
its per-(bh, q-block, k-block) program count makes launch overhead dominate.
Here the entire (s, s) score tile for a GROUP of (batch·head) pairs lives in
VMEM — one program computes G whole attention heads, so scores never round-
trip through HBM (XLA's fused-softmax sdpa at ViT-B shape moves ~480 MB of
score traffic per layer; measured 1.47 ms vs 1.16 ms for this kernel, and
0.93 ms/layer for ``packed_mha`` below, which additionally removes the head
split/merge transposes and per-call pads — prefer it for packed layouts).

Design notes (all measured on v5e):
- ONE batch dim in the in-kernel dot_general (Mosaic supports exactly one);
  (b, h) collapse to a single leading axis, grid = bh/G.
- softmax denominator via a ones-column appended to V: the V block's 64
  lanes pad to 128 in VMEM anyway, so the second MXU matmul computes
  sum(exp) for free in lane d; normalization is deferred to the (s, d)
  output — 208× fewer divisions than normalizing the (s, s) weights.
- exp runs on bf16 inputs and the weights stay bf16 into the p·V matmul:
  ~0.4% relative error on the attention weights, inside the bf16 output
  tolerance (max |Δ| ≈ 2e-3 vs fp32 sdpa at ViT scale).
- padded key columns are masked with finfo.min/2 BEFORE the row max
  (reference NaN-guard semantics, gpt/gpt_attention.py:196-200).

Reference behavior covered: maskless bidirectional MHA
(multimodal/vision_transformer/vit_attention.py:8-91 and
qwen/qwen3_5/qwen3_5_vision_model.py:128-192).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.5 * float(jnp.finfo(jnp.float32).max)


def _fused_mha_kernel(q_ref, k_ref, va_ref, o_ref, *, scale, causal, s_real, d_out):
    q = q_ref[...]  # (G, s_pad, d) bf16/f32
    k = k_ref[...]
    va = va_ref[...]  # (G, s_pad, d+1) — last column is ones

    scores = lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (G, s_pad, s_pad)
    scores = scores * scale

    s_pad = scores.shape[-1]
    col = lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 1)
    mask = col >= s_real  # padded keys
    if causal:
        row = lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 0)
        mask = mask | (col > row)
    scores = jnp.where(mask[None], NEG_INF, scores)

    m = jnp.max(scores, axis=-1, keepdims=True)
    # fp32 exp, weights cast to the value dtype for the MXU matmul: exact in
    # fp32 models, ~0.4% relative weight error in bf16 (inside bf16 output ulp)
    p = jnp.exp(scores - m).astype(va.dtype)

    num = lax.dot_general(
        p, va, dimension_numbers=(((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (G, s_pad, d+1); lane d_out = sum(exp) = softmax denominator
    o_ref[...] = (num[..., :d_out] / num[..., d_out : d_out + 1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "scale", "group", "interpret"))
def _fused_mha_fwd_impl(q, k, v, *, causal=False, scale=None, group=None, interpret=False):
    """One-shot fused MHA forward. q/k/v: (b, h, s, d), equal head counts.
    Returns (b, h, s, d) in q.dtype. ``group`` = (b·h) pairs per program
    (None = auto-size so the fp32 score tile stays ≈2 MB of VMEM)."""
    b, h, s, d = q.shape
    if scale is None:
        scale = d**-0.5
    s_pad = -(-s // 16) * 16  # bf16 sublane alignment
    if s_pad != s:
        pad = ((0, 0), (0, 0), (0, s_pad - s), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)

    bh = b * h
    if group is None:
        group = max(1, (2 * 1024 * 1024) // (s_pad * s_pad * 4))
    if bh % group:
        group = next(g for g in range(min(group, bh), 0, -1) if bh % g == 0)

    ones = jnp.ones((b, h, s_pad, 1), v.dtype)
    va = jnp.concatenate([v, ones], axis=-1).reshape(bh, s_pad, d + 1)
    qf, kf = q.reshape(bh, s_pad, d), k.reshape(bh, s_pad, d)

    spec = pl.BlockSpec((group, s_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    spec_a = pl.BlockSpec((group, s_pad, d + 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fused_mha_kernel, scale=scale, causal=causal, s_real=s, d_out=d),
        grid=(bh // group,),
        in_specs=[spec, spec, spec_a],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bh, s_pad, d), q.dtype),
        interpret=interpret,
    )(qf, kf, va)
    return out.reshape(b, h, s_pad, d)[:, :, :s, :]


def _sdpa_ref(q, k, v, causal, scale):
    """The ops.attention.sdpa oracle for the recompute backward (no import
    cycle: ops.attention only imports this module lazily inside functions)."""
    from llm_quest_tpu.ops.attention import sdpa
    from llm_quest_tpu.ops.masks import causal_mask

    mask = causal_mask(q.shape[2]) if causal else None
    return sdpa(q, k, v, mask=mask, scale=scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _fused_mha_diff(q, k, v, causal, scale, group, interpret):
    return _fused_mha_fwd_impl(q, k, v, causal=causal, scale=scale, group=group, interpret=interpret)


def _fused_diff_fwd(q, k, v, causal, scale, group, interpret):
    out = _fused_mha_fwd_impl(q, k, v, causal=causal, scale=scale, group=group, interpret=interpret)
    return out, (q, k, v)


def _fused_diff_bwd(causal, scale, group, interpret, res, g):
    # recompute-based backward through the XLA formula — exact sdpa gradients
    # (the kernel forward differs from sdpa only by bf16 exp rounding); at the
    # short sequence lengths this kernel targets, XLA's fused backward is
    # already near roofline, so a hand-written backward buys nothing
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _sdpa_ref(q, k, v, causal, scale), q, k, v)
    return vjp(g)


_fused_mha_diff.defvjp(_fused_diff_fwd, _fused_diff_bwd)


def fused_mha(q, k, v, *, causal=False, scale=None, group=None, interpret=False):
    """Differentiable fused short-sequence MHA (see module docstring)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _fused_mha_diff(q, k, v, causal, scale, group, interpret)


# ---------------------------------------------------------------- packed MHA

def _packed_mha_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, s_real, head_dim, imgs):
    """One program = `imgs` batch rows, ALL heads, packed (s, h·d) layout.

    No head transposes exist anywhere: heads are 128-lane slabs of the
    projection output, sliced in-register. Lane slices of the refs are
    128-aligned (Mosaic requirement); the d<128 head split happens on values.
    Out-of-bounds rows of the trailing partial block are garbage on input and
    dropped on output write-back; garbage KEY columns are masked before the
    softmax and garbage VALUE rows are zeroed (0·garbage would still be NaN).

    The per-head dots are BATCHED over the `imgs` dim (the one batch dim
    Mosaic allows) and the 128-lane SLAB axis is a grid dimension, so one
    program holds a single slab of one image group: measured on v5e,
    (16, 208, 64) grouped matmuls run the same layer ~2× faster than the
    per-image 2-D dot loop this replaces, and slab-tiling keeps VMEM at
    ~6 MB (whole-row blocks OOM the 16 MB scoped limit at imgs≥8).
    """
    s_pad = q_ref.shape[1]
    heads_per_slab = 128 // head_dim
    col2d = lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 1)
    key_pad_mask = col2d >= s_real
    row1d = lax.broadcasted_iota(jnp.int32, (s_pad, 1), 0)
    v_row_valid = row1d < s_real

    q_slab = q_ref[...].astype(jnp.float32) * scale  # (imgs, s, 128)
    k_slab = k_ref[...].astype(jnp.float32)
    v_slab = jnp.where(v_row_valid[None], v_ref[...], 0).astype(q_ref.dtype)
    outs = []
    for t in range(heads_per_slab):
        hsl = slice(t * head_dim, (t + 1) * head_dim)
        qh, kh, vh = q_slab[:, :, hsl], k_slab[:, :, hsl], v_slab[:, :, hsl]
        scores = lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # (imgs, s, s)
        scores = jnp.where(key_pad_mask[None], NEG_INF, scores)
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        den = jnp.sum(p, axis=-1, keepdims=True)
        oh = lax.dot_general(
            p.astype(vh.dtype), vh, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        outs.append(oh / den)
    o_ref[...] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_heads", "scale", "imgs", "interpret"))
def _packed_mha_impl(q, k, v, *, n_heads, scale=None, imgs=16, interpret=False):
    b, s, hd = q.shape
    d = hd // n_heads
    assert 128 % d == 0 and hd % 128 == 0, (n_heads, d, hd)
    if scale is None:
        scale = d**-0.5
    s_pad = -(-s // 16) * 16
    if b % imgs:
        imgs = next(g for g in range(min(imgs, b), 0, -1) if b % g == 0)

    spec = pl.BlockSpec((imgs, s_pad, 128), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_packed_mha_kernel, scale=scale, s_real=s, head_dim=d, imgs=imgs),
        grid=(b // imgs, hd // 128),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, s, hd), q.dtype),
        interpret=interpret,
    )(q, k, v)


# ---------------------------------------------------------- int8-score packed MHA

def _packed_mha_int8_kernel(q_ref, k_ref, v_ref, qs_ref, ks_ref, o_ref, *,
                            scale, s_real, head_dim, imgs, static_dq=None):
    """Packed MHA with INT8 score matmuls: q/k arrive pre-quantized int8
    (per-tensor dynamic scales in SMEM), QKᵀ runs on the MXU int8 path
    (measured 1.59× the bf16 rate at ViT shapes — the single-MXU small-K
    bound is arithmetic-specific), scores dequantize to fp32 for the
    softmax, and the p·V matmul stays bf16. Quantization happens OUTSIDE
    the kernel: in-kernel VPU round/clip costs the entire win (measured),
    while the XLA quantize fuses into the projection epilogue and HALVES
    the q/k HBM read traffic."""
    s_pad, hd = q_ref.shape[1], q_ref.shape[2]
    # dequant·attention scale: a STATIC (calibrated) scale folds to a compile-
    # time constant and needs no SMEM operands; dynamic scales arrive in SMEM
    dq_scale = static_dq if static_dq is not None else qs_ref[0] * ks_ref[0] * scale
    col2d = lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 1)
    key_pad_mask = col2d >= s_real
    row1d = lax.broadcasted_iota(jnp.int32, (s_pad, 1), 0)
    v_row_valid = row1d < s_real

    q_slab = q_ref[...]  # (imgs, s, 128) int8 — one slab per program
    k_slab = k_ref[...]
    v_slab = jnp.where(v_row_valid[None], v_ref[...], 0).astype(v_ref.dtype)
    outs = []
    for t in range(128 // head_dim):
        hsl = slice(t * head_dim, (t + 1) * head_dim)
        qh, kh, vh = q_slab[:, :, hsl], k_slab[:, :, hsl], v_slab[:, :, hsl]
        s32 = lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.int32
        )  # (imgs, s, s) int32 — batched MXU int8 path
        scores = s32.astype(jnp.float32) * dq_scale
        scores = jnp.where(key_pad_mask[None], NEG_INF, scores)
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        den = jnp.sum(p, axis=-1, keepdims=True)
        oh = lax.dot_general(
            p.astype(vh.dtype), vh, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        outs.append(oh / den)
    o_ref[...] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _quantize_sym(x):
    """Per-tensor symmetric int8 quantization; returns (int8, fp32 scale)."""
    s = (jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0 + 1e-12).astype(jnp.float32)
    xi = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return xi, s


@functools.partial(
    jax.jit, static_argnames=("n_heads", "scale", "imgs", "interpret", "static_scales")
)
def _packed_mha_int8_impl(q, k, v, *, n_heads, scale=None, imgs=8, interpret=False,
                          static_scales=None):
    b, s, hd = q.shape
    d = hd // n_heads
    assert 128 % d == 0 and hd % 128 == 0, (n_heads, d, hd)
    if scale is None:
        scale = d**-0.5
    s_pad = -(-s // 16) * 16  # measured: int8 dots accept 16-mult sublanes
    if b % imgs:
        imgs = next(g for g in range(min(imgs, b), 0, -1) if b % g == 0)

    if static_scales is not None:
        # CALIBRATED scales (PTQ): the quantize is a pure elementwise epilogue
        # XLA fuses into the q/k projections — the dynamic per-tensor max is a
        # global reduce that costs extra full HBM passes (measured: it eats
        # the whole int8 win; 3500 vs 3601 img/s on ViT-B)
        q_s, k_s = float(static_scales[0]), float(static_scales[1])
        qi = jnp.clip(jnp.round(q.astype(jnp.float32) * (1.0 / q_s)), -127, 127).astype(jnp.int8)
        ki = jnp.clip(jnp.round(k.astype(jnp.float32) * (1.0 / k_s)), -127, 127).astype(jnp.int8)
        static_dq = q_s * k_s * float(scale)
        scale_args, scale_specs = [], []
    else:
        qi, qs = _quantize_sym(q)
        ki, ks = _quantize_sym(k)
        static_dq = None
        scale_args = [qs[None], ks[None]]
        scale_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
    if s_pad != s:
        pad = ((0, 0), (0, s_pad - s), (0, 0))
        qi, ki, v = jnp.pad(qi, pad), jnp.pad(ki, pad), jnp.pad(v, pad)

    spec_i8 = pl.BlockSpec((imgs, s_pad, 128), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM)
    spec_v = pl.BlockSpec((imgs, s_pad, 128), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM)

    def kernel(*refs):
        if static_dq is not None:
            q_r, k_r, v_r, o_r = refs
            qs_r = ks_r = None
        else:
            q_r, k_r, v_r, qs_r, ks_r, o_r = refs
        _packed_mha_int8_kernel(
            q_r, k_r, v_r, qs_r, ks_r, o_r,
            scale=float(scale), s_real=s, head_dim=d, imgs=imgs, static_dq=static_dq,
        )

    out = pl.pallas_call(
        kernel,
        grid=(b // imgs, hd // 128),
        in_specs=[spec_i8, spec_i8, spec_v] + scale_specs,
        out_specs=spec_v,
        out_shape=jax.ShapeDtypeStruct((b, s_pad, hd), q.dtype),
        interpret=interpret,
    )(qi, ki, v, *scale_args)
    return out[:, :s, :]


def _packed_mha_int8_ik_kernel(q_ref, k_ref, v_ref, o_ref, *,
                               scale, s_real, head_dim, imgs, q_s, k_s):
    """In-kernel-quantize variant: q/k arrive BF16 (no int8 HBM round-trip
    anywhere — projections write bf16 exactly as the bf16 path does), the
    kernel rounds/clips them to int8 in VMEM with STATIC calibrated scales
    (compile-time constants), and the score dots run on the MXU int8 path.

    This is the one remaining untried shape from the round-3 int8 ablation
    (the fused-epilogue form lost its core win to quantize HBM traffic):
    total HBM traffic here is IDENTICAL to the bf16 kernel, so the
    experiment isolates whether the VPU quantize + int8 relayout cost in
    VMEM is smaller than the 1.59× int8-vs-bf16 MXU rate gain at the
    (s≈208, K=64) score shape. Measured end-to-end by
    scripts/ablate_int8_scores.py --inkernel; verdict in COVERAGE.md."""
    s_pad = q_ref.shape[1]
    col2d = lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 1)
    key_pad_mask = col2d >= s_real
    row1d = lax.broadcasted_iota(jnp.int32, (s_pad, 1), 0)
    v_row_valid = row1d < s_real
    dq_scale = q_s * k_s * scale

    qi = jnp.clip(jnp.round(q_ref[...].astype(jnp.float32) * (1.0 / q_s)),
                  -127, 127).astype(jnp.int8)  # (imgs, s, 128) VMEM-local
    ki = jnp.clip(jnp.round(k_ref[...].astype(jnp.float32) * (1.0 / k_s)),
                  -127, 127).astype(jnp.int8)
    v_slab = jnp.where(v_row_valid[None], v_ref[...], 0).astype(v_ref.dtype)
    outs = []
    for t in range(128 // head_dim):
        hsl = slice(t * head_dim, (t + 1) * head_dim)
        qh, kh, vh = qi[:, :, hsl], ki[:, :, hsl], v_slab[:, :, hsl]
        s32 = lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.int32
        )
        scores = s32.astype(jnp.float32) * dq_scale
        scores = jnp.where(key_pad_mask[None], NEG_INF, scores)
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        den = jnp.sum(p, axis=-1, keepdims=True)
        oh = lax.dot_general(
            p.astype(vh.dtype), vh, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        outs.append(oh / den)
    o_ref[...] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("n_heads", "scale", "imgs", "interpret", "static_scales")
)
def packed_mha_int8_inkernel(q, k, v, *, n_heads, static_scales, scale=None, imgs=8,
                             interpret=False):
    """Forward-only experiment entry for the in-kernel-quantize int8 kernel
    (see _packed_mha_int8_ik_kernel). q/k/v: bf16 packed (b, s, h·d);
    static_scales = calibrated (q_scale, k_scale) floats."""
    b, s, hd = q.shape
    d = hd // n_heads
    assert 128 % d == 0 and hd % 128 == 0, (n_heads, d, hd)
    if scale is None:
        scale = d**-0.5
    s_pad = -(-s // 16) * 16
    if b % imgs:
        imgs = next(g for g in range(min(imgs, b), 0, -1) if b % g == 0)
    if s_pad != s:
        pad = ((0, 0), (0, s_pad - s), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)

    spec = pl.BlockSpec((imgs, s_pad, 128), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _packed_mha_int8_ik_kernel, scale=float(scale), s_real=s, head_dim=d,
            imgs=imgs, q_s=float(static_scales[0]), k_s=float(static_scales[1]),
        ),
        grid=(b // imgs, hd // 128),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, s_pad, hd), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out[:, :s, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def packed_mha_int8(q, k, v, n_heads, scale=None, interpret=False, static_scales=None):
    """Int8-score packed MHA (see _packed_mha_int8_kernel). Differentiable
    with a straight-through estimator: the backward is the exact bf16 sdpa
    vjp (quantization treated as identity), the standard QAT treatment.

    static_scales: optional (q_scale, k_scale) floats from calibration —
    makes quantization a fused epilogue (free) instead of a dynamic reduce."""
    return _packed_mha_int8_impl(q, k, v, n_heads=n_heads, scale=scale, interpret=interpret,
                                 static_scales=static_scales)


def _packed_int8_fwd(q, k, v, n_heads, scale, interpret, static_scales):
    return _packed_mha_int8_impl(q, k, v, n_heads=n_heads, scale=scale, interpret=interpret,
                                 static_scales=static_scales), (q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def packed_mha(q, k, v, n_heads, scale=None, interpret=False):
    """Bidirectional maskless MHA on packed (b, s, h·d) tensors — the
    ViT/vision-encoder layout straight out of the q/k/v projections.
    Differentiable (recompute backward through the XLA formula)."""
    return _packed_mha_impl(q, k, v, n_heads=n_heads, scale=scale, interpret=interpret)


def _packed_sdpa_ref(q, k, v, n_heads, scale):
    b, s, hd = q.shape
    d = hd // n_heads
    sp = lambda x: x.reshape(b, s, n_heads, d).transpose(0, 2, 1, 3)
    scl = d**-0.5 if scale is None else scale
    out = _sdpa_ref(sp(q), sp(k), sp(v), False, scl)
    return out.transpose(0, 2, 1, 3).reshape(b, s, hd)


def _packed_fwd(q, k, v, n_heads, scale, interpret):
    return _packed_mha_impl(q, k, v, n_heads=n_heads, scale=scale, interpret=interpret), (q, k, v)


def _packed_bwd(n_heads, scale, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _packed_sdpa_ref(q, k, v, n_heads, scale), q, k, v)
    return vjp(g)


def _packed_int8_bwd(n_heads, scale, interpret, static_scales, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _packed_sdpa_ref(q, k, v, n_heads, scale), q, k, v)
    return vjp(g)


packed_mha.defvjp(_packed_fwd, _packed_bwd)
packed_mha_int8.defvjp(_packed_int8_fwd, _packed_int8_bwd)
