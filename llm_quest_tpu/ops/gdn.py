"""GatedDeltaNet primitives: SSM-style decay, gated delta rule, causal conv.

Behavioral parity with the reference (qwen/qwen3_next/qwen3_next_attention.py):

- ``compute_alpha_factor`` (:71-100): α = exp(−exp(log_A)·softplus(a + dt_bias))
- ``gated_delta_rule`` (:103-159): per-timestep fp32 recurrence
      S_t = α_t·S_{t−1} + β_t·(v_t − α_t·S_{t−1}k_t) k_tᵀ,  o_t = S_t q_t
  with state S: (b, heads, v_dim, qk_dim) and q scaled by qk_dim^-0.5.
- ``l2_norm_clamp`` (:51-60): x/max(‖x‖₂, 1e-6) — the clamp variant the
  reference uses inside GDN (vs the +eps "official" variant in ops/norms.py).
- depthwise causal Conv1d (:313-340): kernel_size-1 left padding, no bias,
  groups=channels (temporal conv per channel).

TPU redesign: the reference's python loop over t becomes ``jax.lax.scan``
(single compiled step, state as carry) — correct for training and the oracle
for the chunked Pallas kernel (kernels/gdn_pallas.py) that takes over the long
-sequence path. Decode uses the explicit single-step forms with rolling conv
state, mirroring Qwen3.5's ``_causal_conv1d_update`` / ``_gated_delta_rule_step``
(reference: qwen3_5_text_model.py:425-507).
"""

import jax
import jax.numpy as jnp
from jax import lax


def l2_norm_clamp(x):
    """x / max(‖x‖₂, 1e-6) (reference: qwen3_next_attention.py:51-60)."""
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    norm = jnp.linalg.norm(x32, axis=-1, keepdims=True)
    return (x32 / jnp.maximum(norm, 1e-6)).astype(dt)


def compute_alpha_factor(log_A, a, dt_bias):
    """α = exp(−exp(log_A)·softplus(a + dt_bias)) ∈ (0,1), fp32.

    log_A/dt_bias: (num_v_heads,); a: (b, s, num_v_heads).
    Returns (b, s, num_v_heads).
    """
    A = jnp.exp(log_A.astype(jnp.float32))
    delta_t = jax.nn.softplus(a.astype(jnp.float32) + dt_bias.astype(jnp.float32))
    return jnp.exp(-A * delta_t)


def gated_delta_rule(q, k, v, beta, alpha, prev_state=None):
    """Recurrent gated delta rule over a sequence (lax.scan, fp32).

    q/k: (b, h, s, dk) — heads already repeated to match v heads.
    v: (b, h, s, dv); beta/alpha: (b, h, s).
    prev_state: (b, h, dv, dk) or None (zeros).

    Returns (out (b, h, s, dv) in q's dtype, final_state fp32).
    """
    b, h, s, dk = k.shape
    dv = v.shape[-1]
    dt = q.dtype
    scale = dk**-0.5

    q32 = q.astype(jnp.float32) * scale
    k32 = k.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    beta32 = beta.astype(jnp.float32)
    alpha32 = alpha.astype(jnp.float32)

    if prev_state is None:
        prev_state = jnp.zeros((b, h, dv, dk), jnp.float32)

    def step(state, xs):
        q_t, k_t, v_t, beta_t, alpha_t = xs  # (b,h,dk),(b,h,dk),(b,h,dv),(b,h),(b,h)
        gated = alpha_t[..., None, None] * state  # (b, h, dv, dk)
        v_old = jnp.einsum("bhvk,bhk->bhv", gated, k_t)
        delta = beta_t[..., None] * (v_t - v_old)  # (b, h, dv)
        state = gated + delta[..., :, None] * k_t[..., None, :]  # outer product
        out_t = jnp.einsum("bhvk,bhk->bhv", state, q_t)
        return state, out_t

    xs = (
        jnp.moveaxis(q32, 2, 0),
        jnp.moveaxis(k32, 2, 0),
        jnp.moveaxis(v32, 2, 0),
        jnp.moveaxis(beta32, 2, 0),
        jnp.moveaxis(alpha32, 2, 0),
    )
    final_state, outs = lax.scan(step, prev_state, xs)
    return jnp.moveaxis(outs, 0, 2).astype(dt), final_state


def gated_delta_rule_step(q_t, k_t, v_t, beta_t, alpha_t, state):
    """Single decode step (reference: qwen3_5_text_model.py:459-507).

    q_t/k_t: (b, h, dk); v_t: (b, h, dv); beta_t/alpha_t: (b, h);
    state: (b, h, dv, dk) fp32. Returns (out (b, h, dv), new_state).
    """
    dk = k_t.shape[-1]
    q32 = q_t.astype(jnp.float32) * dk**-0.5
    k32 = k_t.astype(jnp.float32)
    v32 = v_t.astype(jnp.float32)

    gated = alpha_t.astype(jnp.float32)[..., None, None] * state
    v_old = jnp.einsum("bhvk,bhk->bhv", gated, k32)
    delta = beta_t.astype(jnp.float32)[..., None] * (v32 - v_old)
    state = gated + delta[..., :, None] * k32[..., None, :]
    out = jnp.einsum("bhvk,bhk->bhv", state, q32)
    return out.astype(q_t.dtype), state


def gated_delta_rule_step_auto(cfg, q_t, k_t, v_t, beta_t, alpha_t, state):
    """Decode-step dispatch for a SINGLE layer's state: the fused Pallas
    step kernel on TPU, the XLA einsum form elsewhere.
    ``use_gdn_kernel=False`` (the TP-serving escape hatch — Pallas has no
    SPMD rule) also pins the XLA form. Models with stacked per-layer cache
    buffers should call ``gated_delta_rule_step_stacked_auto`` instead —
    handing pallas a SLICE forces XLA to materialize slice/update copies
    around the opaque call (measured 2× slower than no kernel at b=32)."""
    if cfg.get("use_gdn_kernel", True) and jax.default_backend() == "tpu":
        from llm_quest_tpu.kernels.gdn_pallas import gated_delta_rule_step_pallas

        return gated_delta_rule_step_pallas(q_t, k_t, v_t, beta_t, alpha_t, state)
    return gated_delta_rule_step(q_t, k_t, v_t, beta_t, alpha_t, state)


def gated_delta_rule_step_stacked_auto(cfg, q_t, k_t, v_t, beta_t, alpha_t, stacked, layer):
    """Decode-step dispatch on the model's STACKED (L, b, h, dv, dk)
    recurrent cache: on TPU the in-place Pallas kernel touches only layer
    ``layer``'s blocks (whole-buffer aliasing — 1R+1W of one layer's state,
    no slice/DUS copies); elsewhere the XLA step on the slice with an
    ``.at[layer].set`` write-back (which XLA fuses in place).
    Returns (out (b, h, dv), updated stacked buffer).

    Measured on v5e-1 (flagship 0.8B, 18 GDN layers): b=32 decode 4470 →
    6118 tok/s (+37%) — the XLA step makes 2 full passes over the fp32
    state (decay+v_old, update+out = 2R+1W ≈ 2.0× the 1R+1W floor, profiled
    via scripts/profile_decode_roofline.py) while the kernel keeps the tile
    in VMEM. At b=1 (16 rows, one grid block) launch overhead beats the
    saved pass — the gate keeps XLA's form there (392.6 vs 378.7 tok/s)."""
    rows = q_t.shape[0] * q_t.shape[1]
    if rows > 16 and cfg.get("use_gdn_kernel", True) and jax.default_backend() == "tpu":
        from llm_quest_tpu.kernels.gdn_pallas import gated_delta_rule_step_stacked_pallas

        return gated_delta_rule_step_stacked_pallas(
            q_t, k_t, v_t, beta_t, alpha_t, stacked, layer
        )
    out, new = gated_delta_rule_step(q_t, k_t, v_t, beta_t, alpha_t, stacked[layer])
    return out, stacked.at[layer].set(new)


def gated_delta_rule_auto(
    q, k, v, beta, alpha, prev_state=None, *, chunk_size=64, kernel_chunk_size=128, use_kernel=True
):
    """Dispatch the gated delta rule to the best implementation:

    - sequences ≥ 2 chunks on TPU → the fused Pallas kernel
      (kernels/gdn_pallas.py — state resident in VMEM across chunks)
    - sequences ≥ 2 chunks elsewhere → the chunked XLA form
    - short sequences → the lax.scan recurrence

    ``chunk_size`` governs the XLA chunked form; the kernel has its own
    ``kernel_chunk_size`` (default 128: full-depth 128-lane Newton–Schulz
    matmuls and half the sequential grid steps — 2.21 vs 2.62 ms at c=64 on
    v5e at gb=16, measured fitting VMEM) so a model's gdn_chunk_size doesn't
    silently change the kernel's calibrated tiling, and vice versa.

    Short sequences (round 5): anything s ≥ 2 takes the CHUNKED form with a
    single chunk c = s rather than the scan — the scan reads+writes the
    full fp32 state per TOKEN (a 32-token serving admit at 32 slots moves
    18 layers × 32 × 604 MB ≈ 190 ms of pure state traffic; the
    single-chunk parallel form touches the state once). The scan remains
    the s=1 path and the correctness oracle.
    """
    s = q.shape[2]
    if s >= 2 * min(chunk_size, s):
        if use_kernel and jax.default_backend() == "tpu":
            from llm_quest_tpu.kernels.gdn_pallas import gated_delta_rule_pallas

            if prev_state is None:
                prev_state = jnp.zeros((*v.shape[:2], v.shape[-1], k.shape[-1]), jnp.float32)
            return gated_delta_rule_pallas(q, k, v, beta, alpha, prev_state, kernel_chunk_size)
        return gated_delta_rule_chunked(q, k, v, beta, alpha, prev_state=prev_state, chunk_size=chunk_size)
    if s >= 2:
        return gated_delta_rule_chunked(q, k, v, beta, alpha, prev_state=prev_state, chunk_size=min(chunk_size, s))
    return gated_delta_rule(q, k, v, beta, alpha, prev_state=prev_state)


def gated_delta_rule_dispatch(cfg, q, k, v, beta, alpha, prev_state=None, *, allow_cp=True):
    """Model-level dispatch for the full-sequence gated delta rule: the
    context-parallel LASP form (parallel/sequence.py::gdn_sequence_parallel)
    when ``cfg["context_parallel"]`` is active and the sequence shards
    evenly over its mesh axis, otherwise the single-device fast path
    (``gated_delta_rule_auto``). Mirrors the attention router's CP hook
    (ops/attention.py) so HYBRID models sequence-shard both layer types.

    ``allow_cp``: models pass ``gdn_state is None`` — CP covers training /
    uncached forwards, like the attention CP path (cached prefill keeps the
    local form).
    """
    cp = cfg.get("context_parallel") if cfg is not None else None
    s = q.shape[2]
    if allow_cp and cp is not None:
        axis = cp.get("axis", "data")
        n_dev = cp["mesh"].shape[axis]
        if s % n_dev == 0 and s // n_dev >= 2:
            from llm_quest_tpu.parallel.sequence import gdn_sequence_parallel

            return gdn_sequence_parallel(
                cp["mesh"], axis, q, k, v, beta, alpha,
                chunk_size=cfg.get("gdn_chunk_size", 64),
                kernel_chunk_size=cfg.get("gdn_kernel_chunk_size", 128),
                use_kernel=cfg.get("use_gdn_kernel", True),
                prev_state=prev_state,
            )
    return gated_delta_rule_auto(
        q, k, v, beta, alpha, prev_state=prev_state,
        chunk_size=cfg.get("gdn_chunk_size", 64),
        kernel_chunk_size=cfg.get("gdn_kernel_chunk_size", 128),
        use_kernel=cfg.get("use_gdn_kernel", True),
    )


def init_conv1d(key, channels, kernel_size, *, dtype=jnp.float32):
    """Depthwise conv weights (channels, kernel_size), torch Conv1d init
    (kaiming-uniform with fan_in = kernel_size for groups=channels)."""
    bound = 1.0 / (kernel_size**0.5)
    return {"w": jax.random.uniform(key, (channels, kernel_size), dtype, -bound, bound)}


def causal_conv1d(params, x):
    """Depthwise causal temporal convolution.

    x: (b, s, c) → (b, s, c); left-pads kernel_size-1 zeros so output t only
    sees inputs ≤ t (reference: qwen3_next_attention.py:313-340 with the
    [..., :seq_len] truncation).

    Implemented as kernel_size shifted elementwise multiplies rather than a
    grouped ``lax.conv_general_dilated``: a depthwise k≤4 conv never maps to
    the MXU anyway (pure VPU work either way), and the grouped-conv
    WEIGHT-grad miscounts by the replicated-axis factor when its cotangent
    comes off a shard_map on a partially-used mesh (e.g. 2× on a
    ("data", "model"=2) mesh — measured; the shift form transposes exactly),
    which hybrid-model context parallelism hits.
    """
    w = params["w"]  # (c, k)
    c, ksz = w.shape
    s = x.shape[1]
    xw = x.astype(w.dtype)
    out = xw * w[:, ksz - 1]  # tap aligned with the current token
    for j in range(ksz - 1):
        shift = ksz - 1 - j
        out = out + jnp.pad(xw, ((0, 0), (shift, 0), (0, 0)))[:, :s] * w[:, j]
    return out.astype(x.dtype)


def causal_conv1d_seeded(params, x, conv_state):
    """``causal_conv1d`` CONTINUING from a rolling state: the stored taps
    (b, kernel_size-1, c, oldest first) replace the implicit zero
    left-history, so a multi-token prefill can resume after an earlier
    prefill/decode (chunked prefill, serving prefix caching). A zero state
    reproduces ``causal_conv1d`` exactly — fresh prefills are unchanged.

    Returns (out (b, s, c), ext (b, k-1+s, c)) — ``ext`` is the
    taps-prepended input, which ``conv_state_from_prefill`` should consume
    so the NEXT state can reach back into the seeded taps when s < k-1.
    """
    k1 = params["w"].shape[1] - 1
    ext = jnp.concatenate([conv_state.astype(x.dtype), x], axis=1)
    return causal_conv1d(params, ext)[:, k1:], ext


def causal_conv1d_update(params, x_t, conv_state):
    """Single-step conv with rolling state.

    x_t: (b, c) new input; conv_state: (b, kernel_size-1, c) previous
    inputs (oldest first — time on the SUBLANE axis: channels stay the
    128-lane dim, so the decode-step shift/multiply runs on full tiles;
    the reference's (b, c, k) layout puts k≤4 on the lane axis, which on
    TPU pads every tile 128/(k-1)× — measured 28.7× the HBM floor at
    flagship decode). Returns (out (b, c), new_conv_state).
    (reference: qwen3_5_text_model.py:425-456)
    """
    w = params["w"]  # (c, k)
    c, ksz = w.shape
    # out_t = Σ_j taps[j]·w[:, j] + x_t·w[:, k-1] — unrolled over the ≤3
    # stored taps as (b, c)·(c,) lane-aligned multiplies
    out = x_t.astype(w.dtype) * w[:, ksz - 1]
    for j in range(ksz - 1):
        out = out + conv_state[:, j].astype(w.dtype) * w[:, j]
    new_state = jnp.concatenate([conv_state[:, 1:], x_t[:, None, :].astype(conv_state.dtype)], axis=1)
    return out.astype(x_t.dtype), new_state


def conv_state_from_prefill(x, kernel_size, mask=None):
    """Rolling conv state after a prefill: the last kernel_size-1 inputs,
    zero-padded on the left if the sequence is shorter.

    x: (b, s, c) conv INPUT sequence → (b, kernel_size-1, c) (time on the
    sublane axis — see ``causal_conv1d_update`` for why).

    ``mask``: optional (b, s) bool of REAL tokens. With right-padded rows
    (bucketed serving admission, inference/serving.py) the last columns are
    pads, so the state must instead be the last k-1 inputs ENDING at each
    row's last real token — a per-row gather; pad/invalid taps contribute 0
    (matching the conv's implicit left-zero history).
    """
    b, s, c = x.shape
    if mask is not None:
        k1 = kernel_size - 1
        # index of one past the last real token, per row (all-pad rows → s)
        end = s - jnp.argmax(mask[:, ::-1], axis=1) - jnp.where(jnp.any(mask, 1), 0, s)
        idx_raw = end[:, None] - k1 + jnp.arange(k1)[None, :]  # (b, k-1)
        idx = jnp.clip(idx_raw, 0, s - 1)
        tail = jnp.take_along_axis(x, idx[:, :, None], axis=1)  # (b, k-1, c)
        valid = (idx_raw >= 0) & jnp.take_along_axis(mask, idx, axis=1)
        return tail * valid[:, :, None].astype(x.dtype)
    pad = max(kernel_size - 1 - s, 0)
    tail = x[:, max(s - (kernel_size - 1), 0) :, :]  # (b, ≤k-1, c)
    if pad:
        tail = jnp.concatenate([jnp.zeros((b, pad, c), x.dtype), tail], axis=1)
    return tail


def freeze_masked_updates(beta, alpha, mask):
    """Make masked (pad) time steps a NO-OP on the recurrent state:
    beta=0 (no rank-1 update), alpha=1 (no decay). beta/alpha: (b, h, s);
    mask: (b, s) bool or None. Without this, right-padded prefill rows
    (serving admission) would keep decaying/updating state through pads."""
    if mask is None:
        return beta, alpha
    m = mask[:, None, :]
    return beta * m.astype(beta.dtype), jnp.where(m, alpha, jnp.ones((), alpha.dtype))


def gdn_chunk(qq, kk, vv, bb, aa, state):
    """ONE chunk of the chunked gated delta rule — the shared math between
    the XLA scan (gated_delta_rule_chunked) and the Pallas kernel's backward
    (kernels/gdn_pallas.py recomputes per chunk from saved chunk states).

    qq/kk: (b, h, c, dk) fp32, q PRE-scaled by dk^-0.5; vv: (b, h, c, dv);
    bb/aa: (b, h, c) fp32; state: (b, h, dv, dk) fp32 chunk-initial S₀.
    Returns (new_state, out) with out fp32.
    """
    c = qq.shape[2]
    tril_strict = jnp.tril(jnp.ones((c, c), bool), k=-1)
    tril_incl = jnp.tril(jnp.ones((c, c), bool))
    eye = jnp.eye(c, dtype=jnp.float32)

    lgamma = jnp.cumsum(jnp.log(jnp.maximum(aa, 1e-30)), axis=-1)  # (b, h, c)
    gamma = jnp.exp(lgamma)
    # ratio[t, i] = γ_t/γ_i for i ≤ t (≤ 1); 0 elsewhere
    lr = lgamma[..., :, None] - lgamma[..., None, :]
    ratio = jnp.where(tril_incl, jnp.exp(jnp.minimum(lr, 0.0)), 0.0)

    kkT = jnp.einsum("bhtd,bhid->bhti", kk, kk)  # k_tᵀk_i
    m = eye + jnp.where(tril_strict, bb[..., :, None] * ratio * kkT, 0.0)

    ks0 = jnp.einsum("bhtd,bhvd->bhtv", kk, state)  # K S₀ᵀ (c, dv)
    rhs = (bb * gamma)[..., None] * ks0 - bb[..., None] * vv

    # M⁻¹ via Newton–Schulz X ← X(2I − MX): the residual I − MX SQUARES
    # each step and the strict-lower part of M is nilpotent (Lᶜ = 0), so
    # ceil(log2(c)) iterations give the EXACT inverse in pure MXU matmuls
    # (XLA's TriangularSolve is catastrophically slow on TPU — 500×
    # measured on v5e for these shapes)
    n_newton = max(1, (c - 1).bit_length())
    x_inv = eye - (m - eye)  # X₀ = I − L: residual already L²-order
    for _ in range(n_newton):
        x_inv = x_inv @ (2.0 * eye - m @ x_inv)
    d = jnp.einsum("bhti,bhiv->bhtv", x_inv, rhs)  # (b,h,c,dv)

    qs0 = jnp.einsum("bhtd,bhvd->bhtv", qq, state)  # Q S₀ᵀ
    qkT = jnp.einsum("bhtd,bhid->bhti", qq, kk)  # q_tᵀk_i
    att = jnp.where(tril_incl, ratio * qkT, 0.0)
    out = gamma[..., None] * qs0 - jnp.einsum("bhti,bhiv->bhtv", att, d)

    # γ_C/γ_i strictly in log space — γ itself can underflow fp32 over a
    # chunk (α^64 ≪ 1e-38) while the ratios stay ≤ 1 and well-defined
    lgamma_c = lgamma[..., -1:]  # (b, h, 1)
    ratio_c = jnp.exp(jnp.minimum(lgamma_c - lgamma, 0.0))  # (b, h, c)
    d_scaled = ratio_c[..., None] * d
    gamma_c = jnp.exp(lgamma_c)[..., None]  # (b, h, 1, 1)
    new_state = gamma_c * state - jnp.einsum("bhtv,bhtd->bhvd", d_scaled, kk)
    return new_state, out


def gated_delta_rule_chunked(q, k, v, beta, alpha, prev_state=None, *, chunk_size=64):
    """Chunked-parallel gated delta rule — O(L·C) MXU matmuls instead of an
    L-step recurrence (the SURVEY §7.3 #1 rewrite; exact, not approximate).

    Derivation (validated against the scan oracle to ~1e-5): with
    S_t = α_t·S_{t−1}·(I − β_t k_t k_tᵀ) + β_t v_t k_tᵀ, substituting
    S_t = γ_t·Z_t (γ = within-chunk cumprod of α) removes the decay from the
    transition: Z_t = Z_{t−1} − δ_t k_tᵀ with δ_t = β_t Z_{t−1} k_t − (β_t/γ_t)v_t.
    Scaling d_t = γ_t δ_t yields a UNIT-LOWER-TRIANGULAR system whose entries
    only contain decay RATIOS γ_t/γ_i ≤ 1 (numerically safe):

        (I + strict_tril(β_t·(γ_t/γ_i)·k_iᵀk_t)) D = diag(βγ)·K·S₀ᵀ − diag(β)·V
        o_t  = γ_t·S₀q_t − Σ_{i≤t} (γ_t/γ_i)(k_iᵀq_t)·d_i
        S_C  = γ_C·S₀ − Σ_i (γ_C/γ_i)·d_i k_iᵀ

    One triangular solve + a handful of (C×C×d) matmuls per chunk; chunks
    chain through a lax.scan carry.

    Args/returns match gated_delta_rule (q/k: (b, h, s, dk) pre-repeated,
    v: (b, h, s, dv), beta/alpha: (b, h, s)).
    """
    b, h, s, dk = k.shape
    dv = v.shape[-1]
    dt = q.dtype
    c = min(chunk_size, s)
    s_pad = -(-s // c) * c

    def pad(x, fill=0.0):
        if s_pad == s:
            return x
        # pad along the time axis (axis 2 for both 4-D q/k/v and 3-D beta/alpha)
        widths = [(0, 0), (0, 0), (0, s_pad - s)] + ([(0, 0)] if x.ndim == 4 else [])
        return jnp.pad(x, widths, constant_values=fill)

    q32 = pad(q.astype(jnp.float32) * dk**-0.5)
    k32 = pad(k.astype(jnp.float32))
    v32 = pad(v.astype(jnp.float32))
    beta32 = pad(beta.astype(jnp.float32))  # padded β=0 → no state update
    alpha32 = pad(alpha.astype(jnp.float32), fill=1.0)  # padded α=1 → no decay

    n_chunks = s_pad // c
    # (b, h, n, c, ·) chunk views, scanned over n
    qc = jnp.moveaxis(q32.reshape(b, h, n_chunks, c, dk), 2, 0)
    kc = jnp.moveaxis(k32.reshape(b, h, n_chunks, c, dk), 2, 0)
    vc = jnp.moveaxis(v32.reshape(b, h, n_chunks, c, dv), 2, 0)
    bc = jnp.moveaxis(beta32.reshape(b, h, n_chunks, c), 2, 0)
    ac = jnp.moveaxis(alpha32.reshape(b, h, n_chunks, c), 2, 0)

    if prev_state is None:
        prev_state = jnp.zeros((b, h, dv, dk), jnp.float32)

    def chunk_step(state, xs):
        qq, kk, vv, bb, aa = xs  # (b, h, c, ·)
        return gdn_chunk(qq, kk, vv, bb, aa, state)

    final_state, outs = lax.scan(chunk_step, prev_state, (qc, kc, vc, bc, ac))
    outs = jnp.moveaxis(outs, 0, 2).reshape(b, h, s_pad, dv)[:, :, :s, :]
    return outs.astype(dt), final_state


def gdn_chunk_affine(kk, vv, bb, aa):
    """One chunk of the gated delta rule as an AFFINE map of the incoming
    state: S_C = S₀ @ T + C with

        T = γ_C·I − Kᵀ·(diag(γ_C/γ)·X⁻¹·diag(βγ))ᵀ·K        (dk, dk)
        C = −(diag(γ_C/γ)·X⁻¹·diag(β)·(−V))ᵀ·K … i.e. the zero-state update

    (derived from gdn_chunk: d's S₀-dependence is X⁻¹·diag(βγ)·(K·S₀ᵀ), its
    S₀-free part is −X⁻¹·diag(β)·V, and the state update subtracts
    (ratio_c∘d)ᵀK from γ_C·S₀). This is what makes LINEAR-attention sequence
    parallelism possible: shards compute (T, C) independently, prefix-compose
    the affine maps, then evaluate pass B with the true incoming states
    (parallel/sequence.py::gdn_sequence_parallel).

    kk: (b, h, c, dk) fp32; vv: (b, h, c, dv) fp32; bb/aa: (b, h, c) fp32.
    Returns (T (b, h, dk, dk), C (b, h, dv, dk)) fp32.
    """
    c = kk.shape[2]
    dk = kk.shape[3]
    tril_strict = jnp.tril(jnp.ones((c, c), bool), k=-1)
    tril_incl = jnp.tril(jnp.ones((c, c), bool))
    eye = jnp.eye(c, dtype=jnp.float32)

    lgamma = jnp.cumsum(jnp.log(jnp.maximum(aa, 1e-30)), axis=-1)
    gamma = jnp.exp(lgamma)
    lr = lgamma[..., :, None] - lgamma[..., None, :]
    ratio = jnp.where(tril_incl, jnp.exp(jnp.minimum(lr, 0.0)), 0.0)

    kkT = jnp.einsum("bhtd,bhid->bhti", kk, kk)
    m = eye + jnp.where(tril_strict, bb[..., :, None] * ratio * kkT, 0.0)
    # exact inverse in ceil(log2(c)) Newton–Schulz steps (see gdn_chunk)
    n_newton = max(1, (c - 1).bit_length())
    x_inv = eye - (m - eye)
    for _ in range(n_newton):
        x_inv = x_inv @ (2.0 * eye - m @ x_inv)

    lgamma_c = lgamma[..., -1:]
    ratio_c = jnp.exp(jnp.minimum(lgamma_c - lgamma, 0.0))  # (b, h, c) = γ_C/γ
    gamma_cc = jnp.exp(lgamma_c)[..., None]  # (b, h, 1, 1)

    # T: P̃ = diag(ratio_c) · X⁻¹ · diag(βγ);  T = γ_C·I − Kᵀ P̃ᵀ K
    p_t = ratio_c[..., :, None] * x_inv * (bb * gamma)[..., None, :]
    g = jnp.einsum("bhie,bhti,bhtd->bhed", kk, p_t, kk)
    t_chunk = gamma_cc * jnp.eye(dk, dtype=jnp.float32) - g

    # C: zero-state d = −X⁻¹·(β∘V);  C = −(ratio_c∘d)ᵀ K
    d_ind = -jnp.einsum("bhti,bhiv->bhtv", x_inv, bb[..., None] * vv)
    c_chunk = -jnp.einsum("bhtv,bhtd->bhvd", ratio_c[..., None] * d_ind, kk)
    return t_chunk, c_chunk


def gdn_shard_affine(k, v, beta, alpha, *, chunk_size=64):
    """Compose per-chunk affine maps over a sequence shard (in order):

        T_shard = T₁·T₂·…·T_n,   C_shard = ((C₁·T₂ + C₂)·T₃ + C₃)·…

    so S_out = S_in @ T_shard + C_shard for the whole shard.

    k: (b, h, s, dk); v: (b, h, s, dv); beta/alpha: (b, h, s).
    Returns (T (b, h, dk, dk), C (b, h, dv, dk)) fp32.
    """
    b, h, s, dk = k.shape
    dv = v.shape[-1]
    c = min(chunk_size, s)
    s_pad = -(-s // c) * c
    if s_pad != s:
        k = jnp.pad(k, [(0, 0), (0, 0), (0, s_pad - s), (0, 0)])
        v = jnp.pad(v, [(0, 0), (0, 0), (0, s_pad - s), (0, 0)])
        beta = jnp.pad(beta, [(0, 0), (0, 0), (0, s_pad - s)])  # β=0: no update
        alpha = jnp.pad(alpha, [(0, 0), (0, 0), (0, s_pad - s)], constant_values=1.0)
    n = s_pad // c
    kc = jnp.moveaxis(k.astype(jnp.float32).reshape(b, h, n, c, dk), 2, 0)
    vc = jnp.moveaxis(v.astype(jnp.float32).reshape(b, h, n, c, dv), 2, 0)
    bc = jnp.moveaxis(beta.astype(jnp.float32).reshape(b, h, n, c), 2, 0)
    ac = jnp.moveaxis(alpha.astype(jnp.float32).reshape(b, h, n, c), 2, 0)

    def step(carry, xs):
        t_acc, c_acc = carry
        kk, vv, bb, aa = xs
        t_chunk, c_chunk = gdn_chunk_affine(kk, vv, bb, aa)
        t_new = jnp.einsum("bhde,bhef->bhdf", t_acc, t_chunk)
        c_new = jnp.einsum("bhvd,bhde->bhve", c_acc, t_chunk) + c_chunk
        return (t_new, c_new), None

    t0 = jnp.broadcast_to(jnp.eye(dk, dtype=jnp.float32), (b, h, dk, dk))
    c0 = jnp.zeros((b, h, dv, dk), jnp.float32)
    (t_shard, c_shard), _ = lax.scan(step, (t0, c0), (kc, vc, bc, ac))
    return t_shard, c_shard
