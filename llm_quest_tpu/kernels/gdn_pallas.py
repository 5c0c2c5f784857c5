"""Pallas TPU kernel for the chunked gated delta rule.

Fuses one chunk's ENTIRE update — decay ratios, K·Kᵀ, the Newton–Schulz
triangular inverse, intra-chunk attention and the state transition — into a
single program, with the fp32 recurrent state S (bh, dv, dk) living in VMEM
scratch across the sequential chunk grid. The XLA form (ops/gdn.py::
gated_delta_rule_chunked, the math oracle) round-trips the state and ~8
(bh, c, c) intermediates through HBM on every lax.scan step; here only the
chunk inputs stream in and the chunk outputs stream out.

Grid: (bh_blocks, n_chunks) — the chunk axis is innermost, so for each block
of (batch·head) rows the chunks run in order and the scratch state carries;
it is reset at chunk 0 from the prev_state operand.

Math (identical to ops/gdn.py:165-262, derivation documented there):
    (I + strict_tril(β_t·(γ_t/γ_i)·k_iᵀk_t)) D = diag(βγ)·K·S₀ᵀ − diag(β)·V
    o_t  = γ_t·S₀q_t − Σ_{i≤t} (γ_t/γ_i)(k_iᵀq_t)·d_i
    S_C  = γ_C·S₀ − Σ_i (γ_C/γ_i)·d_i k_iᵀ
with the Newton–Schulz exact inverse (residual squares each step; the strict
lower triangle is nilpotent) replacing XLA's TriangularSolve (~500× slower
on TPU at these shapes).

Differentiation: ``gated_delta_rule_pallas`` carries a custom_vjp whose
backward recomputes through the XLA chunked form — exact gradients, so the
kernel is safe inside training steps.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gdn_chunk_kernel(
    q_ref, k_ref, v_ref, beta_ref, alpha_ref, s0_ref,
    out_ref, sfin_ref,
    state_ref,  # VMEM scratch (gb, dv, dk) fp32 — persists across chunk steps
    *, n_chunks, n_newton,
):
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _init():
        state_ref[...] = s0_ref[...].astype(jnp.float32)

    q = q_ref[...].astype(jnp.float32) * (q_ref.shape[-1] ** -0.5)  # (gb, c, dk)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)  # (gb, c, dv)
    bb = beta_ref[0].astype(jnp.float32)  # (gb, c) — blocked as (1, gb, c)
    aa = alpha_ref[0].astype(jnp.float32)
    state = state_ref[...]  # (gb, dv, dk)

    c = q.shape[1]
    row = lax.broadcasted_iota(jnp.int32, (c, c), 0)
    col = lax.broadcasted_iota(jnp.int32, (c, c), 1)
    tril_strict = col < row
    tril_incl = col <= row
    eye = jnp.where(row == col, 1.0, 0.0)

    # cumsum as a triangular-ones matmul (Mosaic has no cumsum primitive):
    # lgamma[g, t] = Σ_{i≤t} log α[g, i]
    cumsum_m = jnp.where(row <= col, 1.0, 0.0)  # (c, c): i ≤ t
    lgamma = lax.dot_general(
        jnp.log(jnp.maximum(aa, 1e-30)), cumsum_m, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (gb, c)
    gamma = jnp.exp(lgamma)
    lr = lgamma[..., :, None] - lgamma[..., None, :]
    ratio = jnp.where(tril_incl[None], jnp.exp(jnp.minimum(lr, 0.0)), 0.0)  # (gb, c, c)

    bdot = lambda a, b: lax.dot_general(  # batched (gb) matmul, fp32 accum
        a, b, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    bdot_nt = lambda a, b: lax.dot_general(  # contract a's last with b's middle
        a, b, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )

    kkT = bdot(k, k)  # (gb, c, c): k_t·k_i
    m = eye[None] + jnp.where(tril_strict[None], bb[..., :, None] * ratio * kkT, 0.0)

    ks0 = bdot(k, state)  # (gb, c, dv): K·S₀ᵀ
    rhs = (bb * gamma)[..., None] * ks0 - bb[..., None] * v

    # Newton–Schulz exact inverse in pure MXU matmuls
    x_inv = 2.0 * eye[None] - m  # X₀ = I − L: residual is already L²-order
    for _ in range(n_newton):
        x_inv = bdot_nt(x_inv, 2.0 * eye[None] - bdot_nt(m, x_inv))
    d = bdot_nt(x_inv, rhs)  # (gb, c, dv)

    qs0 = bdot(q, state)  # (gb, c, dv)
    qkT = bdot(q, k)  # (gb, c, c)
    att = jnp.where(tril_incl[None], ratio * qkT, 0.0)
    out = gamma[..., None] * qs0 - bdot_nt(att, d)
    out_ref[...] = out.astype(out_ref.dtype)

    lgamma_c = lgamma[..., -1:]
    ratio_c = jnp.exp(jnp.minimum(lgamma_c - lgamma, 0.0))  # (gb, c)
    d_scaled = ratio_c[..., None] * d  # (gb, c, dv)
    gamma_c = jnp.exp(lgamma_c)[..., None]  # (gb, 1, 1)
    # S ← γ_C·S − Σ_t d̃_t k_tᵀ  == γ_C·S − d̃ᵀ·k  (contract the chunk axis)
    dTk = lax.dot_general(d_scaled, k, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    new_state = gamma_c * state - dTk  # (gb, dv, dk)
    state_ref[...] = new_state

    @pl.when(ci == n_chunks - 1)
    def _fin():
        sfin_ref[...] = new_state


@functools.partial(jax.jit, static_argnames=("chunk_size", "bh_block", "interpret"))
def _gdn_pallas_call(q, k, v, beta, alpha, prev_state, *, chunk_size=64, bh_block=None, interpret=False):
    b, h, s, dk = k.shape
    dv = v.shape[-1]
    dt = q.dtype
    c = min(chunk_size, s)
    s_pad = -(-s // c) * c

    if s_pad != s:
        w4 = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
        w3 = [(0, 0), (0, 0), (0, s_pad - s)]
        q, k, v = jnp.pad(q, w4), jnp.pad(k, w4), jnp.pad(v, w4)
        beta = jnp.pad(beta, w3)  # β=0 → no state update from padding
        alpha = jnp.pad(alpha, w3, constant_values=1.0)  # α=1 → no decay

    bh = b * h
    n_chunks = s_pad // c
    qf, kf = q.reshape(bh, s_pad, dk), k.reshape(bh, s_pad, dk)
    vf = v.reshape(bh, s_pad, dv)
    # β/α laid out (n_chunks, bh, c): a (1, gb, c) block keeps the trailing
    # two dims tile-legal (gb % 8 == 0 or == bh; c == full last dim)
    bf = jnp.moveaxis(beta.reshape(bh, n_chunks, c), 1, 0).astype(jnp.float32)
    af = jnp.moveaxis(alpha.reshape(bh, n_chunks, c), 1, 0).astype(jnp.float32)
    s0 = prev_state.reshape(bh, dv, dk).astype(jnp.float32)

    # gb must divide bh AND keep the (1, gb, c) β/α block tile-legal on real
    # TPU lowering: gb == bh (block == array dim) or gb % 8 == 0
    gb = bh_block or min(bh, 16)  # 32 exceeds the 16 MB scoped-VMEM limit at dk=dv=128
    if bh % gb or not (gb == bh or gb % 8 == 0):
        gb = next(
            (g for g in range(min(gb, bh), 0, -1) if bh % g == 0 and (g == bh or g % 8 == 0)),
            bh,
        )

    seq_spec = lambda d: pl.BlockSpec((gb, c, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, gb, c), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM)
    st_spec = pl.BlockSpec((gb, dv, dk), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)

    out, sfin = pl.pallas_call(
        functools.partial(_gdn_chunk_kernel, n_chunks=n_chunks, n_newton=max(1, (c - 1).bit_length())),
        grid=(bh // gb, n_chunks),
        in_specs=[seq_spec(dk), seq_spec(dk), seq_spec(dv), vec_spec, vec_spec, st_spec],
        out_specs=[seq_spec(dv), st_spec],
        out_shape=[
            jax.ShapeDtypeStruct((bh, s_pad, dv), dt),
            jax.ShapeDtypeStruct((bh, dv, dk), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((gb, dv, dk), jnp.float32)],
        interpret=interpret,
    )(qf, kf, vf, bf, af, s0)

    out = out.reshape(b, h, s_pad, dv)[:, :, :s, :]
    return out, sfin.reshape(b, h, dv, dk)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def gated_delta_rule_pallas(q, k, v, beta, alpha, prev_state, chunk_size=64, interpret=False):
    """Drop-in fused replacement for ops.gdn.gated_delta_rule_chunked.

    q/k: (b, h, s, dk) heads pre-repeated; v: (b, h, s, dv);
    beta/alpha: (b, h, s); prev_state: (b, h, dv, dk) fp32 (or None upstream).
    Returns (out in q.dtype, final_state fp32). Backward recomputes through
    the XLA chunked form (exact gradients).
    """
    return _gdn_pallas_call(q, k, v, beta, alpha, prev_state, chunk_size=chunk_size, interpret=interpret)


def _gdn_fwd(q, k, v, beta, alpha, prev_state, chunk_size, interpret):
    out = _gdn_pallas_call(q, k, v, beta, alpha, prev_state, chunk_size=chunk_size, interpret=interpret)
    return out, (q, k, v, beta, alpha, prev_state)


def _gdn_bwd(chunk_size, interpret, res, cts):
    from llm_quest_tpu.ops.gdn import gated_delta_rule_chunked

    q, k, v, beta, alpha, prev_state = res
    _, vjp = jax.vjp(
        lambda q, k, v, b_, a_, s0: gated_delta_rule_chunked(q, k, v, b_, a_, s0, chunk_size=chunk_size),
        q, k, v, beta, alpha, prev_state,
    )
    return vjp(cts)


gated_delta_rule_pallas.defvjp(_gdn_fwd, _gdn_bwd)
