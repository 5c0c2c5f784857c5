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

Differentiation: ``gated_delta_rule_pallas`` carries a custom_vjp. The
kernel forward (under grad) additionally streams out each chunk's initial
state S₀ — a small (dv, dk) remat anchor per chunk — and the backward is a
REVERSE lax.scan of per-chunk vjps through the shared chunk math
(ops.gdn.gdn_chunk), chaining the state cotangent chunk-to-chunk. Unlike
the previous design (jax.vjp over the whole XLA chunked scan), no full
forward re-run happens and no full-sequence residuals hit HBM: the primal
pass is pure kernel, the backward works at one chunk's working set.
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
    *rest,  # [schk_ref] (when saving chunk states for the backward) + state_ref
    n_chunks, n_newton, save_states=False,
):
    if save_states:
        schk_ref, state_ref = rest
    else:
        (state_ref,) = rest
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
    if save_states:
        # chunk-initial S₀ — the backward's remat anchor (one small state per
        # chunk instead of full-sequence residuals)
        schk_ref[0, ...] = state

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


@functools.partial(
    jax.jit, static_argnames=("chunk_size", "bh_block", "interpret", "save_chunk_states")
)
def _gdn_pallas_call(
    q, k, v, beta, alpha, prev_state, *, chunk_size=64, bh_block=None, interpret=False,
    save_chunk_states=False,
):
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
    schk_spec = pl.BlockSpec((1, gb, dv, dk), lambda i, j: (j, i, 0, 0), memory_space=pltpu.VMEM)

    out_specs = [seq_spec(dv), st_spec]
    out_shape = [
        jax.ShapeDtypeStruct((bh, s_pad, dv), dt),
        jax.ShapeDtypeStruct((bh, dv, dk), jnp.float32),
    ]
    if save_chunk_states:
        out_specs.append(schk_spec)
        out_shape.append(jax.ShapeDtypeStruct((n_chunks, bh, dv, dk), jnp.float32))

    res = pl.pallas_call(
        functools.partial(
            _gdn_chunk_kernel, n_chunks=n_chunks,
            n_newton=max(1, (c - 1).bit_length()), save_states=save_chunk_states,
        ),
        grid=(bh // gb, n_chunks),
        in_specs=[seq_spec(dk), seq_spec(dk), seq_spec(dv), vec_spec, vec_spec, st_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((gb, dv, dk), jnp.float32)],
        # the default 16 MB scoped-VMEM cap is marginal at gb=16/c=128/
        # dk=dv=128 (the flagship prefill shape measured 17.84 MB under the
        # AOT compile path and failed); v5e has far more physical VMEM —
        # raise the cap instead of shrinking the calibrated tiling
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(qf, kf, vf, bf, af, s0)

    out = res[0].reshape(b, h, s_pad, dv)[:, :, :s, :]
    sfin = res[1].reshape(b, h, dv, dk)
    if save_chunk_states:
        return out, sfin, res[2].reshape(n_chunks, b, h, dv, dk)
    return out, sfin


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def gated_delta_rule_pallas(q, k, v, beta, alpha, prev_state, chunk_size=64, interpret=False):
    """Drop-in fused replacement for ops.gdn.gated_delta_rule_chunked.

    q/k: (b, h, s, dk) heads pre-repeated; v: (b, h, s, dv);
    beta/alpha: (b, h, s); prev_state: (b, h, dv, dk) fp32 (or None upstream).
    Returns (out in q.dtype, final_state fp32).

    Backward: the KERNEL forward additionally saves each chunk's initial
    state S₀ (one small (dv, dk) tensor per chunk — the remat anchor), and
    the backward is a REVERSE scan of per-chunk vjps through the shared
    chunk math (ops.gdn.gdn_chunk): the state cotangent chains chunk-to-
    chunk. No full-sequence XLA forward re-run, no full-sequence residuals
    in HBM — exact gradients at one chunk's working set.
    """
    return _gdn_pallas_call(q, k, v, beta, alpha, prev_state, chunk_size=chunk_size, interpret=interpret)


def _chunk_views(q, k, v, beta, alpha, c):
    """Pad + reshape to (n_chunks, b, h, c, ·) fp32 chunk views, exactly as
    the forward does (q pre-scaled; β pad=0, α pad=1)."""
    b, h, s, dk = k.shape
    s_pad = -(-s // c) * c
    if s_pad != s:
        w4 = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
        w3 = [(0, 0), (0, 0), (0, s_pad - s)]
        q, k, v = jnp.pad(q, w4), jnp.pad(k, w4), jnp.pad(v, w4)
        beta = jnp.pad(beta, w3)
        alpha = jnp.pad(alpha, w3, constant_values=1.0)
    n = s_pad // c
    chunk = lambda x, d: jnp.moveaxis(
        x.astype(jnp.float32).reshape(b, h, n, c, d), 2, 0
    )
    return (
        chunk(q, dk) * (dk**-0.5),
        chunk(k, dk),
        chunk(v, v.shape[-1]),
        jnp.moveaxis(beta.astype(jnp.float32).reshape(b, h, n, c), 2, 0),
        jnp.moveaxis(alpha.astype(jnp.float32).reshape(b, h, n, c), 2, 0),
        s_pad,
    )


def _gdn_fwd(q, k, v, beta, alpha, prev_state, chunk_size, interpret):
    out, sfin, s_chunks = _gdn_pallas_call(
        q, k, v, beta, alpha, prev_state, chunk_size=chunk_size, interpret=interpret,
        save_chunk_states=True,
    )
    return (out, sfin), (q, k, v, beta, alpha, s_chunks)


def _gdn_bwd(chunk_size, interpret, res, cts):
    from llm_quest_tpu.ops.gdn import gdn_chunk

    q, k, v, beta, alpha, s_chunks = res
    ct_out, ct_sfin = cts
    b, h, s, dk = k.shape
    dv = v.shape[-1]
    c = min(chunk_size, s)

    qc, kc, vc, bc, ac, s_pad = _chunk_views(q, k, v, beta, alpha, c)
    ct_o = jnp.moveaxis(
        jnp.pad(ct_out.astype(jnp.float32), [(0, 0), (0, 0), (0, s_pad - s), (0, 0)])
        .reshape(b, h, s_pad // c, c, dv),
        2, 0,
    )

    def bwd_step(d_state, xs):
        qq, kk, vv, bb, aa, s0, ct_oc = xs
        _, vjp = jax.vjp(gdn_chunk, qq, kk, vv, bb, aa, s0)
        dq, dk_, dv_, db, da, ds0 = vjp((d_state, ct_oc))
        return ds0, (dq, dk_, dv_, db, da)

    d_prev, (dqc, dkc, dvc, dbc, dac) = lax.scan(
        bwd_step, ct_sfin, (qc, kc, vc, bc, ac, s_chunks, ct_o), reverse=True
    )

    unchunk = lambda x, d: jnp.moveaxis(x, 0, 2).reshape(b, h, s_pad, d)[:, :, :s]
    dq = (unchunk(dqc, dk) * (dk**-0.5)).astype(q.dtype)
    dk4 = unchunk(dkc, dk).astype(k.dtype)
    dv4 = unchunk(dvc, dv).astype(v.dtype)
    db = jnp.moveaxis(dbc, 0, 2).reshape(b, h, s_pad)[:, :, :s].astype(beta.dtype)
    da = jnp.moveaxis(dac, 0, 2).reshape(b, h, s_pad)[:, :, :s].astype(alpha.dtype)
    return dq, dk4, dv4, db, da, d_prev


gated_delta_rule_pallas.defvjp(_gdn_fwd, _gdn_bwd)


# =================================================================== decode


def _gdn_step_kernel(q_ref, k_ref, v_ref, beta_ref, alpha_ref, s_ref, out_ref, snew_ref):
    """Fused single-token gated-delta-rule step: the fp32 state tile is read
    from HBM ONCE, every intermediate (decayed state, v_old, delta, update,
    output contraction) lives in VMEM/registers, and the state is written
    ONCE. The XLA form (ops/gdn.py::gated_delta_rule_step) lowers to 2-3
    state-sized fusions (decay+v_old pass, update pass, output pass), each
    round-tripping the (b·h, dv, dk) fp32 state through HBM — at flagship
    decode that state is 19 MB/seq/layer-stack and the decode step is
    bandwidth-bound, so the extra passes are directly tokens/sec."""
    q = q_ref[...].astype(jnp.float32) * (q_ref.shape[-1] ** -0.5)  # (gb, dk)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)  # (gb, dv)
    beta = beta_ref[...][:, :1]  # (gb, 1) — lane-broadcast operand
    alpha = alpha_ref[...][:, :1]
    s = s_ref[...]  # (gb, dv, dk) fp32

    # All contractions are per-row matVECs (dk on the lane axis): the MXU
    # form wastes 127/128 of each systolic pass (measured 1.7× SLOWER than
    # the unfused XLA step at b=32); broadcast-multiply + lane-axis reduce
    # keeps everything on the VPU at state-streaming speed.
    gated = alpha[:, :, None] * s
    v_old = jnp.sum(gated * k[:, None, :], axis=2)  # (gb, dv)
    delta = beta * (v - v_old)  # (gb, dv)
    s_new = gated + delta[:, :, None] * k[:, None, :]
    out = jnp.sum(s_new * q[:, None, :], axis=2)  # (gb, dv)
    snew_ref[...] = s_new
    out_ref[...] = out.astype(out_ref.dtype)


def _gdn_step_stacked_kernel(li_ref, q_ref, k_ref, v_ref, beta_ref, alpha_ref,
                             s_ref, out_ref, snew_ref):
    """Stacked-state variant: the refs carry a leading singleton layer dim
    selected by the scalar-prefetched layer index (index_map), and the FULL
    (L, bh, dv, dk) buffer aliases input→output, so the model's per-layer
    slice + dynamic-update-slice around an opaque pallas call — two extra
    full state copies per layer, measured 2× the XLA step at b=32 —
    disappears entirely: only layer li's blocks are DMA'd, in place."""
    q = q_ref[...].astype(jnp.float32) * (q_ref.shape[-1] ** -0.5)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    beta = beta_ref[...][:, :1]
    alpha = alpha_ref[...][:, :1]
    s = s_ref[0, ...]  # (gb, dv, dk) fp32

    gated = alpha[:, :, None] * s
    v_old = jnp.sum(gated * k[:, None, :], axis=2)
    delta = beta * (v - v_old)
    s_new = gated + delta[:, :, None] * k[:, None, :]
    out = jnp.sum(s_new * q[:, None, :], axis=2)
    snew_ref[0, ...] = s_new
    out_ref[...] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bh_block", "interpret"))
def gated_delta_rule_step_stacked_pallas(q_t, k_t, v_t, beta_t, alpha_t, stacked, layer,
                                         *, bh_block=None, interpret=False):
    """In-place fused decode step on a STACKED per-layer state buffer.

    q_t/k_t: (b, h, dk); v_t: (b, h, dv); beta_t/alpha_t: (b, h);
    stacked: (L, b, h, dv, dk) fp32 — every GDN layer's recurrent state;
    layer: int32 layer index (runtime scalar — one compiled kernel serves
    all layers). Returns (out (b, h, dv) in q's dtype, the stacked buffer
    with layer's state updated IN PLACE via input_output_aliases).

    This is the model-integrated form (models/qwen3_5.py::fused_gdn_step):
    handing pallas the whole buffer + index instead of a slice is what
    removes the slice/DUS copies XLA must materialize around an opaque
    kernel call (it fuses them freely around its OWN fusions, which is why
    the unfused XLA step doesn't pay them).
    """
    L, b, h, dv2, dk = stacked.shape[0], *q_t.shape[:2], v_t.shape[-1], k_t.shape[-1]
    dv = dv2
    bh = b * h
    qf, kf = q_t.reshape(bh, dk), k_t.reshape(bh, dk)
    vf = v_t.reshape(bh, dv)
    bf = jnp.broadcast_to(beta_t.astype(jnp.float32).reshape(bh, 1), (bh, 8))
    af = jnp.broadcast_to(alpha_t.astype(jnp.float32).reshape(bh, 1), (bh, 8))
    sf = stacked.reshape(L, bh, dv, dk)

    gb = bh_block or min(bh, 32)
    if bh % gb or not (gb == bh or gb % 8 == 0):
        gb = next(
            (g for g in range(min(gb, bh), 0, -1) if bh % g == 0 and (g == bh or g % 8 == 0)),
            bh,
        )

    row_spec = lambda d: pl.BlockSpec((gb, d), lambda i, li: (i, 0))
    st_spec = pl.BlockSpec((1, gb, dv, dk), lambda i, li: (li[0], i, 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh // gb,),
        in_specs=[row_spec(dk), row_spec(dk), row_spec(dv), row_spec(8), row_spec(8), st_spec],
        out_specs=[row_spec(dv), st_spec],
    )
    out, s_new = pl.pallas_call(
        _gdn_step_stacked_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bh, dv), q_t.dtype),
            jax.ShapeDtypeStruct((L, bh, dv, dk), jnp.float32),
        ],
        # operand 6 = the stacked state (after the 1 scalar-prefetch arg)
        input_output_aliases={6: 1},
        interpret=interpret,
    )(jnp.asarray([layer], jnp.int32), qf, kf, vf, bf, af, sf)
    return out.reshape(b, h, dv), s_new.reshape(stacked.shape)


@functools.partial(jax.jit, static_argnames=("bh_block", "interpret"))
def gated_delta_rule_step_pallas(q_t, k_t, v_t, beta_t, alpha_t, state, *,
                                 bh_block=None, interpret=False):
    """Drop-in fused replacement for ops.gdn.gated_delta_rule_step.

    q_t/k_t: (b, h, dk); v_t: (b, h, dv); beta_t/alpha_t: (b, h);
    state: (b, h, dv, dk) fp32. Returns (out (b, h, dv) in q's dtype,
    new_state fp32). The new state ALIASES the input state buffer
    (input_output_aliases) — no second state allocation.

    Inference-only (the training path differentiates the chunked kernel);
    reference semantics: qwen3_5_text_model.py:459-507.
    """
    b, h, dk = k_t.shape
    dv = v_t.shape[-1]
    bh = b * h
    qf, kf = q_t.reshape(bh, dk), k_t.reshape(bh, dk)
    vf = v_t.reshape(bh, dv)
    # β/α as (bh, 8) fp32 lanes: a (gb, 8) block keeps the operand 2-D and
    # tile-legal; the kernel reads lane 0. 8 lanes × 4 B is noise next to
    # the 64 KB/row state.
    bf = jnp.broadcast_to(beta_t.astype(jnp.float32).reshape(bh, 1), (bh, 8))
    af = jnp.broadcast_to(alpha_t.astype(jnp.float32).reshape(bh, 1), (bh, 8))
    sf = state.reshape(bh, dv, dk).astype(jnp.float32)

    # gb: largest row block ≤ 32 (2 MB fp32 state tile at 128×128 — leaves
    # VMEM room for pipelining) that divides bh and tiles legally
    gb = bh_block or min(bh, 32)
    if bh % gb or not (gb == bh or gb % 8 == 0):
        gb = next(
            (g for g in range(min(gb, bh), 0, -1) if bh % g == 0 and (g == bh or g % 8 == 0)),
            bh,
        )

    row_spec = lambda d: pl.BlockSpec((gb, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    st_spec = pl.BlockSpec((gb, dv, dk), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    out, s_new = pl.pallas_call(
        _gdn_step_kernel,
        grid=(bh // gb,),
        in_specs=[row_spec(dk), row_spec(dk), row_spec(dv), row_spec(8), row_spec(8), st_spec],
        out_specs=[row_spec(dv), st_spec],
        out_shape=[
            jax.ShapeDtypeStruct((bh, dv), q_t.dtype),
            jax.ShapeDtypeStruct((bh, dv, dk), jnp.float32),
        ],
        input_output_aliases={5: 1},
        interpret=interpret,
    )(qf, kf, vf, bf, af, sf)
    return out.reshape(b, h, dv), s_new.reshape(b, h, dv, dk)
