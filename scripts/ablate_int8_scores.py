"""Int8 score-arithmetic ablation for the ViT-B ≥4000 img/s north-star.

The round-2 roofline note (COVERAGE.md) showed ViT-B/224 encode is bound by
the attention-core batched GEMMs: 1536 (208,64)·(64,208) matmuls/layer
sustain ~35 TFLOPs on v5e (small-K contractions can't split across the four
MXUs), capping the encode at 3628 img/s vs the 4000 bar. The one untried
escape hatch it named: INT8 score arithmetic — if the MXU's int8 path runs
these shapes ≥~50 TFLOP-equivalents, a quantized-QKᵀ kernel (int8 matmul,
fp32 softmax) closes the gap; if not, the ceiling claim gets its missing
ablation and the bar is re-baselined with data.

Measures, all inside one jitted fori_loop per variant (tunnel-safe timing):
  1. bf16 Pallas batched QKᵀ at the exact ViT shapes (the 35 TFLOPs baseline)
  2. int8 Pallas batched QKᵀ, d padded to the int8 lane width
  3. int8 with double-width K (d=128) — tests whether int8's 2× peak shows
     up at all on K large enough to fill the tile
  4. the same three via plain XLA dot_general (sanity: Mosaic vs XLA lowering)

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/ablate_int8_scores.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G, M, K = 1536, 208, 64  # ViT-B/224 b=128: G = b·h, M = padded s=197, K = head dim
N_ITERS = 200
GB = 16  # pairs per program


def log(msg):
    print(msg, flush=True)



def _attn_kernel(t_ref, q_ref, k_ref, v_ref, o_ref, *, acc_dtype):
    """One fused attention-core program: s = q·kᵀ (scores stay in VMEM),
    o = cast(s)·(v+t). ``t`` is a tiny bf16 per-iteration perturbation input:
    the kernel is opaque to XLA, so ANY changing input defeats loop hoisting
    of the whole program (an int8 t block crashes Mosaic — sub-tile int8)."""
    s = jax.lax.dot_general(
        q_ref[...], k_ref[...], (((2,), (2,)), ((0,), (0,))), preferred_element_type=acc_dtype
    )
    pv = s.astype(jnp.bfloat16)
    o_ref[...] = jax.lax.dot_general(
        pv, v_ref[...] + t_ref[0], (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def make_attn_core(score_dtype, d, acc_dtype, m=M):
    spec_qk = pl.BlockSpec((GB, m, d), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    spec_v = pl.BlockSpec((GB, m, K), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    spec_t = pl.BlockSpec((1, 1, K), lambda g: (0, 0, 0), memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((GB, m, K), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def run(t, q, k, v):
        return pl.pallas_call(
            functools.partial(_attn_kernel, acc_dtype=acc_dtype),
            grid=(G // GB,),
            in_specs=[spec_t, spec_qk, spec_qk, spec_v],
            out_specs=spec_out,
            out_shape=jax.ShapeDtypeStruct((G, m, K), jnp.bfloat16),
        )(t, q, k, v)

    return run


def timed(fn, q, k, v, label, flops):
    """N-vs-1 loop differencing with float() transfers (the tunnel's
    block_until_ready returns early); the carry feeds a TINY (1, 1, d)
    perturbation input so every iteration must recompute, at no copy cost."""

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(q, k, v, n):
        def body(i, acc):
            t = (jnp.sign(acc) * 0.01 * jnp.ones((1, 1, v.shape[-1]))).astype(jnp.bfloat16)
            o = fn(t, q, k, v)
            return acc + o[0, 0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(loop(q, k, v, N_ITERS))
    float(loop(q, k, v, 1))
    t0 = time.perf_counter()
    float(loop(q, k, v, N_ITERS))
    t_big = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(loop(q, k, v, 1))
    t_small = time.perf_counter() - t0
    dt = max(t_big - t_small, 1e-9) / (N_ITERS - 1)
    log(f"{label:46s} {dt*1e3:7.3f} ms  {flops/dt/1e12:6.1f} TFLOP/s")
    return dt


def main():
    assert jax.default_backend() == "tpu", jax.devices()
    key = jax.random.PRNGKey(0)
    flops = 4 * G * M * M * K  # QK^T + AV

    kb = jax.random.normal(key, (G, M, K), jnp.bfloat16)
    vb = jax.random.normal(key, (G, M, K), jnp.bfloat16)
    qb = jax.random.normal(key, (G, M, K), jnp.bfloat16)
    qi = (qb * 16).astype(jnp.int8)
    ki = (kb * 16).astype(jnp.int8)

    t_bf16 = timed(make_attn_core(jnp.bfloat16, K, jnp.float32), qb, kb, vb,
                   "attn core bf16 scores (QKt+AV, VMEM scores)", flops)

    # int8 tile rules: min tile (32, 128) — M=208 and K=64 are both illegal
    # for int8 operands, so the int8 variant runs at the NEXT LEGAL padding
    # (M=224, K=128, zero-filled). Same useful FLOPs; the comparison is
    # wall-clock for the same logical attention core.
    qi = jnp.zeros((G, 224, 128), jnp.int8).at[:, :208, :K].set((qb * 16).astype(jnp.int8))
    ki = jnp.zeros((G, 224, 128), jnp.int8).at[:, :208, :K].set((kb * 16).astype(jnp.int8))
    vp = jnp.zeros((G, 224, K), jnp.bfloat16).at[:, :208, :].set(vb)
    try:
        t_int8 = timed(make_attn_core(jnp.int8, 128, jnp.int32, m=224), qi, ki, vp,
                       "attn core int8 scores (224,128 padded)", flops)
    except Exception as e:
        log(f"int8 attn core failed: {type(e).__name__}: {str(e)[:300]}")
        t_int8 = None

    if t_int8 is not None:
        log(f"\nattention-core speedup from int8 scores: {t_bf16/t_int8:.2f}x")
        log("ViT-B needs the 11.2 ms attention core at <= 8.3 ms (1.35x) for 4000 img/s;")
        log(f"int8 scores deliver core time x{t_int8/t_bf16:.2f} -> "
            f"{11.2*t_int8/t_bf16:.1f} ms equivalent")
    # NOTE: XLA dot_general variants were removed from this ablation — XLA's
    # algebraic simplifier rewrites sum(dot(q, k^T)) into dot(q, sum(k)) (a
    # matvec), producing impossible 200-340 "TFLOP/s" readings. Only the
    # opaque Pallas kernels measure the real MXU rate.


if __name__ == "__main__":
    main()
