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


def _qk_kernel(q_ref, k_ref, o_ref, *, acc_dtype):
    o_ref[...] = jax.lax.dot_general(
        q_ref[...], k_ref[...],
        (((2,), (2,)), ((0,), (0,))),  # batched over the pair dim, contract d
        preferred_element_type=acc_dtype,
    ).astype(o_ref.dtype)


def make_pallas_qk(dtype, d, acc_dtype, out_dtype):
    spec_in = pl.BlockSpec((GB, M, d), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((GB, M, M), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def run(q, k):
        return pl.pallas_call(
            functools.partial(_qk_kernel, acc_dtype=acc_dtype),
            grid=(G // GB,),
            in_specs=[spec_in, spec_in],
            out_specs=spec_out,
            out_shape=jax.ShapeDtypeStruct((G, M, M), out_dtype),
        )(q, k)

    return run


def timed(fn, q, k, label, flops, consume_full=False):
    # one jitted loop, ONE host transfer (tunnel-safe). The carry perturbs one
    # input element each iteration — without that, q/k are loop-invariant and
    # XLA hoists the entire matmul OUT of the loop (measured: a fake
    # 4375 "TFLOP/s" = 1 iteration's time / N). ``consume_full`` reduces the
    # whole output (needed for XLA dots, where slice(dot) simplifies to a
    # smaller dot; pallas_call is opaque so one element suffices).
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(q, k, n):
        def body(i, carry):
            acc, q = carry
            o = fn(q, k)
            tick = (jnp.sum(o.astype(jnp.float32)) if consume_full
                    else o[0, 0, 0].astype(jnp.float32))
            bump = jnp.where(tick >= 0, 1, -1)
            if q.dtype == jnp.int8:
                q = q.at[0, 0, 0].add(bump.astype(jnp.int8))
            else:
                q = q.at[0, 0, 0].add(bump.astype(q.dtype) * q.dtype.type(1e-2))
            return (acc + tick, q)

        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), q))
        return acc

    # block_until_ready returns EARLY over the axon tunnel (verify skill);
    # float() forces a real device→host transfer. The constant RTT cancels by
    # differencing an N-iteration loop against a 1-iteration loop.
    float(loop(q, k, N_ITERS))  # compile big
    float(loop(q, k, 1))  # compile small
    t0 = time.perf_counter()
    float(loop(q, k, N_ITERS))
    t_big = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(loop(q, k, 1))
    t_small = time.perf_counter() - t0
    dt = max(t_big - t_small, 1e-9) / (N_ITERS - 1)
    log(f"{label:44s} {dt*1e3:7.3f} ms  {flops/dt/1e12:6.1f} TFLOP/s")
    return dt


def main():
    assert jax.default_backend() == "tpu", jax.devices()
    key = jax.random.PRNGKey(0)
    flops = 2 * G * M * M * K

    # bf16 baseline at the real shape
    qb = jax.random.normal(key, (G, M, K), jnp.bfloat16)
    kb = jax.random.normal(key, (G, M, K), jnp.bfloat16)
    t_bf16 = timed(make_pallas_qk(jnp.bfloat16, K, jnp.float32, jnp.float32),
                   qb, kb, f"pallas bf16 ({M},{K})x({K},{M}) fp32 acc", flops)

    # int8 at the same shape (d padded to 128 lanes inside VMEM anyway)
    qi = (jax.random.normal(key, (G, M, K)) * 16).astype(jnp.int8)
    ki = (jax.random.normal(key, (G, M, K)) * 16).astype(jnp.int8)
    try:
        t_int8 = timed(make_pallas_qk(jnp.int8, K, jnp.int32, jnp.int32),
                       qi, ki, f"pallas int8 ({M},{K})x({K},{M}) int32 acc", flops)
    except Exception as e:
        log(f"pallas int8 K={K} failed: {type(e).__name__}: {str(e)[:200]}")
        t_int8 = None

    # int8 with K=128 (full int8 tile depth): does the 2x peak appear at all?
    flops2 = 2 * G * M * M * 128
    qi2 = (jax.random.normal(key, (G, M, 128)) * 16).astype(jnp.int8)
    ki2 = (jax.random.normal(key, (G, M, 128)) * 16).astype(jnp.int8)
    qb2 = jax.random.normal(key, (G, M, 128), jnp.bfloat16)
    kb2 = jax.random.normal(key, (G, M, 128), jnp.bfloat16)
    try:
        timed(make_pallas_qk(jnp.bfloat16, 128, jnp.float32, jnp.float32),
              qb2, kb2, f"pallas bf16 ({M},128)x(128,{M})", flops2)
        timed(make_pallas_qk(jnp.int8, 128, jnp.int32, jnp.int32),
              qi2, ki2, f"pallas int8 ({M},128)x(128,{M})", flops2)
    except Exception as e:
        log(f"pallas K=128 variant failed: {type(e).__name__}: {str(e)[:200]}")

    # XLA lowering comparison
    def xla_qk(acc):
        @jax.jit
        def run(q, k):
            return jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                       preferred_element_type=acc)
        return run

    timed(xla_qk(jnp.float32), qb, kb, "XLA bf16 batched dot (+full reduce)", flops, consume_full=True)
    try:
        timed(xla_qk(jnp.int32), qi, ki, "XLA int8 batched dot (+full reduce)", flops, consume_full=True)
    except Exception as e:
        log(f"XLA int8 failed: {type(e).__name__}: {str(e)[:200]}")

    if t_int8 is not None:
        speedup = t_bf16 / t_int8
        log(f"\nint8/bf16 speedup at ViT shape: {speedup:.2f}x")
        # attention core is 11.2 ms of the 35.3 ms encode; scores are ~half of it
        log("needed for >=4000 img/s: attention core <= 8.3 ms (1.35x overall attention speedup)")


if __name__ == "__main__":
    main()
