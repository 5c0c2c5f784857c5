"""Quantized grouped-matmul kernel vs XLA paths on the real chip.

Shapes = the Qwen3-MoE-1B decode dispatch (scripts/bench_quantized_decode.py
config): d=1024, moe_hidden=704, E=16 experts, rows = batch x top_k.
Timing via N-vs-1 in-graph loop differencing with a true host transfer
(block_until_ready returns early over the axon tunnel).
"""

import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/llm_quest_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from llm_quest_tpu.kernels.quantized_gmm import quantized_ragged_dot  # noqa: E402

E, D, N = 16, 1024, 704
REPS = 2000


def timed(fn, *args):
    # the carry perturbs x each iteration — defeats XLA's loop-invariant
    # hoisting of the whole matmul (measured: an unperturbed bf16 oracle
    # "times" ~0 us; see scripts/ablate_int8_scores.py methodology notes)
    @functools.partial(jax.jit, static_argnames=("reps",))
    def loop(reps, x, *a):
        def body(i, acc):
            xp = x + (acc * jnp.float32(1e-12)).astype(x.dtype)
            y = fn(xp, *a)
            return acc + y[0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    _ = float(loop(1, *args))  # compile both program shapes
    _ = float(loop(REPS + 1, *args))
    best = float("inf")
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(loop(1, *args))
        mid = time.perf_counter()
        _ = float(loop(REPS + 1, *args))
        end = time.perf_counter()
        best = min(best, ((end - mid) - (mid - t0)) / REPS)
    return best


def oracle_int8(x, w_q, scale, gs, e_of_row):
    y = jax.lax.ragged_dot(x, w_q.astype(x.dtype), gs)
    return y * scale[e_of_row].astype(y.dtype)


def oracle_bf16(x, w, gs):
    return jax.lax.ragged_dot(x, w, gs)


def main():
    rng = np.random.default_rng(0)
    w_q = jnp.asarray(rng.integers(-127, 128, size=(E, D, N)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.001, 0.02, size=(E, N)), jnp.float32)
    w_bf = (w_q.astype(jnp.float32) * scale[:, None, :]).astype(jnp.bfloat16)

    results = {}
    for batch, topk in ((1, 4), (8, 4), (32, 4), (128, 4)):
        t = batch * topk
        x = jnp.asarray(rng.standard_normal((t, D)), jnp.bfloat16)
        idx = np.sort(rng.integers(0, E, size=t))
        sizes = np.bincount(idx, minlength=E)
        gs = jnp.asarray(sizes, jnp.int32)
        e_of_row = jnp.asarray(idx, jnp.int32)

        got = quantized_ragged_dot(x, w_q, scale, gs, tile_m=16)
        ref = oracle_int8(x, w_q, scale, gs, e_of_row)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
        ok = err < 0.5  # bf16 matmul assoc-order tolerance at |y|~30

        t_k = timed(lambda a, b, c, d: quantized_ragged_dot(a, b, c, d, tile_m=16), x, w_q, scale, gs)
        t_i8 = timed(oracle_int8, x, w_q, scale, gs, e_of_row)
        t_bf = timed(oracle_bf16, x, w_bf, gs)
        results[f"b{batch}"] = {
            "kernel_us": round(t_k * 1e6, 1),
            "xla_int8_us": round(t_i8 * 1e6, 1),
            "xla_bf16_us": round(t_bf * 1e6, 1),
            "kernel_vs_bf16": round(t_bf / t_k, 2),
            "max_err": round(err, 4),
            "parity_ok": ok,
        }
        print(batch, results[f"b{batch}"], flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
