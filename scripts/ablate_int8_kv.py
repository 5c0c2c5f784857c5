"""Does XLA fuse int8->bf16 KV dequantization into decode attention?

Decode attention at long context is KV-bandwidth-bound: q is one row, and
every step re-reads the whole (b, h, S, d) K and V from HBM. int8 KV halves
those bytes — IF the convert+scale is fused into the dot's operand read. If
XLA instead materializes a dequantized bf16 copy of the cache each step
(what it does for ragged_dot expert stacks, see kernels/quantized_gmm.py),
the traffic DOUBLES instead. This ablation measures the decode-attention
core both ways on the real chip before we build anything.

Timing: N-vs-1 in-graph fori_loop differencing with a carry perturbation of
q (defeats loop-invariant hoisting; see scripts/ablate_int8_scores.py for
the methodology traps).
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

REPS = 200


def timed(fn, *args):
    @functools.partial(jax.jit, static_argnames=("reps",))
    def loop(reps, q, *a):
        def body(i, acc):
            qp = q + (acc * jnp.float32(1e-12)).astype(q.dtype)
            y = fn(qp, *a)
            return acc + y.reshape(-1)[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    _ = float(loop(1, *args))
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


def core_bf16(q, k, v):
    # decode attention core: (b,h,1,d)x(b,h,S,d) -> softmax -> (b,h,1,dv)
    s = jnp.einsum("bhqd,bhsd->bhqs", q, k.astype(q.dtype)) * (q.shape[-1] ** -0.5)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqs,bhsd->bhqd", p, v.astype(q.dtype))


def core_int8(q, k_q, k_s, v_q, v_s):
    # dequant-inline form: scale per (b, h, S) position
    k = k_q.astype(q.dtype) * k_s[..., None].astype(q.dtype)
    v = v_q.astype(q.dtype) * v_s[..., None].astype(q.dtype)
    return core_bf16(q, k, v)


def core_int8_reassoc(q, k_q, k_s, v_q, v_s):
    # reassociated: scores = (q . k_q) * k_s  — the dequant never touches the
    # (S, d) tensor, only the (S,) score columns; same for v via p * v_s.
    s = jnp.einsum("bhqd,bhsd->bhqs", q, k_q.astype(q.dtype))
    s = s * k_s[:, :, None, :].astype(s.dtype) * (q.shape[-1] ** -0.5)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    p = (p * v_s[:, :, None, :].astype(jnp.float32)).astype(q.dtype)
    return jnp.einsum("bhqs,bhsd->bhqd", p, v_q.astype(q.dtype))


def main():
    rng = np.random.default_rng(0)
    results = {}
    for b, h, S, d in ((8, 8, 4096, 64), (32, 8, 2048, 64), (1, 16, 8192, 64)):
        q = jnp.asarray(rng.standard_normal((b, h, 1, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, h, S, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, h, S, d)), jnp.bfloat16)
        k_s = jnp.abs(k).max(axis=-1).astype(jnp.float32) / 127.0
        v_s = jnp.abs(v).max(axis=-1).astype(jnp.float32) / 127.0
        k_q = jnp.clip(jnp.round(k.astype(jnp.float32) / k_s[..., None]), -127, 127).astype(jnp.int8)
        v_q = jnp.clip(jnp.round(v.astype(jnp.float32) / v_s[..., None]), -127, 127).astype(jnp.int8)

        ref = core_bf16(q, k, v)
        got = core_int8_reassoc(q, k_q, k_s, v_q, v_s)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))

        t_bf = timed(core_bf16, q, k, v)
        t_i8 = timed(core_int8, q, k_q, k_s, v_q, v_s)
        t_re = timed(core_int8_reassoc, q, k_q, k_s, v_q, v_s)
        key = f"b{b}_h{h}_S{S}"
        results[key] = {
            "bf16_us": round(t_bf * 1e6, 1),
            "int8_dequant_us": round(t_i8 * 1e6, 1),
            "int8_reassoc_us": round(t_re * 1e6, 1),
            "reassoc_vs_bf16": round(t_bf / t_re, 2),
            "quant_err": round(err, 4),
        }
        print(key, results[key], flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
