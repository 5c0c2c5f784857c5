"""Quantized grouped matmul (int8 expert stacks) for MoE serving.

Why a kernel: weight-only int8 MoE decode through ``jax.lax.ragged_dot``
wins at b=1 (1.32x, latency-bound) but LOSES at batch — XLA does not fuse
the int8->bf16 convert into ragged_dot's weight read, so it materializes a
dequantized bf16 copy of every expert stack in HBM each step (measured
0.93-0.99x vs bf16 at b=8/32/128; COVERAGE.md). The whole point of int8
weights is reading 1 byte/element from HBM; this kernel does exactly that:
the expert weights stream int8 and are converted in VMEM as the matmul's
operand; the per-(expert, out-channel) scale is a row-indexed XLA epilogue
on the (T, n) output — KBs, vs the MBs of weight traffic the kernel saves.

Design (TPU-native, serving/decode-shaped):
- **Group-aligned m-tiles.** ``ragged_dot`` groups are arbitrary-length row
  runs; a fixed m-tile could straddle two experts. Instead of in-kernel
  boundary masking (megablox-style), the wrapper scatters the sorted rows
  into a layout where every group starts on a ``tile_m`` boundary (cheap:
  the activation rows are KBs vs the MBs of expert weights). Every tile then
  belongs to exactly ONE expert, carried by a scalar-prefetched
  ``expert_of_tile`` array that the weight BlockSpec indexes — the
  dynamic-shape routing problem becomes a static-grid gather.
- **Whole-(d, n) weight blocks.** One block = one expert's full matrix
  (int8, <= a few MB — MoE experts are narrow). Consecutive tiles of the
  same expert see an UNCHANGED block index, so Pallas keeps the block
  resident: each hit expert's weights cross HBM once per call. Experts with
  zero routed tokens are never fetched at all (XLA's dense dequant copies
  touch every expert every step).
- **Forward-only.** Quantized checkpoints are a serving artifact; training
  runs the fp paths. No custom_vjp needed.

Semantics match ``ragged_dot(x, w_q.astype(x.dtype), gs) * scale[expert_of
_row]`` exactly up to matmul association order (tests assert ~1e-5 in f32).

Reference: the torch reference has no quantization (its MoE dispatch is a
python loop, classic_moe.py:110-122); this subsystem is TPU-first serving
work layered on ops/quantization.py + ops/moe.py's sort-based dispatch.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# one expert's int8 block + its bf16 in-register convert + activations must
# fit VMEM alongside double-buffering slack
_VMEM_WEIGHT_BYTES = 6 * 1024 * 1024


def _qgmm_kernel(eot_ref, x_ref, w_ref, o_ref):
    x = x_ref[...]  # (tm, d)
    w = w_ref[0, ...]  # (d, n) int8 — converted in-register below
    acc = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


def supports_qgmm(x, w_q):
    """Real-lowering guard: int8 weights, an expert block that fits VMEM,
    and a TPU backend (CPU tests call with interpret=True directly)."""
    e, d, n = w_q.shape
    return (
        w_q.dtype == jnp.int8
        and x.dtype in (jnp.bfloat16, jnp.float32)
        and d * n <= _VMEM_WEIGHT_BYTES
        and jax.default_backend() == "tpu"
    )


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret"))
def quantized_ragged_dot(x_sorted, w_q, scale, group_sizes, *, tile_m=16, interpret=False):
    """``ragged_dot`` over an int8 expert stack with fused dequantization.

    x_sorted: (T, d) rows sorted by expert (ops/moe.py::dispatch layout);
    w_q: (E, d, n) int8; scale: (E, n) fp32 per-(expert, out-channel);
    group_sizes: (E,) int32 rows per expert, sum == T.
    Returns (T, n) in x_sorted.dtype.
    """
    t, d = x_sorted.shape
    e, d2, n = w_q.shape
    assert d == d2, (x_sorted.shape, w_q.shape)

    sizes = group_sizes.astype(jnp.int32)
    padded = ((sizes + tile_m - 1) // tile_m) * tile_m
    zero = jnp.zeros((1,), jnp.int32)
    off = jnp.concatenate([zero, jnp.cumsum(sizes)[:-1]])
    aligned_off = jnp.concatenate([zero, jnp.cumsum(padded)[:-1]])

    # static worst case: every non-empty group wastes < tile_m rows
    m_pad = -(-(t + e * (tile_m - 1)) // tile_m) * tile_m

    rows = jnp.arange(t, dtype=jnp.int32)
    e_of_row = jnp.searchsorted(off, rows, side="right").astype(jnp.int32) - 1
    dest = aligned_off[e_of_row] + (rows - off[e_of_row])  # group-aligned slot
    x_al = jnp.zeros((m_pad, d), x_sorted.dtype).at[dest].set(x_sorted)

    tile_starts = jnp.arange(m_pad // tile_m, dtype=jnp.int32) * tile_m
    eot = jnp.clip(
        jnp.searchsorted(aligned_off, tile_starts, side="right").astype(jnp.int32) - 1,
        0,
        e - 1,
    )  # (n_tiles,) expert id per m-tile; slack tiles clamp to e-1 (rows are zero)

    acc_dtype = jnp.float32 if x_sorted.dtype == jnp.float32 else jnp.bfloat16
    out_al = pl.pallas_call(
        _qgmm_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m_pad // tile_m,),
            in_specs=[
                pl.BlockSpec((tile_m, d), lambda i, eot: (i, 0)),
                pl.BlockSpec((1, d, n), lambda i, eot: (eot[i], 0, 0)),
            ],
            out_specs=pl.BlockSpec((tile_m, n), lambda i, eot: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), acc_dtype),
        interpret=interpret,
    )(eot, x_al, w_q)

    # per-(expert, out-channel) dequant epilogue — tiny (T, n) elementwise vs
    # the MBs of weights the kernel just streamed int8
    out = out_al[dest] * scale[e_of_row].astype(acc_dtype)
    return out.astype(x_sorted.dtype)
