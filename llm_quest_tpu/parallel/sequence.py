"""Sequence/context parallelism: attention over a sequence-sharded axis.

Green-field for the TPU build (SURVEY §2.1/§5.7: the reference scales context
algorithmically, never across devices). This is the all-gather-KV form
(Ulysses-lite): queries stay sequence-sharded — each device computes
attention for its own s/n_dev query slice — while keys/values are
all-gathered over the ``seq`` axis. Activation memory for q/scores scales
1/n_dev; KV is replicated per step (the ring-attention upgrade streams KV
chunks via ppermute instead — same interface, future kernel).

Causality is preserved with absolute positions: device i's queries occupy
positions [i·s_loc, (i+1)·s_loc).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from llm_quest_tpu.ops.attention import sdpa
from llm_quest_tpu.ops.masks import causal_mask


def sequence_parallel_attention(mesh, axis, q, k, v, *, causal=True):
    """q/k/v: (b, h, s, d) GLOBAL arrays (sharded or shardable along s over
    ``axis``). Returns (b, h, s, d) attention output, sequence-sharded the
    same way."""
    n_dev = mesh.shape[axis]
    s = q.shape[2]
    assert s % n_dev == 0
    s_loc = s // n_dev

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, None, axis, None),) * 3,
        out_specs=P(None, None, axis, None),
        check_rep=False,
    )
    def run(q_loc, k_loc, v_loc):
        idx = lax.axis_index(axis)
        k_full = lax.all_gather(k_loc, axis, axis=2, tiled=True)  # (b, h, s, d)
        v_full = lax.all_gather(v_loc, axis, axis=2, tiled=True)
        mask = causal_mask(s_loc, s, q_start=idx * s_loc) if causal else None
        return sdpa(q_loc, k_full, v_full, mask=mask)

    return run(q, k, v)
