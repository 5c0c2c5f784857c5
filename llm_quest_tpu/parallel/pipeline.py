"""Pipeline parallelism: GPipe-style microbatch pipelining over a mesh axis.

Green-field for the TPU build (the reference is single-device; SURVEY §2.1
lists PP as "stage sharding / shard_map + collective-permute"). Layer blocks
are stacked (n_stages, layers_per_stage, ...) and sharded over the ``stage``
mesh axis; activations flow stage→stage via ``lax.ppermute`` while
microbatches stream in, filling the classic (n_micro + n_stages − 1)-step
schedule. The whole schedule is differentiable (ppermute has a transpose), so
the same function serves training.

Use when a model's layer stack exceeds one chip's HBM; for LLM-quest scales
DP/TP are the defaults (SURVEY §2.1).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import PartitionSpec as P


def stack_stages(block_params_list, n_stages):
    """[n_layers blocks] → pytree stacked (n_stages, layers_per_stage, ...)."""
    n_layers = len(block_params_list)
    assert n_layers % n_stages == 0, "n_layers must divide into equal stages"
    per = n_layers // n_stages
    grouped = [
        jax.tree.map(lambda *xs: jnp.stack(xs), *block_params_list[i * per : (i + 1) * per])
        for i in range(n_stages)
    ]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *grouped)  # (n_stages, per, ...)


def pipeline_apply(mesh, axis, block_fn, stage_params, x, *, n_microbatches):
    """Run stacked layer blocks as a pipeline over ``axis``.

    block_fn(single_block_params, h) → h — one layer's computation.
    stage_params: pytree with leading dims (n_stages, layers_per_stage, ...),
    sharded (or shardable) along dim 0 over ``axis``.
    x: (batch, ...) activations; batch must divide n_microbatches.

    Returns y with the same shape as x after ALL layers.
    """
    n_stages = mesh.shape[axis]
    b = x.shape[0]
    assert b % n_microbatches == 0
    mb = b // n_microbatches
    micro = x.reshape(n_microbatches, mb, *x.shape[1:])

    def stage_fn(local_params, h):
        # local_params: (1, per, ...) → scan over this stage's layers
        def layer(h, p):
            return block_fn(p, h), None

        h, _ = lax.scan(layer, h, jax.tree.map(lambda t: t[0], local_params))
        return h

    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    def run(stage_params_local, micro_all):
        stage_id = lax.axis_index(axis)
        n_steps = n_microbatches + n_stages - 1
        buf = jnp.zeros_like(micro_all[0])  # incoming activation slot
        out = jnp.zeros_like(micro_all)

        def step(carry, t):
            buf, out = carry
            # stage 0 injects microbatch t (clamped index; junk past the end)
            inject = micro_all[jnp.minimum(t, n_microbatches - 1)]
            h_in = jnp.where(stage_id == 0, inject, buf)
            h_out = stage_fn(stage_params_local, h_in)
            # last stage writes its result for microbatch t-(n_stages-1)
            out_idx = jnp.clip(t - (n_stages - 1), 0, n_microbatches - 1)
            write = (stage_id == n_stages - 1) & (t >= n_stages - 1)
            out = lax.dynamic_update_index_in_dim(
                out, jnp.where(write, h_out, out[out_idx]), out_idx, 0
            )
            buf = lax.ppermute(h_out, axis, perm)
            return (buf, out), None

        (buf, out), _ = lax.scan(step, (buf, out), jnp.arange(n_steps))
        # only the last stage holds real outputs; share them with everyone
        out = jnp.where(stage_id == n_stages - 1, out, jnp.zeros_like(out))
        return lax.psum(out, axis)

    y = run(stage_params, micro)
    return y.reshape(b, *x.shape[1:])
