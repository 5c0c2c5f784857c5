"""Expert parallelism: all-to-all token dispatch via shard_map.

Green-field for the TPU build (SURVEY §2.1 EP row). The reference dispatches
with a python loop over hit experts (moe/classic_moe.py:110-122) on one
device; the first TPU form here sharded stacked expert WEIGHTS over "model"
and let XLA propagate through ragged_dot — correct, but every token's
activations implicitly visit every model shard. This module is the designed
communication pattern instead (GShard/Switch-style):

  1. tokens are batch-sharded over BOTH mesh axes (("data", ep_axis)) — in
     pure-EP terms, DP ranks double as EP ranks;
  2. each device routes its local tokens (top-k gate, computed locally),
     capacity-buckets them into a (num_experts, capacity, d) dispatch buffer
     (scatter by within-expert rank; overflow beyond capacity is dropped,
     exactly the Switch/GShard contract — capacity_factor=None makes the
     buffer lossless for parity testing);
  3. ONE ``lax.all_to_all`` over the EP axis sends each expert-group slice to
     the device holding those experts;
  4. resident experts run as dense batched matmuls over their fixed-capacity
     buffers — (E_loc, n_ep·C, d) × (E_loc, d, h) on the MXU, no ragged
     grouping needed because bucketing already grouped the tokens;
  5. ONE reverse all_to_all returns results; each device gathers its tokens'
     slots and weight-combines.

Per MoE layer the communication is exactly 2 all-to-alls of E·C·d elements
per device (+ two E-sized psums for the global load-balance loss), riding
ICI inside the shard_map. Differentiable end-to-end: all_to_all transposes
to all_to_all, the scatter/gather pair transposes to gather/scatter.

The load-balance loss here is the GLOBAL form — counts and router probs are
psum'd over all token shards before N·Σf·p — which is what the reference
explicitly notes it cannot do ("no distributed training here, so Global LBL
reduces to the classic LBL", moe/qwen3_moe.py:6-7).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import PartitionSpec as P

from llm_quest_tpu.ops.activations import silu
from llm_quest_tpu.ops.moe import _shared_experts_sum


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def _run_region_pinned(run, mesh, params, x, data_axis, ep_axis, pin_output):
    """Call the EP shard_map with explicit sharding constraints at the
    region boundary: tokens enter (data×ep)-sharded; with ``pin_output``
    they LEAVE data-only-sharded.

    The exit pin is OPT-IN (the serving engine sets it) because the two
    callers want opposite things:

    - TRAINING wants the residual stream to STAY (data×ep)-batch-sharded
      between MoE layers — every device keeps working on its token shard
      and the 2-all-to-all pattern is the only EP communication. Pinning
      the exit would all-gather activations over ep after every MoE layer
      for nothing.
    - SERVING decode pins the KV-cache pool (slots→"data", heads→"model").
      Without the exit pin, GSPMD propagates the (data, ep) batch sharding
      from the shard_map boundary backward through the residual stream to
      the cache `dynamic_update_slice`, and the partitioner falls back to
      "involuntary full rematerialization" — replicate + repartition the
      cache EVERY chunk. There the boundary reshard of (b, s, d)
      activations is cheap next to a cache round-trip; the multichip
      dryrun FAILS on that warning (__graft_entry__.dryrun_multichip), so
      a regression cannot land silently."""
    from jax.sharding import NamedSharding

    x = lax.with_sharding_constraint(
        x, NamedSharding(mesh, P((data_axis, ep_axis), None, None))
    )
    out, aux = run(params, x)
    if pin_output:
        out = lax.with_sharding_constraint(
            out, NamedSharding(mesh, P(data_axis, None, None))
        )
    return out, aux


def capacity_for(tokens_local, top_k, num_experts, capacity_factor):
    """Static per-expert buffer capacity. ``None`` → lossless (every
    assignment fits even if all tokens pick the same expert)."""
    full = tokens_local * top_k
    if capacity_factor is None:
        return full
    cap = _round_up(max(int(capacity_factor * full / num_experts), 8), 8)
    return min(cap, full)


def _bucket(x_rows, flat_e, num_experts, capacity):
    """Scatter per-ASSIGNMENT rows (token·slot expanded, (N, d)) into a
    (E, C, d) capacity-bucketed buffer.

    Returns (buffer, pos, keep): ``pos`` is each assignment's rank within its
    expert, ``keep`` masks assignments that fit under the capacity.
    """
    oh = jax.nn.one_hot(flat_e, num_experts, dtype=jnp.int32)  # (N, E)
    pos = jnp.sum(jnp.cumsum(oh, axis=0) * oh, axis=-1) - 1  # (N,)
    keep = pos < capacity
    pos_c = jnp.clip(pos, 0, capacity - 1)
    buf = jnp.zeros((num_experts, capacity, x_rows.shape[-1]), x_rows.dtype)
    buf = buf.at[flat_e, pos_c].add(x_rows * keep[:, None].astype(x_rows.dtype))
    return buf, pos_c, keep


def _expert_mlp_batched(experts, buf, activation):
    """Dense batched expert MLP over fixed-capacity buffers.

    buf: (E_loc, G, d); experts arrays are the LOCAL (E_loc, ...) shards of
    the stacked expert weights from ops.moe.init_expert_stack.
    """
    h = jnp.einsum("egd,edh->egh", buf, experts["lin1"])
    if "b1" in experts:
        h = h + experts["b1"][:, None]
    if "gate" in experts:
        h = h * activation(jnp.einsum("egd,edh->egh", buf, experts["gate"]))
    else:
        h = activation(h)
    out = jnp.einsum("egh,ehd->egd", h, experts["lin2"])
    if "b2" in experts:
        out = out + experts["b2"][:, None]
    return out


def _ep_dispatch_local(experts_local, x2d, topk_idxs, topk_weights, *,
                       num_experts, n_ep, capacity, ep_axis, activation):
    """The routing-independent EP core, called INSIDE a shard_map body:
    capacity-bucket local (token, slot) assignments → all_to_all to expert
    shards → dense batched resident-expert MLP → all_to_all back → weighted
    combine. Returns (out2d (T_loc, d), counts_local (E,) fp32)."""
    t, d = x2d.shape
    top_k = topk_idxs.shape[-1]
    e_loc = num_experts // n_ep
    flat_e = topk_idxs.reshape(-1)
    flat_w = topk_weights.reshape(-1)
    token_of = jnp.repeat(jnp.arange(t), top_k)

    buf, pos_c, keep = _bucket(x2d[token_of], flat_e, num_experts, capacity)
    buf = buf.reshape(n_ep, e_loc, capacity, d)
    recv = lax.all_to_all(buf, ep_axis, split_axis=0, concat_axis=0, tiled=False)
    recv = recv.reshape(n_ep, e_loc, capacity, d).transpose(1, 0, 2, 3)
    recv = recv.reshape(e_loc, n_ep * capacity, d)

    out_buf = _expert_mlp_batched(experts_local, recv, activation)

    out_buf = out_buf.reshape(e_loc, n_ep, capacity, -1).transpose(1, 0, 2, 3)
    back = lax.all_to_all(out_buf, ep_axis, split_axis=0, concat_axis=0, tiled=False)
    d_out = back.shape[-1]
    back = back.reshape(num_experts, capacity, d_out)
    res = back[flat_e, pos_c] * (keep.astype(jnp.float32) * flat_w)[:, None].astype(back.dtype)
    out2d = jnp.zeros((t, d_out), res.dtype).at[token_of].add(res)

    counts = lax.stop_gradient(
        jnp.sum(jax.nn.one_hot(flat_e, num_experts, dtype=jnp.float32), axis=0)
    )
    return out2d, counts


def ep_deepseek_moe(
    mesh,
    params,
    x,
    *,
    top_k,
    capacity_factor=None,
    ep_axis="model",
    data_axis="data",
    pin_output=False,
    activation=silu,
):
    """DeepSeekMoE through the explicit EP dispatch: shared + routed experts,
    softmax probs with aux-loss-FREE biased top-k selection (behavior parity
    with ops.moe.deepseek_moe / reference deepseek_moe.py:132-229). Shared
    experts run locally (every token, no communication); routed experts
    dispatch via the 2-all_to_all pattern. aux carries GLOBAL "counts" (for
    the post-step bias fold) and "max_vio"."""
    from llm_quest_tpu.ops.moe import max_violation

    num_routed = params["gate_w"].shape[-1]
    n_ep = mesh.shape[ep_axis]
    n_data = mesh.shape[data_axis]
    b, s, d = x.shape
    assert b % (n_ep * n_data) == 0, f"batch {b} must divide over {n_data}x{n_ep} devices"
    assert num_routed % n_ep == 0
    t_loc = (b // (n_ep * n_data)) * s
    capacity = capacity_for(t_loc, top_k, num_routed, capacity_factor)
    has_shared = "shared" in params

    param_specs = {
        "routed": {k: P(ep_axis) for k in params["routed"]},
        "gate_w": P(),
        "gate_b": P(),
        "biases": P(),
    }
    if has_shared:
        param_specs["shared"] = {k: P() for k in params["shared"]}
    tok_spec = P((data_axis, ep_axis))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(param_specs, tok_spec),
        out_specs=(tok_spec, {"counts": P(), "max_vio": P()}),
        check_vma=False,
    )
    def run(p, x_loc):
        b_loc = x_loc.shape[0]
        x2d = x_loc.reshape(-1, d)

        out2d = jnp.zeros_like(x2d)
        if has_shared:
            out2d = out2d + _shared_experts_sum(p["shared"], x2d, activation)

        gate_logits = x2d @ p["gate_w"] + p["gate_b"]
        gate_probas = jax.nn.softmax(gate_logits.astype(jnp.float32), axis=-1)
        biased = gate_probas + p["biases"]
        topk_idxs = lax.top_k(biased, top_k)[1]
        topk_probas = jnp.take_along_axis(gate_probas, topk_idxs, axis=-1)
        topk_probas = topk_probas / jnp.sum(topk_probas, axis=-1, keepdims=True)

        routed_out, counts_local = _ep_dispatch_local(
            p["routed"], x2d, topk_idxs, topk_probas,
            num_experts=num_routed, n_ep=n_ep, capacity=capacity,
            ep_axis=ep_axis, activation=activation,
        )
        out2d = out2d + routed_out

        counts = lax.psum(counts_local, (data_axis, ep_axis))
        return out2d.reshape(b_loc, s, d), {"counts": counts, "max_vio": max_violation(counts)}

    return _run_region_pinned(run, mesh, params, x, data_axis, ep_axis, pin_output)


def ep_qwen3_moe(
    mesh,
    params,
    x,
    *,
    top_k,
    load_coeff,
    capacity_factor=None,
    ep_axis="model",
    data_axis="data",
    training=True,
    pin_output=False,
    activation=silu,
):
    """Qwen3-flavor MoE (LBL aux loss, optional sigmoid-weighted shared
    expert — behavior parity with ops.moe.qwen3_moe / reference
    qwen3_moe.py:105-167) through the explicit EP dispatch above.

    x: (b, s, d) GLOBAL array; b must divide by n_data·n_ep (tokens shard
    over both axes). params: the init_qwen3_moe pytree — expert stacks arrive
    sharded over ``ep_axis``, gate/shared replicated. Returns (out, aux) like
    qwen3_moe; aux["moe_loss"] is the GLOBAL load-balance loss.
    """
    num_experts = params["experts"]["lin1"].shape[0]
    n_ep = mesh.shape[ep_axis]
    n_data = mesh.shape[data_axis]
    b, s, d = x.shape
    assert b % (n_ep * n_data) == 0, f"batch {b} must divide over {n_data}x{n_ep} devices"
    assert num_experts % n_ep == 0, f"{num_experts} experts over {n_ep} EP shards"
    t_loc = (b // (n_ep * n_data)) * s
    capacity = capacity_for(t_loc, top_k, num_experts, capacity_factor)
    e_loc = num_experts // n_ep
    has_shared = "shared" in params

    param_specs = {
        "experts": {k: P(ep_axis) for k in params["experts"]},
        "gate_w": P(),
    }
    if has_shared:
        param_specs["shared"] = {k: P() for k in params["shared"]}
        param_specs["shared_gate_w"] = P()

    tok_spec = P((data_axis, ep_axis))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(param_specs, tok_spec),
        out_specs=(tok_spec, {"gate_probas": tok_spec, "moe_loss": P(), "counts": P()}),
        check_vma=False,
    )
    def run(p, x_loc):
        b_loc = x_loc.shape[0]
        x2d = x_loc.reshape(-1, d)  # (T_loc, d)
        t = x2d.shape[0]

        # --- local routing ---
        gate_logits = x2d @ p["gate_w"]
        gate_probas = jax.nn.softmax(gate_logits.astype(jnp.float32), axis=-1)
        topk_probas, topk_idxs = lax.top_k(gate_probas, top_k)
        topk_probas = topk_probas / jnp.sum(topk_probas, axis=-1, keepdims=True)

        # --- capacity bucketing + 2-all_to_all dispatch + weighted combine ---
        out2d, counts_local = _ep_dispatch_local(
            p["experts"], x2d, topk_idxs, topk_probas,
            num_experts=num_experts, n_ep=n_ep, capacity=capacity,
            ep_axis=ep_axis, activation=activation,
        )

        # --- shared expert: local, no communication ---
        if has_shared:
            shared_out = _shared_experts_sum(p["shared"], x2d, activation)
            shared_w = jax.nn.sigmoid(x2d @ p["shared_gate_w"])
            out2d = out2d + shared_out * shared_w.astype(out2d.dtype)

        aux = {"gate_probas": gate_probas, "counts": jnp.zeros((num_experts,), jnp.float32),
               "moe_loss": jnp.float32(0.0)}
        # --- GLOBAL load-balance loss: psum counts/probs over all token shards ---
        counts = lax.psum(counts_local, (data_axis, ep_axis))
        aux["counts"] = counts
        if training:
            p_sum = lax.psum(jnp.sum(gate_probas, axis=0), (data_axis, ep_axis))
            t_glob = t * n_ep * n_data
            f_i = counts / (top_k * t_glob)
            p_i = p_sum / t_glob
            aux["moe_loss"] = load_coeff * num_experts * jnp.dot(f_i, p_i)

        return out2d.reshape(b_loc, s, d), aux

    return _run_region_pinned(run, mesh, params, x, data_axis, ep_axis, pin_output)
