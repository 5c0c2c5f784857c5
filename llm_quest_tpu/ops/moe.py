"""Mixture-of-Experts layers: classic, DeepSeek, Qwen3, Nvidia Latent.

Behavioral parity targets (reference: llm_quest/moe/):
- classic MoE: softmax gate (bias=True), top-k renorm, z-router loss
  (logsumexp²) + load-balance loss N·Σf·p (classic_moe.py:33-125)
- DeepSeekMoE: shared + routed experts, aux-loss-FREE bias balancing
  (biases += rate·sign(mean−count)), softmax probs / biased top-k selection,
  max-violation metric (deepseek_moe.py:132-229)
- Qwen3MoE: LBL-only aux loss, optional sigmoid-weighted shared expert,
  sigma-MoE router re-init, gate-probas replay in/out for RL routing replay
  (qwen3_moe.py:16-167)
- LatentMoE: experts in latent dim (emb/latent_ratio) behind shared down/up
  projections, sigmoid gate + bias balancing, routed_scaling_factor,
  SquaredReLU experts (nvidia_latent_moe.py:47-135)

TPU redesign — the reference dispatches with a python loop over hit experts +
``index_add_`` (data-dependent shapes, impossible under XLA). Here dispatch is
**sort-based grouped matmul**: flatten (token, slot) assignments, stable-sort
by expert id, run ``jax.lax.ragged_dot`` (MXU grouped matmul, differentiable)
over the contiguous expert groups, and scatter-add the weighted results back.
Fully static shapes, exact same math, no wasted FLOPs (vs. the dense one-hot
einsum alternative which would cost num_experts/top_k× extra).

Functional-state note: the DeepSeek/Latent bias-balancing buffer is a
NON-gradient state update (reference: deepseek_moe.py:206-210). Apply fns
return the expert-assignment ``counts`` in aux; callers fold
``aux_free_bias_update`` into params after the optimizer step.
"""

import jax
import jax.numpy as jnp

from llm_quest_tpu.kernels.quantized_gmm import quantized_ragged_dot, supports_qgmm
from llm_quest_tpu.ops.activations import gelu_erf, silu


def squared_relu(x):
    """ReLU(x)² (Nemotron; reference: nvidia_latent_moe.py:5-14)."""
    return jnp.square(jax.nn.relu(x))


# ---------------------------------------------------------------- routing math


def z_router_loss(gate_logits):
    """mean(logsumexp(logits)²) (reference: classic_moe.py:89)."""
    return jnp.mean(jax.nn.logsumexp(gate_logits.astype(jnp.float32), axis=-1) ** 2)


def load_balance_loss(gate_probas, topk_idxs, num_experts, top_k):
    """N · Σ_i f_i·p_i (reference: classic_moe.py:91-94)."""
    t = gate_probas.shape[0]
    counts = jnp.sum(jax.nn.one_hot(topk_idxs.reshape(-1), num_experts, dtype=jnp.float32), axis=0)
    f_i = counts / (top_k * t)
    p_i = jnp.mean(gate_probas.astype(jnp.float32), axis=0)
    return num_experts * jnp.dot(f_i, p_i)


def expert_counts(topk_idxs, num_experts):
    """Tokens dispatched per expert (bincount), fp32, gradient-stopped."""
    counts = jnp.sum(jax.nn.one_hot(topk_idxs.reshape(-1), num_experts, dtype=jnp.float32), axis=0)
    return jax.lax.stop_gradient(counts)


def aux_free_bias_update(biases, counts, rate):
    """biases += rate·sign(mean(counts) − counts) (reference: deepseek_moe.py:206-210)."""
    vio = jnp.mean(counts) - counts
    return biases + rate * jnp.sign(vio)


def max_violation(counts):
    """(max − mean)/mean load-balance metric (reference: deepseek_moe.py:218-229)."""
    mean = jnp.mean(counts)
    return (jnp.max(counts) - mean) / mean


def router_weights_init(key, weights):
    """sigma-MoE router re-init: row-L2-normalize, rescale to original std
    (reference: qwen3_moe.py:16-34; https://arxiv.org/abs/2310.10837).

    weights: (in, n_experts) — rows of the torch (out, in) layout are the
    per-expert vectors, i.e. columns here; normalize per expert (axis 0).
    """
    del key  # deterministic transform of existing weights
    og_std = jnp.std(weights)
    normed = weights / jnp.linalg.norm(weights, axis=0, keepdims=True)
    return normed * (og_std / jnp.std(normed))


# -------------------------------------------------------- expert stack + dispatch


def init_expert_stack(key, num_experts, d_in, hidden, *, d_out=None, gated=True, bias=False, dtype=jnp.float32):
    """Stacked expert weights (num_experts, ...) — one array per matrix so a
    single sharding annotation covers the expert (EP) axis."""
    d_out = d_out if d_out is not None else d_in
    ks = jax.random.split(key, 6)
    bound_in = 1.0 / (d_in**0.5)
    bound_h = 1.0 / (hidden**0.5)

    def u(k, shape, bound):
        return jax.random.uniform(k, shape, dtype, -bound, bound)

    if gated:
        params = {
            "lin1": u(ks[0], (num_experts, d_in, hidden), bound_in),
            "gate": u(ks[1], (num_experts, d_in, hidden), bound_in),
            "lin2": u(ks[2], (num_experts, hidden, d_out), bound_h),
        }
    else:
        params = {
            "lin1": u(ks[0], (num_experts, d_in, hidden), bound_in),
            "lin2": u(ks[2], (num_experts, hidden, d_out), bound_h),
        }
    if bias:
        params["b1"] = u(ks[3], (num_experts, hidden), bound_in)
        params["b2"] = u(ks[4], (num_experts, d_out), bound_h)
    return params


def _ragged(experts, name, x, group_sizes, expert_of_row):
    """ragged_dot over one stacked expert matrix; int8-quantized stacks
    (ops/quantization.py::quantize_expert_stack_int8) carry "<name>_q" +
    "<name>_scale" (E, out) — dequant is exact as a row-indexed scale
    epilogue because each output row belongs to one expert group.

    On TPU, int8 stacks route to the Pallas grouped-matmul kernel
    (kernels/quantized_gmm.py), which streams the weights int8 from HBM —
    XLA's ragged_dot materializes a dequantized bf16 copy of every expert
    each step, erasing the bandwidth win at batch (COVERAGE.md)."""
    if name + "_q" in experts:
        w_q, scale = experts[name + "_q"], experts[name + "_scale"]
        if supports_qgmm(x, w_q):
            return quantized_ragged_dot(x, w_q, scale, group_sizes)
        y = jax.lax.ragged_dot(x, w_q.astype(x.dtype), group_sizes)
        return y * scale[expert_of_row].astype(y.dtype)
    return jax.lax.ragged_dot(x, experts[name], group_sizes)


def _expert_mlp_ragged(experts, x_sorted, group_sizes, expert_of_row, activation):
    """Grouped expert MLP over expert-sorted rows via ragged_dot.

    Gated form activates the GATE branch — lin1(x) · act(gate(x)) — matching
    the reference Expert (qwen3_moe.py:45-49: lin2(x1 * silu(x_gate)));
    non-gated form is act(lin1(x)+b1) (classic_moe.py)."""
    h = _ragged(experts, "lin1", x_sorted, group_sizes, expert_of_row)
    if "b1" in experts:
        h = h + experts["b1"][expert_of_row]
    if "gate" in experts or "gate_q" in experts:
        g = _ragged(experts, "gate", x_sorted, group_sizes, expert_of_row)
        h = h * activation(g)
    else:
        h = activation(h)
    out = _ragged(experts, "lin2", h, group_sizes, expert_of_row)
    if "b2" in experts:
        out = out + experts["b2"][expert_of_row]
    return out


def dispatch(experts, x2d, topk_idxs, topk_weights, num_experts, *, activation=silu, d_out=None,
             capacity_factor=None):
    """Sort-based MoE dispatch.

    x2d: (T, d); topk_idxs/topk_weights: (T, k).
    Returns (T, d_out): Σ over each token's k experts of weight·expert(x).

    ``capacity_factor=None`` (default): exact ragged_dot dispatch — every
    assignment computed, reference semantics. A float enables GShard/Switch
    **capacity dispatch**: each expert processes at most
    C = ceil(capacity_factor · T·k / E) rows padded into a dense
    (E, C, d) batch and the expert MLP runs as batched dense matmuls —
    measured 2.3× ragged_dot's fwd+bwd at identical FLOPs on v5e (ragged's
    backward runs ~86 vs bmm's ~200 TF/s effective; so even 1.5× padded
    MACs win ~1.5× wall-clock on the training step's dominant stage).
    Assignments beyond an expert's capacity are DROPPED (last in stable
    token order — the standard capacity-routing semantics; the
    load-balance loss keeps overflow rare, and capacity_factor ≥ E/k·
    max-imbalance reproduces the exact result). Inference/decode keeps the
    exact ragged path."""
    t, k = topk_idxs.shape
    lin2 = experts.get("lin2", experts.get("lin2_q"))
    d_out = d_out if d_out is not None else lin2.shape[-1]
    flat_expert = topk_idxs.reshape(-1)  # (T·k,)
    flat_weight = topk_weights.reshape(-1)
    token_of = jnp.repeat(jnp.arange(t), k)

    order = jnp.argsort(flat_expert, stable=True)
    expert_sorted = flat_expert[order]
    group_sizes = jnp.sum(
        jax.nn.one_hot(flat_expert, num_experts, dtype=jnp.int32), axis=0
    )  # (E,)

    if capacity_factor is not None and "lin1" not in experts:
        capacity_factor = None  # int8-quantized stacks: keep the ragged-qGMM path
    if capacity_factor is not None:
        cap = -(-int(capacity_factor * t * k) // num_experts)  # static per shape
        cap = min(-(-cap // 8) * 8, t * k)  # sublane-align, never exceed T·k
        starts = jnp.cumsum(group_sizes) - group_sizes  # (E,)
        rank = jnp.arange(t * k) - starts[expert_sorted]  # position within group
        keep = rank < cap
        # slot in the (E·C [+1 trash]) padded buffer; dropped rows -> trash
        dest = jnp.where(keep, expert_sorted * cap + jnp.minimum(rank, cap - 1), num_experts * cap)
        x_sorted = x2d[token_of[order]]
        xe = (
            jnp.zeros((num_experts * cap + 1, x2d.shape[1]), x2d.dtype)
            .at[dest].set(x_sorted)[: num_experts * cap]
            .reshape(num_experts, cap, x2d.shape[1])
        )
        he = _expert_mlp_dense(experts, xe, activation)  # (E, C, d_out)
        out_rows = he.reshape(num_experts * cap, d_out)[jnp.minimum(dest, num_experts * cap - 1)]
        out_rows = out_rows * (flat_weight[order] * keep)[:, None].astype(he.dtype)
        return jnp.zeros((t, d_out), he.dtype).at[token_of[order]].add(out_rows)

    x_sorted = x2d[token_of[order]]  # (T·k, d)
    out_sorted = _expert_mlp_ragged(experts, x_sorted, group_sizes, expert_sorted, activation)
    out_sorted = out_sorted * flat_weight[order][:, None].astype(out_sorted.dtype)

    out = jnp.zeros((t, d_out), out_sorted.dtype).at[token_of[order]].add(out_sorted)
    return out


def _expert_mlp_dense(experts, xe, activation):
    """Expert MLP over a DENSE (E, C, d) capacity batch: plain batched
    matmuls against the (E, d, f) stacks — the capacity-dispatch compute."""
    bmm = lambda a, w: jnp.einsum("ecd,edf->ecf", a, w.astype(a.dtype))
    lin1 = experts.get("lin1", experts.get("lin1_q"))
    h = bmm(xe, lin1)
    if "b1" in experts:
        h = h + experts["b1"][:, None, :]
    if "gate" in experts or "gate_q" in experts:
        h = h * activation(bmm(xe, experts.get("gate", experts.get("gate_q"))))
    else:
        h = activation(h)
    out = bmm(h, experts.get("lin2", experts.get("lin2_q")))
    if "b2" in experts:
        out = out + experts["b2"][:, None, :]
    return out


# ------------------------------------------------------------------ classic MoE


def init_classic_moe(key, cfg, *, num_experts=8, top_k=2, scaling_factor="auto", dtype=jnp.float32):
    """Classic sparse MoE with GELU experts (reference: classic_moe.py:33-77).

    scaling_factor "auto" → 1/top_k so active-expert width matches one GPT-2
    FFN; expert hidden = int(4·sf·emb_dim)."""
    if scaling_factor == "auto":
        scaling_factor = 1 / top_k
    hidden = int(4 * scaling_factor * cfg["emb_dim"])
    ke, kg, kb = jax.random.split(key, 3)
    d = cfg["emb_dim"]
    bound = 1.0 / (d**0.5)
    return {
        "experts": init_expert_stack(ke, num_experts, d, hidden, gated=False, bias=True, dtype=dtype),
        "gate_w": jax.random.uniform(kg, (d, num_experts), dtype, -bound, bound),
        "gate_b": jax.random.uniform(kb, (num_experts,), dtype, -bound, bound),
    }


def classic_moe(params, x, *, top_k, load_coeff=10e-2, z_router_coeff=1e-3):
    """Returns (out, aux) with aux["moe_loss"] = z_coeff·z_loss + load_coeff·LBL."""
    b, s, d = x.shape
    num_experts = params["gate_w"].shape[-1]
    x2d = x.reshape(-1, d)

    gate_logits = x2d @ params["gate_w"] + params["gate_b"]
    gate_probas = jax.nn.softmax(gate_logits.astype(jnp.float32), axis=-1)
    topk_probas, topk_idxs = jax.lax.top_k(gate_probas, top_k)
    topk_probas = topk_probas / jnp.sum(topk_probas, axis=-1, keepdims=True)

    moe_loss = z_router_coeff * z_router_loss(gate_logits) + load_coeff * load_balance_loss(
        gate_probas, topk_idxs, num_experts, top_k
    )

    out = dispatch(params["experts"], x2d, topk_idxs, topk_probas, num_experts, activation=gelu_erf)
    return out.reshape(b, s, d), {"moe_loss": moe_loss}


# ----------------------------------------------------------------- DeepSeek MoE


def init_deepseek_moe(key, cfg, *, dtype=jnp.float32):
    """Shared + routed experts with aux-loss-free bias balancing
    (reference: deepseek_moe.py:132-164)."""
    num_experts = cfg["num_experts"]
    num_shared = cfg["num_shared_experts"]
    top_k = cfg["top_k"]
    sf = cfg["moe_scaling_factor"]
    if sf == "auto":
        sf = 1 / (top_k + num_shared)
    hidden = int(sf * cfg["hidden_dim"])
    num_routed = num_experts - num_shared

    kr, ks, kg, kb = jax.random.split(key, 4)
    d = cfg["emb_dim"]
    bound = 1.0 / (d**0.5)
    params = {
        "routed": init_expert_stack(kr, num_routed, d, hidden, gated=True, dtype=dtype),
        "gate_w": jax.random.uniform(kg, (d, num_routed), dtype, -bound, bound),
        "gate_b": jax.random.uniform(kb, (num_routed,), dtype, -bound, bound),
        "biases": jnp.zeros((num_routed,), jnp.float32),  # non-gradient state
    }
    if num_shared > 0:
        # reference shared experts are NON-gated silu MLPs with biases
        # (deepseek_moe.py VectorizedSharedExperts, bias=True)
        params["shared"] = init_expert_stack(ks, num_shared, d, hidden, gated=False, bias=True, dtype=dtype)
    return params


def _shared_einsum(shared, name, spec, x):
    """Batched-over-experts einsum on one stacked matrix; int8-quantized
    stacks dequant via the (E, out) scale broadcast on the output."""
    if name + "_q" in shared:
        y = jnp.einsum(spec, x, shared[name + "_q"].astype(x.dtype))
        return y * shared[name + "_scale"][None].astype(y.dtype)
    return jnp.einsum(spec, x, shared[name])


def _shared_experts_sum(shared, x2d, activation=silu):
    """All shared experts on all tokens, summed (reference: deepseek_moe.py:91-129,
    VectorizedSharedExperts: lin2(act(lin1(x)+b1))+b2 batched over experts).
    Gated form activates the gate branch (see _expert_mlp_ragged)."""
    h = _shared_einsum(shared, "lin1", "td,edh->teh", x2d)
    if "b1" in shared:
        h = h + shared["b1"][None]
    if "gate" in shared or "gate_q" in shared:
        h = h * activation(_shared_einsum(shared, "gate", "td,edh->teh", x2d))
    else:
        h = activation(h)
    out = _shared_einsum(shared, "lin2", "teh,ehd->ted", h)
    if "b2" in shared:
        out = out + shared["b2"][None]
    return jnp.sum(out, axis=1)


def deepseek_moe(params, x, *, top_k):
    """Returns (out, aux): aux has "counts" (fold into biases via
    aux_free_bias_update after the optimizer step) and "max_vio"."""
    b, s, d = x.shape
    num_routed = params["gate_w"].shape[-1]
    x2d = x.reshape(-1, d)

    out = jnp.zeros_like(x2d)
    if "shared" in params:
        out = out + _shared_experts_sum(params["shared"], x2d)

    gate_logits = x2d @ params["gate_w"] + params["gate_b"]
    gate_probas = jax.nn.softmax(gate_logits.astype(jnp.float32), axis=-1)
    biased = gate_probas + params["biases"]
    topk_idxs = jax.lax.top_k(biased, top_k)[1]
    topk_probas = jnp.take_along_axis(gate_probas, topk_idxs, axis=-1)  # unbiased weights
    topk_probas = topk_probas / jnp.sum(topk_probas, axis=-1, keepdims=True)

    out = out + dispatch(params["routed"], x2d, topk_idxs, topk_probas, num_routed, activation=silu)

    counts = expert_counts(topk_idxs, num_routed)
    aux = {"counts": counts, "max_vio": max_violation(counts)}
    return out.reshape(b, s, d), aux


# -------------------------------------------------------------------- Qwen3 MoE


def init_qwen3_moe(key, cfg, *, dtype=jnp.float32):
    """LBL-only MoE, optional weighted shared expert, optional sigma-MoE
    router re-init (reference: qwen3_moe.py:68-103)."""
    d = cfg["emb_dim"]
    ke, kg, ksh, ksg = jax.random.split(key, 4)
    bound = 1.0 / (d**0.5)
    gate_w = jax.random.uniform(kg, (d, cfg["num_experts"]), dtype, -bound, bound)
    if cfg.get("re_init_router_weights", False):
        gate_w = router_weights_init(None, gate_w)
    params = {
        "experts": init_expert_stack(ke, cfg["num_experts"], d, cfg["moe_hidden_dim"], gated=True, dtype=dtype),
        "gate_w": gate_w,
    }
    shared_hidden = cfg.get("shared_expert_hidden_dim")
    if shared_hidden is not None:
        params["shared"] = init_expert_stack(ksh, 1, d, shared_hidden, gated=True, dtype=dtype)
        params["shared_gate_w"] = jax.random.uniform(ksg, (d, 1), dtype, -bound, bound)
    return params


def qwen3_moe(params, x, *, top_k, load_coeff, gate_probas=None, training=True,
              capacity_factor=None):
    """Returns (out, aux); aux has "moe_loss" (training) and "gate_probas"
    for RL routing replay (reference: qwen3_moe.py:105-167).
    ``capacity_factor``: see ``dispatch`` — dense capacity routing for the
    training step (models thread ``cfg["moe_capacity_factor"]``)."""
    b, s, d = x.shape
    lin1 = params["experts"].get("lin1", params["experts"].get("lin1_q"))
    num_experts = lin1.shape[0]
    x2d = x.reshape(-1, d)

    if gate_probas is None:
        gate_logits = x2d @ params["gate_w"]
        gate_probas = jax.nn.softmax(gate_logits.astype(jnp.float32), axis=-1)
    else:
        assert gate_probas.ndim == 2, "gate_probas must be (batch*seq, num_experts)"

    topk_probas, topk_idxs = jax.lax.top_k(gate_probas, top_k)
    topk_probas = topk_probas / jnp.sum(topk_probas, axis=-1, keepdims=True)

    aux = {"gate_probas": gate_probas}
    if training:
        aux["moe_loss"] = load_coeff * load_balance_loss(gate_probas, topk_idxs, num_experts, top_k)

    out = dispatch(params["experts"], x2d, topk_idxs, topk_probas, num_experts,
                   activation=silu, capacity_factor=capacity_factor)

    if "shared" in params:
        shared_out = _shared_experts_sum(params["shared"], x2d)
        shared_w = jax.nn.sigmoid(x2d @ params["shared_gate_w"])
        out = out + shared_out * shared_w.astype(out.dtype)

    return out.reshape(b, s, d), aux


# ------------------------------------------------------------------- Latent MoE


def init_latent_moe(
    key,
    cfg,
    *,
    top_k=2,
    num_experts=4,
    latent_ratio=4,
    shared_expert_hidden_dim=None,
    dtype=jnp.float32,
):
    """Nvidia LatentMoE (reference: nvidia_latent_moe.py:47-87): scaled-up
    expert count/top-k, experts in latent dim behind shared down/up projections."""
    d = cfg["emb_dim"]
    top_k = cfg.get("top_k", top_k * latent_ratio)
    num_experts = cfg.get("num_experts", num_experts * latent_ratio)
    latent_dim = d // latent_ratio
    hidden = cfg.get("routed_expert_hidden_dim") or cfg["moe_hidden_dim"]
    shared_hidden = cfg.get("shared_expert_hidden_dim", shared_expert_hidden_dim) or cfg["moe_hidden_dim"]

    kr, ks, kg, kd, ku = jax.random.split(key, 5)
    bound = 1.0 / (d**0.5)
    return {
        "routed": init_expert_stack(kr, num_experts, latent_dim, hidden, d_out=latent_dim, gated=True, dtype=dtype),
        "shared": init_expert_stack(ks, 1, d, shared_hidden, gated=True, dtype=dtype),
        "gate_w": jax.random.uniform(kg, (d, num_experts), dtype, -bound, bound),
        "down_proj": jax.random.uniform(kd, (d, latent_dim), dtype, -bound, bound),
        "up_proj": jax.random.uniform(ku, (latent_dim, d), dtype, -1.0 / (latent_dim**0.5), 1.0 / (latent_dim**0.5)),
        "biases": jnp.zeros((num_experts,), jnp.float32),
    }


def latent_moe(params, x, *, top_k, routed_scaling_factor=2.5, training=True):
    """Returns (out, aux) with "counts" for the bias update
    (reference: nvidia_latent_moe.py:89-135)."""
    b, s, d = x.shape
    num_experts = params["gate_w"].shape[-1]
    x2d = x.reshape(-1, d)

    out = _shared_experts_sum(x2d=x2d, shared=params["shared"], activation=squared_relu)

    x_latent = x2d @ params["down_proj"]

    gate_logits = x2d @ params["gate_w"]
    gate_probas = jax.nn.sigmoid(gate_logits.astype(jnp.float32))
    biased = gate_probas + params["biases"]  # biases kept for inference too
    topk_idxs = jax.lax.top_k(biased, top_k)[1]
    topk_probas = jnp.take_along_axis(gate_probas, topk_idxs, axis=-1)
    topk_probas = topk_probas / jnp.sum(topk_probas, axis=-1, keepdims=True)
    topk_probas = topk_probas * routed_scaling_factor

    latent_out = dispatch(
        params["routed"], x_latent, topk_idxs, topk_probas, num_experts, activation=squared_relu
    )
    out = out + latent_out @ params["up_proj"]

    aux = {}
    if training:
        aux["counts"] = expert_counts(topk_idxs, num_experts)
    return out.reshape(b, s, d), aux
