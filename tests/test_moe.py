"""MoE variants: dispatch exactness, aux losses, bias balancing."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from llm_quest_tpu.ops import moe

CFG = {
    "emb_dim": 64,
    "hidden_dim": 128,
    "moe_hidden_dim": 128,
    "num_experts": 8,
    "num_shared_experts": 1,
    "top_k": 3,
    "moe_scaling_factor": 1,
    "moe_bias_update_rate": 1e-3,
}


def _dense_reference(experts, x2d, topk_idxs, topk_w, num_experts, activation):
    """Dense one-hot oracle for the sort-based ragged dispatch."""
    h = jnp.einsum("td,edh->teh", x2d, experts["lin1"])
    if "b1" in experts:
        h = h + experts["b1"][None]
    if "gate" in experts:
        h = h * activation(jnp.einsum("td,edh->teh", x2d, experts["gate"]))
    else:
        h = activation(h)
    out_e = jnp.einsum("teh,ehd->ted", h, experts["lin2"])
    if "b2" in experts:
        out_e = out_e + experts["b2"][None]
    combine = jnp.sum(
        jax.nn.one_hot(topk_idxs, num_experts) * topk_w[..., None], axis=1
    )  # (t, e)
    return jnp.einsum("te,ted->td", combine, out_e)


@pytest.mark.slow
def test_ragged_dispatch_matches_dense_oracle():
    key = jax.random.PRNGKey(0)
    t, d, h, e, k = 32, 16, 24, 6, 2
    experts = moe.init_expert_stack(key, e, d, h, gated=True)
    x2d = jax.random.normal(jax.random.PRNGKey(1), (t, d))
    idxs = jax.random.randint(jax.random.PRNGKey(2), (t, k), 0, e)
    w = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(3), (t, k)))

    got = moe.dispatch(experts, x2d, idxs, w, e)
    want = _dense_reference(experts, x2d, idxs, w, e, moe.silu)
    assert jnp.allclose(got, want, atol=1e-5), float(jnp.abs(got - want).max())


@pytest.mark.slow
def test_classic_moe_shapes_and_loss():
    params = moe.init_classic_moe(jax.random.PRNGKey(0), CFG, num_experts=8, top_k=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 64))
    out, aux = moe.classic_moe(params, x, top_k=2)
    assert out.shape == x.shape
    assert aux["moe_loss"] > 0
    # auto scaling keeps active width ≈ one 4x FFN
    params_auto = moe.init_classic_moe(jax.random.PRNGKey(0), CFG, num_experts=8, top_k=2, scaling_factor="auto")
    assert params_auto["experts"]["lin1"].shape[-1] == int(4 * 0.5 * 64)


@pytest.mark.slow
def test_deepseek_moe_bias_update():
    params = moe.init_deepseek_moe(jax.random.PRNGKey(0), CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 64))
    out, aux = moe.deepseek_moe(params, x, top_k=CFG["top_k"])
    assert out.shape == x.shape
    assert aux["counts"].shape == (CFG["num_experts"] - CFG["num_shared_experts"],)
    assert float(jnp.sum(aux["counts"])) == 2 * 16 * CFG["top_k"]

    new_biases = moe.aux_free_bias_update(params["biases"], aux["counts"], 1e-3)
    # overloaded experts get negative bias nudges, underloaded positive
    assert new_biases.shape == params["biases"].shape
    assert not jnp.allclose(new_biases, params["biases"])
    assert float(aux["max_vio"]) >= 0


@pytest.mark.slow
def test_qwen3_moe_gate_replay():
    cfg = dict(CFG, aux_loss_coef=0.001)
    params = moe.init_qwen3_moe(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 64))
    out1, aux1 = moe.qwen3_moe(params, x, top_k=2, load_coeff=0.001)
    # replaying the captured gate probas reproduces the output exactly
    out2, _ = moe.qwen3_moe(params, x, top_k=2, load_coeff=0.001, gate_probas=aux1["gate_probas"])
    assert jnp.allclose(out1, out2, atol=1e-6)
    assert "moe_loss" in aux1


@pytest.mark.slow
def test_qwen3_moe_weighted_shared_expert():
    cfg = dict(CFG, shared_expert_hidden_dim=128, re_init_router_weights=True)
    params = moe.init_qwen3_moe(jax.random.PRNGKey(0), cfg)
    assert "shared" in params and "shared_gate_w" in params
    # sigma-MoE re-init: every column (expert vector) has equal L2 norm
    norms = jnp.linalg.norm(params["gate_w"], axis=0)
    assert jnp.allclose(norms, norms[0], rtol=1e-5)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 64))
    out, _ = moe.qwen3_moe(params, x, top_k=2, load_coeff=0.001)
    assert out.shape == x.shape


@pytest.mark.slow
def test_latent_moe():
    cfg = {"emb_dim": 64, "moe_hidden_dim": 128}
    params = moe.init_latent_moe(jax.random.PRNGKey(0), cfg, top_k=2, num_experts=4, latent_ratio=4)
    assert params["routed"]["lin1"].shape == (16, 16, 128)  # scaled-up experts, latent in-dim
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 64))
    out, aux = moe.latent_moe(params, x, top_k=8)
    assert out.shape == x.shape
    assert aux["counts"].shape == (16,)


@pytest.mark.slow
def test_moe_is_differentiable():
    params = moe.init_classic_moe(jax.random.PRNGKey(0), CFG, num_experts=4, top_k=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 64))

    def loss(p):
        out, aux = moe.classic_moe(p, x, top_k=2)
        return jnp.sum(out**2) + aux["moe_loss"]

    grads = jax.grad(loss)(params)
    gnorm = jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree.leaves(grads)))
    assert jnp.isfinite(gnorm) and gnorm > 0


def test_load_balance_loss_uniform_is_one():
    """Perfectly uniform routing → LBL = N · Σ (1/N)·(1/N) · N = 1."""
    t, e, k = 64, 8, 1
    probas = jnp.full((t, e), 1.0 / e)
    idxs = (np.arange(t) % e).reshape(t, 1)
    lbl = moe.load_balance_loss(probas, jnp.asarray(idxs), e, k)
    assert abs(float(lbl) - 1.0) < 1e-5


def test_capacity_dispatch_matches_ragged_when_capacity_suffices():
    """Capacity dispatch (dense bmm over padded (E, C) groups) == the exact
    ragged dispatch whenever no expert overflows its capacity; with a
    forced-overflow capacity the dropped assignments are exactly the
    last-ranked ones and everything kept is identical."""
    from llm_quest_tpu.ops import moe as moe_ops

    rng = jax.random.PRNGKey(0)
    E, t, k, d, f = 4, 64, 2, 16, 32
    experts = moe_ops.init_expert_stack(rng, E, d, f, gated=True, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (t, d), jnp.float32)
    gate = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(2), (t, E)), axis=-1)
    topk_w, topk_i = jax.lax.top_k(gate, k)
    topk_w = topk_w / jnp.sum(topk_w, axis=-1, keepdims=True)

    ref = moe_ops.dispatch(experts, x, topk_i, topk_w, E)
    # capacity_factor = E covers even the all-to-one-expert worst case
    got = moe_ops.dispatch(experts, x, topk_i, topk_w, E, capacity_factor=float(E))
    assert float(jnp.abs(got - ref).max()) < 1e-5

    # forced overflow: capacity 8 < the biggest group; kept contributions
    # must match a manual mask of the last-ranked assignments
    import numpy as np

    got_of = moe_ops.dispatch(experts, x, topk_i, topk_w, E, capacity_factor=8 * E / (t * k))
    flat_e = np.asarray(topk_i).reshape(-1)
    order = np.argsort(flat_e, kind="stable")
    rank = np.zeros(t * k, np.int32)
    counts = {}
    for pos in order:
        e = flat_e[pos]
        rank[pos] = counts.get(e, 0)
        counts[e] = rank[pos] + 1
    keep = rank < 8
    w_masked = jnp.asarray(np.asarray(topk_w).reshape(-1) * keep).reshape(t, k)
    ref_of = moe_ops.dispatch(experts, x, topk_i, w_masked, E)
    assert float(jnp.abs(got_of - ref_of).max()) < 1e-5


def test_qwen3_moe_capacity_factor_threads_through():
    from llm_quest_tpu.ops import moe as moe_ops

    cfg = {"emb_dim": 16, "moe_hidden_dim": 32, "num_experts": 4, "top_k": 2,
           "shared_expert_hidden_dim": 32, "re_init_router_weights": False}
    params = moe_ops.init_qwen3_moe(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 16), jnp.float32)
    out_ref, _ = moe_ops.qwen3_moe(params, x, top_k=2, load_coeff=0.01)
    out_cap, _ = moe_ops.qwen3_moe(params, x, top_k=2, load_coeff=0.01, capacity_factor=4.0)
    assert float(jnp.abs(out_cap - out_ref).max()) < 1e-5
