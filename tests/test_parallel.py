"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import pytest

from llm_quest_tpu.models import gpt2
from llm_quest_tpu.parallel import create_mesh, shard_params, sharding_rules_gpt2
from llm_quest_tpu.parallel.sharding import param_specs

TINY = {
    "vocab_size": 256,
    "context_length": 64,
    "emb_dim": 128,
    "n_heads": 4,
    "n_layers": 2,
    "drop_rate": 0.0,
    "qkv_bias": False,
}


@pytest.fixture(scope="module")
def mesh8():
    if jax.device_count() < 8:
        pytest.skip("needs 8 (virtual) devices")
    return create_mesh(8, model_parallel=2)


def test_param_specs_match_rules():
    params = gpt2.init(jax.random.PRNGKey(0), TINY)
    specs = param_specs(params, sharding_rules_gpt2)
    assert specs["blocks"][0]["att"]["wq"]["w"] == jax.sharding.PartitionSpec(None, "model")
    assert specs["blocks"][0]["att"]["out_proj"]["w"] == jax.sharding.PartitionSpec("model", None)
    assert specs["tok_emb"]["w"] == jax.sharding.PartitionSpec("model", None)
    # norms replicated
    assert specs["final_ln"]["scale"] == jax.sharding.PartitionSpec()


def test_sharded_forward_matches_single_device(mesh8):
    params = gpt2.init(jax.random.PRNGKey(0), TINY)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0, 256)

    ref_logits, _, _ = gpt2.apply(params, TINY, tokens)

    with mesh8:
        sharded = shard_params(params, mesh8, sharding_rules_gpt2)

        @jax.jit
        def fwd(p, t):
            logits, _, _ = gpt2.apply(p, TINY, t)
            return logits

        out = fwd(sharded, tokens)

    assert jnp.allclose(ref_logits, out, atol=1e-4)


def test_opt_state_mirrors_param_shardings(mesh8):
    """Adam moments carry the SAME NamedShardings as their params on a TP
    mesh (not replicated) — the HBM saving that makes 1B-scale training fit."""
    import optax

    from llm_quest_tpu.parallel import shard_opt_state

    params = gpt2.init(jax.random.PRNGKey(0), TINY)
    optimizer = optax.adamw(1e-3)
    with mesh8:
        sharded = shard_params(params, mesh8, sharding_rules_gpt2)
        opt_state = shard_opt_state(optimizer, sharded, mesh8)

    mu = opt_state[0].mu
    pspec = lambda x: x.sharding.spec
    assert pspec(mu["blocks"][0]["att"]["wq"]["w"]) == pspec(sharded["blocks"][0]["att"]["wq"]["w"])
    assert pspec(mu["blocks"][0]["att"]["wq"]["w"]) == jax.sharding.PartitionSpec(None, "model")
    assert pspec(mu["tok_emb"]["w"]) == jax.sharding.PartitionSpec("model", None)
    # counters replicated
    assert pspec(opt_state[0].count) == jax.sharding.PartitionSpec()

    # re-placing an existing (host) state lands on the same shardings
    host_state = jax.tree.map(lambda x: jnp.zeros(x.shape, x.dtype), opt_state)
    replaced = shard_opt_state(optimizer, sharded, mesh8, host_state)
    assert pspec(replaced[0].mu["tok_emb"]["w"]) == jax.sharding.PartitionSpec("model", None)


@pytest.mark.slow
def test_dryrun_multichip():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(jax.device_count())


@pytest.mark.slow
def test_pipeline_parallel_matches_sequential(mesh8):
    """GPipe pipeline over 4 stages == sequential layer stack; grads flow."""
    from jax.sharding import Mesh
    from llm_quest_tpu.parallel.pipeline import pipeline_apply, stack_stages

    devices = jax.devices()[:4]
    import numpy as np

    mesh = Mesh(np.asarray(devices), ("stage",))

    d = 16
    n_layers, n_stages = 8, 4
    keys = jax.random.split(jax.random.PRNGKey(0), n_layers)
    blocks = [
        {"w": jax.random.normal(k, (d, d)) * 0.1, "b": jax.random.normal(k, (d,)) * 0.1} for k in keys
    ]

    def block_fn(p, h):
        return jnp.tanh(h @ p["w"] + p["b"]) + h

    x = jax.random.normal(jax.random.PRNGKey(1), (8, 6, d))

    ref = x
    for blk in blocks:
        ref = block_fn(blk, ref)

    stacked = stack_stages(blocks, n_stages)
    got = pipeline_apply(mesh, "stage", block_fn, stacked, x, n_microbatches=4)
    assert jnp.allclose(ref, got, atol=1e-5), float(jnp.abs(ref - got).max())

    # differentiability (training through the pipeline)
    def loss(sp):
        return jnp.sum(pipeline_apply(mesh, "stage", block_fn, sp, x, n_microbatches=4) ** 2)

    g = jax.grad(loss)(stacked)
    gmax = max(float(jnp.abs(t).max()) for t in jax.tree.leaves(g))
    assert jnp.isfinite(gmax) and gmax > 0


def test_sequence_parallel_attention_matches_single_device(mesh8):
    from llm_quest_tpu.ops.attention import sdpa
    from llm_quest_tpu.ops.masks import causal_mask
    from llm_quest_tpu.parallel.sequence import sequence_parallel_attention

    b, h, s, d = 2, 4, 64, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, s, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, s, d))

    ref = sdpa(q, k, v, mask=causal_mask(s))
    got = sequence_parallel_attention(mesh8, "data", q, k, v, causal=True)
    assert jnp.allclose(ref, got, atol=1e-5), float(jnp.abs(ref - got).max())

    ref_b = sdpa(q, k, v)
    got_b = sequence_parallel_attention(mesh8, "data", q, k, v, causal=False)
    assert jnp.allclose(ref_b, got_b, atol=1e-5)


def test_ring_attention_matches_single_device(mesh8):
    from llm_quest_tpu.ops.attention import sdpa
    from llm_quest_tpu.ops.masks import causal_mask
    from llm_quest_tpu.parallel.sequence import ring_attention

    b, h, s, d = 2, 4, 64, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, s, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, s, d))

    ref = sdpa(q, k, v, mask=causal_mask(s))
    got = ring_attention(mesh8, "data", q, k, v, causal=True)
    assert jnp.allclose(ref, got, atol=1e-5), float(jnp.abs(ref - got).max())

    ref_b = sdpa(q, k, v)
    got_b = ring_attention(mesh8, "data", q, k, v, causal=False)
    assert jnp.allclose(ref_b, got_b, atol=1e-5)


@pytest.mark.slow
def test_sharded_decode_matches_single_device(mesh8):
    """TP+DP-sharded params through the whole-generation jit: identical
    greedy tokens to the unsharded decode (the jit respects the argument
    shardings — distributed serving needs no separate engine)."""
    from llm_quest_tpu.inference import generate as gen
    from llm_quest_tpu.models import qwen3
    from llm_quest_tpu.parallel.sharding import shard_batch, sharding_rules_llama

    cfg = {
        "model_type": "dense", "vocab_size": 128, "context_length": 64, "emb_dim": 32,
        "n_layers": 2, "n_heads": 4, "num_kv_groups": 2, "head_dim": 8, "hidden_dim": 64,
        "rope_base": 10_000, "tie_embeddings": False, "dtype": jnp.float32,
    }
    params = qwen3.init(jax.random.PRNGKey(0), cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (8, 6), 0, 128)
    mask = jnp.ones((8, 6), bool)

    ref = gen.generate_batched_kv_cache(
        qwen3, params, cfg, prompt, mask, max_gen=6, temp=0.0, eos_ids=-1, pad_id=0
    )

    with mesh8:
        sharded_params = shard_params(params, mesh8, sharding_rules_llama)
        batch = shard_batch({"ids": prompt}, mesh8)
        out = gen.generate_batched_kv_cache(
            qwen3, sharded_params, cfg, batch["ids"], mask, max_gen=6, temp=0.0, eos_ids=-1, pad_id=0
        )
    assert ref["sequences"].tolist() == out["sequences"].tolist()


@pytest.mark.slow
def test_ring_flash_attention_matches_single_device():
    if jax.device_count() < 8:
        pytest.skip("needs 8 (virtual) devices")
    from llm_quest_tpu.parallel.mesh import create_mesh
    from llm_quest_tpu.parallel.sequence import ring_flash_attention
    from llm_quest_tpu.ops.attention import sdpa
    from llm_quest_tpu.ops.masks import causal_mask

    mesh = create_mesh(8, model_parallel=1)
    b, h, s, d = 1, 2, 8 * 40, 32
    q, k, v = (jax.random.normal(kk, (b, h, s, d)) for kk in jax.random.split(jax.random.PRNGKey(3), 3))

    out = ring_flash_attention(mesh, "data", q, k, v, causal=True, interpret=True)
    ref = sdpa(q, k, v, mask=causal_mask(s))
    assert float(jnp.max(jnp.abs(out - ref))) < 5e-5

    out_b = ring_flash_attention(mesh, "data", q, k, v, causal=False, interpret=True)
    ref_b = sdpa(q, k, v)
    assert float(jnp.max(jnp.abs(out_b - ref_b))) < 5e-5

    # dv != d (MLA-style value dim)
    v2 = jax.random.normal(jax.random.PRNGKey(4), (b, h, s, 48))
    out_v = ring_flash_attention(mesh, "data", q, k, v2, causal=True, interpret=True)
    ref_v = sdpa(q, k, v2, mask=causal_mask(s))
    assert float(jnp.max(jnp.abs(out_v - ref_v))) < 5e-5


@pytest.mark.slow
def test_ring_flash_attention_gradients():
    """Gradients through the ring-flash form match the XLA ring form."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 (virtual) devices")
    from llm_quest_tpu.parallel.mesh import create_mesh
    from llm_quest_tpu.parallel.sequence import ring_attention, ring_flash_attention

    mesh = create_mesh(8, model_parallel=1)
    b, h, s, d = 1, 2, 8 * 24, 32
    q, k, v = (jax.random.normal(kk, (b, h, s, d)) for kk in jax.random.split(jax.random.PRNGKey(7), 3))

    gf = jax.grad(
        lambda q, k, v: jnp.sum(jnp.sin(ring_flash_attention(mesh, "data", q, k, v, causal=True, interpret=True))),
        argnums=(0, 1, 2),
    )(q, k, v)
    gr = jax.grad(
        lambda q, k, v: jnp.sum(jnp.sin(ring_attention(mesh, "data", q, k, v, causal=True))),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b_ in zip(gf, gr):
        assert float(jnp.max(jnp.abs(a - b_))) < 5e-5


# ------------------------------------------------------- GDN sequence parallel


def _gdn_inputs(b=1, h=2, s=256, dk=24, dv=40, seed=11):
    from llm_quest_tpu.ops.gdn import l2_norm_clamp

    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    q = l2_norm_clamp(jax.random.normal(ks[0], (b, h, s, dk), jnp.float32))
    k = l2_norm_clamp(jax.random.normal(ks[1], (b, h, s, dk), jnp.float32))
    v = jax.random.normal(ks[2], (b, h, s, dv), jnp.float32)
    beta = jax.nn.sigmoid(jax.random.normal(ks[3], (b, h, s)))
    alpha = jax.nn.sigmoid(jax.random.normal(ks[4], (b, h, s)) * 0.3 + 2.0)
    s0 = jax.random.normal(ks[5], (b, h, dv, dk), jnp.float32) * 0.1
    return q, k, v, beta, alpha, s0


def test_gdn_chunk_affine_matches_chunk():
    """S₀ @ T + C reproduces gdn_chunk's state update for arbitrary S₀."""
    from llm_quest_tpu.ops.gdn import gdn_chunk, gdn_chunk_affine

    q, k, v, beta, alpha, s0 = _gdn_inputs(s=32, seed=12)
    dk = k.shape[-1]
    st_ref, _ = gdn_chunk(q * dk**-0.5, k, v, beta, alpha, s0)
    t_c, c_c = gdn_chunk_affine(k, v, beta, alpha)
    st_aff = jnp.einsum("bhvd,bhde->bhve", s0, t_c) + c_c
    assert float(jnp.max(jnp.abs(st_ref - st_aff))) < 1e-5


def test_gdn_shard_affine_matches_chunked_final_state():
    from llm_quest_tpu.ops.gdn import gated_delta_rule_chunked, gdn_shard_affine

    q, k, v, beta, alpha, s0 = _gdn_inputs(s=100, seed=13)  # padded tail chunk
    _, st_ref = gated_delta_rule_chunked(q, k, v, beta, alpha, s0, chunk_size=32)
    t_s, c_s = gdn_shard_affine(k, v, beta, alpha, chunk_size=32)
    st_aff = jnp.einsum("bhvd,bhde->bhve", s0, t_s) + c_s
    assert float(jnp.max(jnp.abs(st_ref - st_aff))) < 1e-5


def test_gdn_sequence_parallel_matches_single_device():
    """LASP-style sequence-sharded gated delta rule == the global chunked
    form (outputs AND final state), with and without an incoming state."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 (virtual) devices")
    from llm_quest_tpu.ops.gdn import gated_delta_rule_chunked
    from llm_quest_tpu.parallel.mesh import create_mesh
    from llm_quest_tpu.parallel.sequence import gdn_sequence_parallel

    mesh = create_mesh(8, model_parallel=1)
    q, k, v, beta, alpha, s0 = _gdn_inputs(s=8 * 32)

    for prev in (None, s0):
        out_ref, st_ref = gated_delta_rule_chunked(
            q, k, v, beta, alpha, prev, chunk_size=16
        )
        out_sp, st_sp = gdn_sequence_parallel(
            mesh, "data", q, k, v, beta, alpha,
            chunk_size=16, use_kernel=False, prev_state=prev,
        )
        assert float(jnp.max(jnp.abs(out_ref - out_sp))) < 5e-5
        assert float(jnp.max(jnp.abs(st_ref - st_sp))) < 5e-5


@pytest.mark.slow
def test_gdn_sequence_parallel_gradients():
    """Gradients through pass A/all_gather/prefix-compose/pass B match the
    global chunked form — hybrid context-parallel TRAINING is exact."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 (virtual) devices")
    from llm_quest_tpu.ops.gdn import gated_delta_rule_chunked
    from llm_quest_tpu.parallel.mesh import create_mesh
    from llm_quest_tpu.parallel.sequence import gdn_sequence_parallel

    mesh = create_mesh(8, model_parallel=1)
    q, k, v, beta, alpha, s0 = _gdn_inputs(s=8 * 16, seed=14)

    def loss(fn):
        def inner(q, k, v, beta, alpha):
            o, st = fn(q, k, v, beta, alpha)
            return jnp.sum(jnp.sin(o)) + 0.01 * jnp.sum(st**2)

        return inner

    g_sp = jax.grad(
        loss(lambda *a: gdn_sequence_parallel(mesh, "data", *a, chunk_size=16, use_kernel=False)),
        argnums=tuple(range(5)),
    )(q, k, v, beta, alpha)
    g_ref = jax.grad(
        loss(lambda *a: gated_delta_rule_chunked(*a, chunk_size=16)),
        argnums=tuple(range(5)),
    )(q, k, v, beta, alpha)
    for a, b_ in zip(g_sp, g_ref):
        assert float(jnp.max(jnp.abs(a - b_))) < 5e-5


# ---------------------------------------------------------------- expert parallel


def _moe_fixture(key, *, shared=False, num_experts=8, d=32, hidden=64):
    from llm_quest_tpu.ops.moe import init_qwen3_moe

    cfg = {"emb_dim": d, "num_experts": num_experts, "moe_hidden_dim": hidden}
    if shared:
        cfg["shared_expert_hidden_dim"] = hidden
    return init_qwen3_moe(key, cfg, dtype=jnp.float32)


def test_ep_moe_matches_dense_dispatch(mesh8):
    """All-to-all EP dispatch == the single-device sort-based dispatch
    (lossless capacity), including the shared expert and the global LBL."""
    from llm_quest_tpu.ops.moe import qwen3_moe
    from llm_quest_tpu.parallel.expert_parallel import ep_qwen3_moe

    for shared in (False, True):
        params = _moe_fixture(jax.random.PRNGKey(0), shared=shared)
        x = jax.random.normal(jax.random.PRNGKey(1), (8, 6, 32), jnp.float32)

        ref_out, ref_aux = qwen3_moe(params, x, top_k=2, load_coeff=0.01, training=True)
        got_out, got_aux = ep_qwen3_moe(
            mesh8, params, x, top_k=2, load_coeff=0.01, capacity_factor=None, training=True
        )
        assert float(jnp.max(jnp.abs(ref_out - got_out))) < 1e-5, shared
        assert abs(float(ref_aux["moe_loss"]) - float(got_aux["moe_loss"])) < 1e-6, shared


def test_ep_moe_gradients_match_dense(mesh8):
    """d(loss)/d(experts, gate) through the all_to_all dispatch == dense path."""
    from llm_quest_tpu.ops.moe import qwen3_moe
    from llm_quest_tpu.parallel.expert_parallel import ep_qwen3_moe

    params = _moe_fixture(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 32), jnp.float32)

    def loss_dense(p):
        out, aux = qwen3_moe(p, x, top_k=2, load_coeff=0.01, training=True)
        return jnp.sum(jnp.sin(out)) + aux["moe_loss"]

    def loss_ep(p):
        out, aux = ep_qwen3_moe(mesh8, p, x, top_k=2, load_coeff=0.01,
                                capacity_factor=None, training=True)
        return jnp.sum(jnp.sin(out)) + aux["moe_loss"]

    gd = jax.grad(loss_dense)(params)
    ge = jax.grad(loss_ep)(params)
    for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(ge)):
        assert float(jnp.max(jnp.abs(a - b))) < 2e-5


def test_ep_moe_capacity_overflow_drops(mesh8):
    """Under-capacity buffers DROP overflow assignments (Switch/GShard
    contract) instead of corrupting other tokens' slots."""
    from llm_quest_tpu.parallel.expert_parallel import capacity_for, ep_qwen3_moe

    params = _moe_fixture(jax.random.PRNGKey(0))
    # steer every token to the same experts: huge gate weight on expert 0
    params["gate_w"] = params["gate_w"].at[:, 0].set(10.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 32), jnp.float32)

    cap = capacity_for(8, 2, 8, 0.5)
    assert cap < 16  # genuinely under-provisioned for the skewed routing
    out, aux = ep_qwen3_moe(mesh8, params, x, top_k=2, load_coeff=0.01,
                            capacity_factor=0.5, training=True)
    assert bool(jnp.all(jnp.isfinite(out)))
    # counts still see every assignment (routing is pre-drop bookkeeping)
    assert float(jnp.sum(aux["counts"])) == 8 * 8 * 2


def test_ep_model_level_matches_replicated(mesh8):
    """qwen3 MoE model forward with cfg["expert_parallel"] == the replicated
    forward: the EP seam is wired at the model level, not just the op."""
    from llm_quest_tpu.models import qwen3

    cfg = {
        "model_type": "moe", "vocab_size": 128, "context_length": 32, "emb_dim": 32,
        "n_layers": 2, "n_heads": 4, "num_kv_groups": 2, "head_dim": 8,
        "moe_hidden_dim": 64, "num_experts": 8, "top_k": 2, "aux_loss_coef": 0.001,
        "rope_base": 10_000, "tie_embeddings": True, "dtype": jnp.float32,
    }
    params = qwen3.init(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0, 128)

    ref_logits, _, ref_aux = qwen3.apply(params, cfg, ids, training=True)

    ep_cfg = dict(cfg, expert_parallel={"mesh": mesh8})
    with mesh8:
        got_logits, got_aux = jax.jit(
            lambda p, t: qwen3.apply(p, ep_cfg, t, training=True)[::2]
        )(params, ids)

    assert float(jnp.max(jnp.abs(ref_logits - got_logits))) < 2e-4
    assert abs(float(ref_aux["moe_loss"]) - float(got_aux["moe_loss"])) < 1e-6


def test_ep_collective_pattern(mesh8):
    """The compiled EP dispatch contains exactly 2 all-to-alls (dispatch +
    return) and no all-gather of expert weights — the designed communication
    pattern, not an emergent one. Documented in COVERAGE.md."""
    from llm_quest_tpu.parallel.expert_parallel import ep_qwen3_moe

    params = _moe_fixture(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 6, 32), jnp.float32)

    with mesh8:
        lowered = jax.jit(
            lambda p, x: ep_qwen3_moe(mesh8, p, x, top_k=2, load_coeff=0.01,
                                      capacity_factor=1.25, training=True)[0]
        ).lower(params, x)
    hlo = lowered.compile().as_text()
    # count op INSTANTIATIONS ("all-to-all(" = the op call syntax), not the
    # get-tuple-element lines that reference the op's result by name
    assert hlo.count("all-to-all(") == 2, hlo.count("all-to-all(")
    assert hlo.count("all-gather(") == 0  # expert weights are never gathered


# ------------------------------------------------------------- sharded checkpoints


def test_sharded_checkpoint_restore_onto_mesh(mesh8, tmp_path):
    """Save a TP-sharded train state, restore ONTO the mesh: bit parity,
    restored shardings == param shardings (no Orbax 'sharding info not
    provided' fallback), and training resumes with one more step."""
    import warnings

    import optax

    from llm_quest_tpu.parallel import shard_opt_state
    from llm_quest_tpu.parallel.sharding import make_sharded_train_step, shard_batch
    from llm_quest_tpu.training.checkpointing import load_checkpoint, save_checkpoint
    from llm_quest_tpu.training.engine import make_optimizer

    params = gpt2.init(jax.random.PRNGKey(0), TINY)
    optimizer = make_optimizer(1e-3)
    train_step, _ = make_sharded_train_step(gpt2, TINY, optimizer, mesh8, sharding_rules_gpt2)
    ids = jax.random.randint(jax.random.PRNGKey(1), (8, 32), 0, TINY["vocab_size"])
    host_batch = {"input_ids": ids, "targets": jnp.roll(ids, -1, 1),
                  "attn_mask": jnp.ones((8, 32), bool)}

    with mesh8:
        sharded = shard_params(params, mesh8, sharding_rules_gpt2)
        opt_state = shard_opt_state(optimizer, sharded, mesh8)
        batch = shard_batch(host_batch, mesh8)
        sharded, opt_state, loss0 = train_step(sharded, opt_state, batch)

        path = save_checkpoint(str(tmp_path / "sharded"), sharded,
                               opt_state=opt_state, step=1)

        # fresh abstract target carrying the mesh shardings
        target = {"params": sharded, "opt_state": opt_state, "step": 1}
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # the Orbax fallback warning = failure
            restored = load_checkpoint(path, target=target)

        # bit parity + shardings preserved
        for a, b in zip(jax.tree.leaves(sharded), jax.tree.leaves(restored["params"])):
            assert a.dtype == b.dtype
            assert float(jnp.max(jnp.abs(a - b))) == 0.0
            assert b.sharding == a.sharding, (b.sharding, a.sharding)
        def find_mu(state):
            if hasattr(state, "mu"):
                return state.mu
            if isinstance(state, (tuple, list)):
                for s in state:
                    r = find_mu(s)
                    if r is not None:
                        return r
            return None

        mu = find_mu(restored["opt_state"])
        assert mu["blocks"][0]["att"]["wq"]["w"].sharding.spec == jax.sharding.PartitionSpec(None, "model")
        assert int(restored["step"]) == 1

        # resume: one more train step straight from the restored state
        _, _, loss1 = train_step(restored["params"], restored["opt_state"], batch)
    assert jnp.isfinite(loss1) and float(loss1) < float(loss0)


# ---------------------------------------------------------- context parallelism


def test_context_parallel_model_forward_and_grads(mesh8):
    """A MODEL (not just the op) runs sequence-sharded: qwen3 with
    cfg["context_parallel"] routes its attention through ring-flash over the
    "data" axis; logits and parameter grads match the replicated forward."""
    from llm_quest_tpu.models import qwen3

    cfg = {
        "model_type": "dense", "vocab_size": 128, "context_length": 128, "emb_dim": 32,
        "n_layers": 2, "n_heads": 4, "num_kv_groups": 2, "head_dim": 8, "hidden_dim": 64,
        "rope_base": 10_000, "tie_embeddings": True, "dtype": jnp.float32,
    }
    params = qwen3.init(jax.random.PRNGKey(0), cfg)
    s = 4 * 32  # divisible by n_data * 8
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, s), 0, 128)
    targets = jnp.roll(ids, -1, 1)

    def loss_fn(p, c):
        logits, _, _ = qwen3.apply(p, c, ids, training=True)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, targets[..., None], axis=-1))

    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params, cfg)

    cp_cfg = dict(cfg, context_parallel={"mesh": mesh8, "axis": "data"})
    with mesh8:
        cp_loss, cp_grads = jax.jit(jax.value_and_grad(lambda p: loss_fn(p, cp_cfg)))(params)

    assert abs(float(ref_loss) - float(cp_loss)) < 1e-5
    for a, b in zip(jax.tree.leaves(ref_grads), jax.tree.leaves(cp_grads)):
        assert float(jnp.max(jnp.abs(a - b))) < 5e-5


def test_context_parallel_hybrid_model_forward_and_grads(mesh8):
    """The HYBRID model (Qwen3-Next: GDN + gated-attention layers) trains
    sequence-sharded: attention rides ring-flash, the gated delta rule rides
    the LASP affine-composition form — loss and grads match replicated."""
    from llm_quest_tpu.models import qwen3_next

    cfg = {
        "vocab_size": 128, "context_length": 128, "emb_dim": 32,
        "n_layers": 2, "linear_sdpa_ratio": 2,  # GDN, GA
        "n_heads": 4, "head_dim": 8, "num_kv_groups": 2,
        "partial_rope_factor": 0.25, "rope_base": 10_000,
        "linear_num_qk_heads": 2, "linear_num_value_heads": 4,
        "linear_qk_head_dim": 8, "linear_value_head_dim": 8,
        "linear_conv_kernel_size": 4,
        "moe_hidden_dim": 64, "shared_expert_hidden_dim": 64,
        "num_experts": 4, "top_k": 2, "aux_loss_coef": 0.001,
        "tie_embeddings": False, "p_dropout": 0.0, "dtype": jnp.float32,
        "gdn_chunk_size": 16,
    }
    params = qwen3_next.init(jax.random.PRNGKey(0), cfg)
    s = 4 * 32  # divisible by n_data·8 (attention) and n_data (GDN)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, s), 0, 128)
    targets = jnp.roll(ids, -1, 1)

    def loss_fn(p, c):
        logits, _, _ = qwen3_next.apply(p, c, ids, training=True)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, targets[..., None], axis=-1))

    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params, cfg)

    cp_cfg = dict(cfg, context_parallel={"mesh": mesh8, "axis": "data"})
    with mesh8:
        cp_loss, cp_grads = jax.jit(jax.value_and_grad(lambda p: loss_fn(p, cp_cfg)))(params)

    assert abs(float(ref_loss) - float(cp_loss)) < 1e-5
    for a, b in zip(jax.tree.leaves(ref_grads), jax.tree.leaves(cp_grads)):
        assert float(jnp.max(jnp.abs(a - b))) < 5e-5


def test_context_parallel_falls_back_when_unshardable(mesh8):
    """Sequences that don't divide over the CP axis still get CAUSAL
    attention (the router's sdpa fallback self-builds the mask)."""
    from llm_quest_tpu.models import qwen3

    cfg = {
        "model_type": "dense", "vocab_size": 128, "context_length": 64, "emb_dim": 32,
        "n_layers": 1, "n_heads": 4, "num_kv_groups": 2, "head_dim": 8, "hidden_dim": 64,
        "rope_base": 10_000, "tie_embeddings": True, "dtype": jnp.float32,
        "use_fused_mha": False,
    }
    params = qwen3.init(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 27), 0, 128)  # 27 ∤ 4·8

    ref, _, _ = qwen3.apply(params, cfg, ids)
    cp_cfg = dict(cfg, context_parallel={"mesh": mesh8, "axis": "data"})
    with mesh8:
        got, _, _ = qwen3.apply(params, cp_cfg, ids)
    assert float(jnp.max(jnp.abs(ref - got))) < 1e-5


def test_ep_deepseek_moe_matches_dense_dispatch(mesh8):
    """DeepSeekMoE (shared experts + aux-free biased top-k) through the
    all-to-all EP dispatch == the single-device path, incl. global counts."""
    from llm_quest_tpu.ops.moe import deepseek_moe, init_deepseek_moe
    from llm_quest_tpu.parallel.expert_parallel import ep_deepseek_moe

    cfg = {"emb_dim": 32, "hidden_dim": 64, "num_experts": 10, "num_shared_experts": 2,
           "top_k": 2, "moe_scaling_factor": "auto"}
    params = init_deepseek_moe(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params["biases"] = params["biases"] + jax.random.normal(jax.random.PRNGKey(9), params["biases"].shape) * 0.01
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 6, 32), jnp.float32)

    ref_out, ref_aux = deepseek_moe(params, x, top_k=2)
    got_out, got_aux = ep_deepseek_moe(mesh8, params, x, top_k=2, capacity_factor=None)
    assert float(jnp.max(jnp.abs(ref_out - got_out))) < 1e-5
    assert jnp.allclose(ref_aux["counts"], got_aux["counts"])
    assert abs(float(ref_aux["max_vio"]) - float(got_aux["max_vio"])) < 1e-6


def test_ep_model_level_deepseek_and_mimo(mesh8):
    """The EP seam is wired into EVERY DeepSeek-MoE consumer: deepseek_v3
    and mimo_v2_flash forwards with cfg["expert_parallel"] match their
    replicated forwards (shared experts local, routed experts through the
    all-to-all dispatch, global counts identical for the bias fold)."""
    from llm_quest_tpu.models import deepseek_v3, mimo_v2_flash

    ds_cfg = {
        "vocab_size": 128, "context_length": 32, "emb_dim": 32, "n_heads": 4,
        "n_layers": 3, "hidden_dim": 64, "num_ffn": 1, "num_experts": 9,
        "num_shared_experts": 1, "top_k": 2, "moe_scaling_factor": 1,
        "moe_bias_update_rate": 1e-3, "mtp_depth": 0, "mtp_loss_coeff": 0.0,
        "rope_base": 10_000, "q_rank": 32, "dtype": jnp.float32,
    }
    mm_cfg = {
        "vocab_size": 128, "context_length": 32, "emb_dim": 32, "n_layers": 3,
        "n_heads": 4, "num_swa_kv_groups": 2, "num_ga_kv_groups": 2,
        "head_dim": 8, "value_head_dim": 8, "hidden_dim": 64, "window_size": 4,
        "hybrid_ratio": 2, "rope_base": 10_000, "rope_base_ga": 640_000,
        "partial_rope_factor": 0.5, "mtp_depth": 0, "mtp_loss_coeff": 0.0,
        "num_experts": 9, "top_k": 2, "num_shared_experts": 1,
        "moe_scaling_factor": 1, "moe_bias_update_rate": 1e-3,
        "dtype": jnp.float32,
    }
    for model, cfg in ((deepseek_v3, ds_cfg), (mimo_v2_flash, mm_cfg)):
        params = model.init(jax.random.PRNGKey(0), cfg)
        ids = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0, 128)

        ref_logits, _, ref_aux = model.apply(params, cfg, ids)

        ep_cfg = dict(cfg, expert_parallel={"mesh": mesh8})
        with mesh8:
            got_logits, got_aux = jax.jit(
                lambda p, t, m=model, c=ep_cfg: m.apply(p, c, t)[::2]
            )(params, ids)

        assert float(jnp.max(jnp.abs(ref_logits - got_logits))) < 2e-4, model.__name__
        for rc, gc in zip(ref_aux["moe_counts"], got_aux["moe_counts"]):
            assert jnp.array_equal(rc, gc), model.__name__


def test_fsdp_train_step_matches_replicated(mesh8):
    """ZeRO-3 FSDP: params AND Adam moments fully sharded over "data"
    (composed with TP over "model"); XLA inserts the use-site all-gathers
    and grad reduce-scatters. One train step matches the replicated step,
    and the big leaves are verifiably distributed 1/8 per chip."""
    import numpy as np

    from llm_quest_tpu.parallel import fsdp_specs, make_sharded_train_step, shard_opt_state
    from llm_quest_tpu.parallel.sharding import shard_batch
    from llm_quest_tpu.training.engine import make_optimizer

    params = gpt2.init(jax.random.PRNGKey(0), TINY)
    optimizer = make_optimizer(1e-3)
    specs = fsdp_specs(params, sharding_rules_gpt2, mesh8)
    P = jax.sharding.PartitionSpec
    # TP spec (None, "model") gains "data" on the unsharded dim
    assert specs["blocks"][0]["att"]["wq"]["w"] == P("data", "model")
    # replicated TP spec () gains "data" on the largest dim — ZeRO-3 shards
    # even 1-D leaves; min_size keeps small ones replicated when asked
    assert specs["blocks"][0]["ffn"]["fc"]["b"] == P("data")
    assert specs["final_ln"]["scale"] == P("data")
    coarse = fsdp_specs(params, sharding_rules_gpt2, mesh8, min_size=256)
    assert coarse["final_ln"]["scale"] == P()

    train_step, _ = make_sharded_train_step(gpt2, TINY, optimizer, mesh8, specs)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (8, 32)), jnp.int32)
    batch = {"input_ids": ids, "targets": jnp.roll(ids, -1, 1),
             "attn_mask": jnp.ones((8, 32), bool)}
    ref_params, _, ref_loss = train_step(
        jax.tree.map(jnp.copy, params), optimizer.init(params), dict(batch)
    )
    with mesh8:
        sp = shard_params(params, mesh8, specs)
        st = shard_opt_state(optimizer, sp, mesh8)
        new_params, new_state, loss = train_step(sp, st, shard_batch(batch, mesh8))
        jax.block_until_ready(loss)

    assert abs(float(loss) - float(ref_loss)) < 1e-4
    wq_ref = ref_params["blocks"][0]["att"]["wq"]["w"]
    wq = new_params["blocks"][0]["att"]["wq"]["w"]
    assert float(jnp.max(jnp.abs(jnp.asarray(wq) - wq_ref))) < 1e-4

    # the updated param is STILL fully sharded (1/8 of the array per chip) ...
    assert wq.sharding.spec == P("data", "model")
    assert wq.addressable_shards[0].data.size * 8 == wq.size
    # ... and the Adam moments mirror it (ZeRO optimizer-state sharding)
    adam = [s for s in jax.tree.leaves(new_state, is_leaf=lambda x: hasattr(x, "mu"))
            if hasattr(s, "mu")]
    assert adam, "no Adam state found in optimizer chain"
    assert adam[0].mu["blocks"][0]["att"]["wq"]["w"].sharding.spec == P("data", "model")


def test_gpt2_pipeline_parallel_matches_sequential(mesh8):
    """cfg["pipeline_parallel"] on GPT-2: logits + grads match the
    sequential block loop (dryrun step (j) is the same check at entry)."""
    import numpy as np

    cfg = dict(TINY, n_layers=4)
    params = gpt2.init(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (4, 16)), jnp.int32)
    tgt = jnp.roll(ids, -1, 1)

    def loss(p, c):
        logits, _, _ = gpt2.apply(p, c, ids)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, tgt[..., None], axis=-1))

    ref_logits = gpt2.apply(params, cfg, ids)[0]
    ref_loss, ref_grads = jax.value_and_grad(loss)(params, cfg)

    pp_cfg = dict(cfg, pipeline_parallel={"mesh": mesh8, "axis": "model", "n_microbatches": 2})
    with mesh8:
        pp_logits = jax.jit(lambda p: gpt2.apply(p, pp_cfg, ids)[0])(params)
        pp_loss, pp_grads = jax.jit(jax.value_and_grad(lambda p: loss(p, pp_cfg)))(params)

    assert jnp.allclose(ref_logits, pp_logits, atol=1e-5), float(
        jnp.abs(ref_logits - pp_logits).max()
    )
    assert abs(float(ref_loss) - float(pp_loss)) < 1e-5
    gmax = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(ref_grads), jax.tree.leaves(pp_grads))
    )
    assert gmax < 5e-5, gmax
