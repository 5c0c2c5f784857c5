"""Continuous-batching serving engine (inference/serving.py): per-request
greedy tokens must be BIT-IDENTICAL to the batch-synchronous engine
(inference/generate.py), through slot reuse, mixed prompt buckets, EOS
retirement, and mid-flight admission."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_quest_tpu.inference import generate as gen
from llm_quest_tpu.inference.serving import ContinuousBatchingEngine
from llm_quest_tpu.models import qwen3

CFG = {
    "model_type": "dense", "vocab_size": 128, "context_length": 64, "emb_dim": 32,
    "n_layers": 2, "n_heads": 4, "num_kv_groups": 2, "head_dim": 8, "hidden_dim": 64,
    "rope_base": 10_000, "tie_embeddings": False, "dtype": jnp.float32,
}


@pytest.fixture(scope="module")
def params():
    return qwen3.init(jax.random.PRNGKey(0), CFG)


def _reference_tokens(params, ids, max_gen, eos_ids=-1):
    out = gen.generate_kv_cache(
        qwen3, params, CFG, jnp.asarray([ids], jnp.int32),
        max_gen=max_gen, temp=0.0, eos_ids=eos_ids, pad_id=0,
    )
    return out["sequences"][0, len(ids):].tolist()


def test_serving_matches_batched_engine_with_slot_reuse(params):
    """5 requests with mixed prompt lengths and gen budgets through 2 slots
    (forcing retire→refill mid-stream): every request's greedy tokens equal
    the reference engine's."""
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 128, size=n).tolist() for n in (3, 7, 5, 12, 4)]
    max_gens = [6, 10, 4, 8, 5]

    engine = ContinuousBatchingEngine(
        qwen3, params, CFG, n_slots=2, max_len=32, decode_chunk=3,
        prefill_buckets=(8, 16), temp=0.0, eos_ids=-1, pad_id=0,
    )
    outs = engine.serve(list(zip(prompts, max_gens)))

    for ids, mg, got in zip(prompts, max_gens, outs):
        ref = _reference_tokens(params, ids, mg)
        assert got == ref[: len(got)] and len(got) == mg, (got, ref)


def test_serving_early_exit_chunk_parity(params):
    """decode_chunk far larger than every request's budget: the chunk's
    early-exit while_loop (all slots finished) must leave the packed output
    byte-compatible — tokens still bit-match the batched engine and pad
    never leaks into results."""
    rng = np.random.default_rng(3)
    prompts = [rng.integers(1, 128, size=n).tolist() for n in (4, 6, 3)]
    max_gens = [3, 5, 2]  # all << decode_chunk=16

    engine = ContinuousBatchingEngine(
        qwen3, params, CFG, n_slots=4, max_len=32, decode_chunk=16,
        prefill_buckets=(8,), temp=0.0, eos_ids=-1, pad_id=0,
    )
    outs = engine.serve(list(zip(prompts, max_gens)))
    for ids, mg, got in zip(prompts, max_gens, outs):
        assert got == _reference_tokens(params, ids, mg) and len(got) == mg


def test_serving_eos_retires_and_refills(params):
    """EOS mid-generation retires the slot; the engine's output is trimmed
    at EOS and matches the reference engine run with the same eos id."""
    ids = [5, 9, 77, 3]
    free = _reference_tokens(params, ids, 8)
    eos = free[3]  # force an EOS on the 4th generated token

    engine = ContinuousBatchingEngine(
        qwen3, params, CFG, n_slots=2, max_len=32, decode_chunk=2,
        prefill_buckets=(8,), temp=0.0, eos_ids=eos, pad_id=0,
    )
    outs = engine.serve([(ids, 8), (ids, 8)])
    ref = _reference_tokens(params, ids, 8, eos_ids=eos)
    ref_trimmed = ref[: ref.index(eos) + 1]
    assert outs[0] == ref_trimmed
    assert outs[1] == ref_trimmed  # second request reused the retired slot


def test_serving_mid_flight_admission(params):
    """A request submitted AFTER decoding started still completes and
    matches the reference (iteration-level scheduling, not batch-sync)."""
    rng = np.random.default_rng(1)
    first = rng.integers(1, 128, size=6).tolist()
    late = rng.integers(1, 128, size=4).tolist()

    engine = ContinuousBatchingEngine(
        qwen3, params, CFG, n_slots=2, max_len=32, decode_chunk=2,
        prefill_buckets=(8,), temp=0.0, eos_ids=-1, pad_id=0,
    )
    engine.submit(first, 8)
    engine.step()  # decode begins with only the first request resident
    rid_late = engine.submit(late, 6)
    while engine.step():
        pass
    got = engine._requests[rid_late].tokens
    assert got == _reference_tokens(params, late, 6)


def test_serving_quantized_checkpoint(params):
    """An int8 checkpoint serves through the same engine (dispatch lives in
    ops/linear.py) and stays deterministic."""
    from llm_quest_tpu.ops.quantization import quantize_params_int8

    pq = quantize_params_int8(params, min_size=256)
    ids = [4, 8, 15, 16, 23]
    engine = ContinuousBatchingEngine(
        qwen3, pq, CFG, n_slots=1, max_len=32, decode_chunk=4,
        prefill_buckets=(8,), temp=0.0, eos_ids=-1, pad_id=0,
    )
    a = engine.serve([(ids, 6)])[0]
    engine2 = ContinuousBatchingEngine(
        qwen3, pq, CFG, n_slots=1, max_len=32, decode_chunk=4,
        prefill_buckets=(8,), temp=0.0, eos_ids=-1, pad_id=0,
    )
    b = engine2.serve([(ids, 6)])[0]
    assert a == b and len(a) == 6


def test_vector_pos_cache_write_matches_oracle():
    """cache._vector_pos_write (one-hot select, not scatter): s=1 and s>1
    forms against a per-row numpy loop."""
    from llm_quest_tpu.inference.cache import _vector_pos_write

    rng = np.random.default_rng(0)
    b, h, S, d = 4, 2, 16, 8
    buf = rng.standard_normal((b, h, S, d)).astype(np.float32)
    for s in (1, 3):
        new = rng.standard_normal((b, h, s, d)).astype(np.float32)
        pos = rng.integers(0, S - s + 1, size=b).astype(np.int32)
        ref = buf.copy()
        for r in range(b):
            ref[r, :, pos[r] : pos[r] + s] = new[r]
        got = _vector_pos_write(jnp.asarray(buf), jnp.asarray(new), jnp.asarray(pos))
        np.testing.assert_allclose(np.asarray(got), ref)


HYBRID_CFG = {
    "model_type": "qwen3_5_text", "vocab_size": 128, "emb_dim": 32, "hidden_dim": 64,
    "n_layers": 4, "linear_sdpa_ratio": 2, "n_heads": 4, "num_kv_groups": 2, "head_dim": 8,
    "rope_base": 10_000_000, "partial_rope_factor": 0.25, "context_length": 64,
    "linear_num_qk_heads": 2, "linear_num_value_heads": 4, "linear_qk_head_dim": 8,
    "linear_value_head_dim": 8, "linear_conv_kernel_size": 4,
    "tie_embeddings": False, "mrope_section": [1, 1, 0], "p_dropout": 0.0,
    "dtype": jnp.float32,
}


def test_serving_hybrid_qwen3_5(params):
    """The FLAGSHIP hybrid (GDN + full-attention) serves through the
    continuous engine: per-row cache pointers through the KV layers, slot
    replacement through the conv/recurrent states; greedy tokens match the
    batched engine through slot reuse."""
    from llm_quest_tpu.models import qwen3_5

    class TextModel:
        apply = staticmethod(qwen3_5.apply_text)
        init_cache = staticmethod(qwen3_5.init_cache)

    hp = qwen3_5.init_text(jax.random.PRNGKey(0), HYBRID_CFG)
    rng = np.random.default_rng(3)
    prompts = [rng.integers(1, 128, size=n).tolist() for n in (3, 7, 5, 11)]
    max_gens = [6, 9, 4, 7]

    engine = ContinuousBatchingEngine(
        TextModel, hp, HYBRID_CFG, n_slots=2, max_len=32, decode_chunk=3,
        prefill_buckets=(8, 16), temp=0.0, eos_ids=-1, pad_id=0,
    )
    outs = engine.serve(list(zip(prompts, max_gens)))

    for ids, mg, got in zip(prompts, max_gens, outs):
        ref = gen.generate_kv_cache(
            TextModel, hp, HYBRID_CFG, jnp.asarray([ids], jnp.int32),
            max_gen=mg, temp=0.0, eos_ids=-1, pad_id=0,
        )["sequences"][0, len(ids):].tolist()
        assert got == ref, (ids, got, ref)


def test_serving_qwen3_next_and_moe():
    """qwen3_next (GDN+GA hybrid with separate q/k/v conv states) and a
    Qwen3-MoE config both serve through the engine with token parity vs the
    batched engine (slot reuse through retire/refill)."""
    from llm_quest_tpu.models import qwen3_next

    nxt_cfg = {
        "vocab_size": 128, "context_length": 64, "emb_dim": 32,
        "n_layers": 2, "linear_sdpa_ratio": 2, "n_heads": 4, "head_dim": 8,
        "num_kv_groups": 2, "partial_rope_factor": 0.25, "rope_base": 10_000,
        "linear_num_qk_heads": 2, "linear_num_value_heads": 4,
        "linear_qk_head_dim": 8, "linear_value_head_dim": 8,
        "linear_conv_kernel_size": 4, "moe_hidden_dim": 64,
        "shared_expert_hidden_dim": 64, "num_experts": 4, "top_k": 2,
        "aux_loss_coef": 0.001, "tie_embeddings": False, "p_dropout": 0.0,
        "dtype": jnp.float32, "gdn_chunk_size": 16,
    }
    moe_cfg = {
        "model_type": "moe", "vocab_size": 128, "context_length": 64,
        "emb_dim": 32, "n_layers": 2, "n_heads": 4, "num_kv_groups": 2,
        "head_dim": 8, "moe_hidden_dim": 64, "num_experts": 4, "top_k": 2,
        "aux_loss_coef": 0.001, "rope_base": 10_000, "tie_embeddings": False,
        "dtype": jnp.float32,
    }
    rng = np.random.default_rng(7)
    prompts = [rng.integers(1, 128, size=n).tolist() for n in (4, 9, 6)]
    for model, cfg, seed in ((qwen3_next, nxt_cfg, 1), (qwen3, moe_cfg, 2)):
        p = model.init(jax.random.PRNGKey(seed), cfg)
        engine = ContinuousBatchingEngine(
            model, p, cfg, n_slots=2, max_len=32, decode_chunk=3,
            prefill_buckets=(16,), temp=0.0, eos_ids=-1, pad_id=0,
        )
        outs = engine.serve([(ids, 5) for ids in prompts])
        for ids, got in zip(prompts, outs):
            ref = gen.generate_kv_cache(
                model, p, cfg, jnp.asarray([ids], jnp.int32),
                max_gen=5, temp=0.0, eos_ids=-1, pad_id=0,
            )["sequences"][0, len(ids):].tolist()
            assert got == ref, (model.__name__, ids, got, ref)


def test_serving_sharded_on_mesh(params):
    """Multi-chip serving: the engine over a (data=4, model=2) mesh — params
    TP-sharded, slots sharded over "data", KV heads over "model", pinned
    across scheduler iterations — serves a heterogeneous slot-reuse workload
    with tokens identical to the single-device engine."""
    from jax.sharding import PartitionSpec as P

    from llm_quest_tpu.parallel import create_mesh, sharding_rules_llama

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    mesh = create_mesh(8, model_parallel=2)

    rng = np.random.default_rng(3)
    prompts = [rng.integers(1, 128, size=n).tolist() for n in (3, 7, 5, 12, 4, 9)]
    max_gens = [6, 10, 4, 8, 5, 7]

    engine = ContinuousBatchingEngine(
        qwen3, params, CFG, n_slots=4, max_len=32, decode_chunk=3,
        prefill_buckets=(8, 16), temp=0.0, eos_ids=-1, pad_id=0,
        mesh=mesh, param_rules=sharding_rules_llama,
    )
    # the pool is genuinely distributed: slot axis over "data", heads over "model"
    ksh = engine.state["cache"]["k"].sharding.spec
    assert tuple(ksh)[:3] == (None, "data", "model"), ksh
    assert tuple(engine.state["finished"].sharding.spec) == ("data",)

    outs = engine.serve(list(zip(prompts, max_gens)))
    for ids, mg, got in zip(prompts, max_gens, outs):
        assert got == _reference_tokens(params, ids, mg), (ids, got)

    # ...and it STAYED distributed through admit/decode/retire cycles
    assert tuple(engine.state["cache"]["k"].sharding.spec)[:3] == (None, "data", "model")


@pytest.mark.slow
def test_serving_sharded_int8_kv_flash_decode_on_mesh():
    """Multi-chip serving KEEPS the kernels: int8 KV cache + flash-decode
    Pallas kernel running head-sharded inside shard_map (each chip streams
    its resident kv heads, zero collectives) — tokens identical to the
    single-device int8 engine AND to its dequant fallback."""
    from llm_quest_tpu.parallel import create_mesh, sharding_rules_llama

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    mesh = create_mesh(8, model_parallel=2)
    cfg = {
        "model_type": "dense", "vocab_size": 128, "context_length": 64,
        "emb_dim": 64, "n_heads": 4, "num_kv_groups": 2, "head_dim": 128,
        "hidden_dim": 96, "n_layers": 2, "rope_base": 10_000,
        "tie_embeddings": False, "qk_norm": True, "dtype": jnp.float32,
        "kv_quant": "int8",
    }
    params = qwen3.init(jax.random.PRNGKey(4), cfg)
    rng = np.random.default_rng(6)
    prompts = [rng.integers(1, 128, size=n).tolist() for n in (4, 9, 6, 11)]

    engine = ContinuousBatchingEngine(
        qwen3, params, cfg, n_slots=4, max_len=32, decode_chunk=3,
        prefill_buckets=(16,), temp=0.0, eos_ids=-1, pad_id=0,
        mesh=mesh, param_rules=sharding_rules_llama,
    )
    assert engine.cfg.get("head_shard"), "head-sharded kernel routing should engage"
    assert "k_q" in engine.state["cache"], "int8 pool cache"
    outs = engine.serve([(ids, 5) for ids in prompts])

    ref_engine = ContinuousBatchingEngine(
        qwen3, params, cfg, n_slots=4, max_len=32, decode_chunk=3,
        prefill_buckets=(16,), temp=0.0, eos_ids=-1, pad_id=0,
    )
    refs = ref_engine.serve([(ids, 5) for ids in prompts])
    assert outs == refs, (outs, refs)


def test_serving_prefix_caching(params):
    """A registered prefix (system prompt) is prefilled ONCE; requests
    submitting only their suffix produce tokens IDENTICAL to serving the
    full prefix+suffix prompt — through mixed-prefix waves, slot reuse, and
    requests with no prefix in the same batch."""
    rng = np.random.default_rng(7)
    prefix = rng.integers(1, 128, size=6).tolist()
    suffixes = [rng.integers(1, 128, size=n).tolist() for n in (3, 5, 2, 7)]
    plain = rng.integers(1, 128, size=4).tolist()
    max_gens = [6, 8, 5, 7]

    engine = ContinuousBatchingEngine(
        qwen3, params, CFG, n_slots=2, max_len=40, decode_chunk=3,
        prefill_buckets=(8, 16), temp=0.0, eos_ids=-1, pad_id=0,
    )
    pid = engine.register_prefix(prefix)
    reqs = [(sfx, mg, pid) for sfx, mg in zip(suffixes, max_gens)] + [(plain, 6)]
    outs = engine.serve(reqs)

    for sfx, mg, got in zip(suffixes, max_gens, outs):
        ref = _reference_tokens(params, prefix + sfx, mg)
        assert got == ref, (sfx, got, ref)
    assert outs[-1] == _reference_tokens(params, plain, 6)


@pytest.mark.slow
def test_serving_prefix_caching_two_prefixes_and_budget():
    """Two different registered prefixes interleave in one workload; suffix
    budget validation accounts for the prefix length."""
    cfg = dict(CFG)
    params = qwen3.init(jax.random.PRNGKey(9), cfg)
    rng = np.random.default_rng(8)
    pa = rng.integers(1, 128, size=5).tolist()
    pb = rng.integers(1, 128, size=9).tolist()
    sfx = [rng.integers(1, 128, size=n).tolist() for n in (4, 3, 6)]

    engine = ContinuousBatchingEngine(
        qwen3, params, cfg, n_slots=2, max_len=40, decode_chunk=2,
        prefill_buckets=(8,), temp=0.0, eos_ids=-1, pad_id=0,
    )
    ia, ib = engine.register_prefix(pa), engine.register_prefix(pb)
    outs = engine.serve([(sfx[0], 5, ia), (sfx[1], 5, ib), (sfx[2], 5, ia)])

    def full(ids, mg):
        out = gen.generate_kv_cache(
            qwen3, params, cfg, jnp.asarray([ids], jnp.int32),
            max_gen=mg, temp=0.0, eos_ids=-1, pad_id=0,
        )
        return out["sequences"][0, len(ids):].tolist()

    assert outs[0] == full(pa + sfx[0], 5)
    assert outs[1] == full(pb + sfx[1], 5)
    assert outs[2] == full(pa + sfx[2], 5)

    with pytest.raises(ValueError, match="prefix"):
        engine.submit(rng.integers(1, 128, size=8).tolist(), 30, prefix=ib)


@pytest.mark.slow
def test_serving_prefix_caching_hybrid():
    """Hybrid (GDN + attention) prefix caching: the suffix prefill resumes
    the conv taps (causal_conv1d_seeded) and recurrent state exactly —
    prefix-cached tokens == full-prompt tokens on the flagship hybrid."""
    from llm_quest_tpu.models import qwen3_5

    class TextModel:
        apply = staticmethod(qwen3_5.apply_text)
        init_cache = staticmethod(qwen3_5.init_cache)

    hp = qwen3_5.init_text(jax.random.PRNGKey(0), HYBRID_CFG)
    rng = np.random.default_rng(11)
    prefix = rng.integers(1, 128, size=7).tolist()  # > conv window (ksz-1=3)
    short = rng.integers(1, 128, size=2).tolist()   # < conv window: state must
    long = rng.integers(1, 128, size=6).tolist()    # reach back into the taps

    engine = ContinuousBatchingEngine(
        TextModel, hp, HYBRID_CFG, n_slots=2, max_len=40, decode_chunk=3,
        prefill_buckets=(8,), temp=0.0, eos_ids=-1, pad_id=0,
    )
    pid = engine.register_prefix(prefix)
    outs = engine.serve([(short, 6, pid), (long, 6, pid)])
    for sfx, got in zip((short, long), outs):
        ref = gen.generate_kv_cache(
            TextModel, hp, HYBRID_CFG, jnp.asarray([prefix + sfx], jnp.int32),
            max_gen=6, temp=0.0, eos_ids=-1, pad_id=0,
        )["sequences"][0, len(prefix) + len(sfx):].tolist()
        assert got == ref, (sfx, got, ref)


@pytest.mark.slow
def test_serving_prefix_caching_on_mesh(params):
    """Prefix caching composes with multi-chip serving: registered-prefix
    requests through the TP/DP-sharded engine match full-prompt references."""
    from llm_quest_tpu.parallel import create_mesh, sharding_rules_llama

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    mesh = create_mesh(8, model_parallel=2)
    rng = np.random.default_rng(10)
    prefix = rng.integers(1, 128, size=6).tolist()
    suffixes = [rng.integers(1, 128, size=n).tolist() for n in (3, 5, 7, 2, 6)]

    engine = ContinuousBatchingEngine(
        qwen3, params, CFG, n_slots=4, max_len=40, decode_chunk=3,
        prefill_buckets=(8,), temp=0.0, eos_ids=-1, pad_id=0,
        mesh=mesh, param_rules=sharding_rules_llama,
    )
    pid = engine.register_prefix(prefix)
    outs = engine.serve([(sfx, 5, pid) for sfx in suffixes])
    for sfx, got in zip(suffixes, outs):
        assert got == _reference_tokens(params, prefix + sfx, 5), (sfx, got)


VLM_CFG = {
    "vocab_size": 512, "emb_dim": 64, "hidden_dim": 128, "n_layers": 4, "linear_sdpa_ratio": 2,
    "n_heads": 4, "num_kv_groups": 2, "head_dim": 16, "rope_base": 10_000_000,
    "partial_rope_factor": 0.25, "context_length": 128, "linear_num_qk_heads": 2,
    "linear_num_value_heads": 4, "linear_qk_head_dim": 8, "linear_value_head_dim": 8,
    "linear_conv_kernel_size": 4, "tie_embeddings": True, "mrope_section": [1, 1, 0],
    "vision_n_layers": 2, "vision_emb_dim": 32, "vision_hidden_dim": 64, "vision_num_heads": 2,
    "llm_d_in": 64, "in_channels": 3, "patch_size": 16, "spatial_merge_size": 2,
    "temporal_patch_size": 2, "num_position_embeddings": 256, "img_width": 64, "img_height": 64,
    "vision_rope_base": 10_000, "image_token_id": 500, "p_dropout": 0.0, "dtype": jnp.float32,
}


def test_serving_multimodal_vlm():
    """MULTIMODAL continuous-batching serving: image+text requests (each
    with its OWN image, encoded once at admission) interleave with a
    text-only request in one engine; every multimodal request's greedy
    tokens equal generate_multimodal's, the text-only one equals the
    batched text engine's."""
    from llm_quest_tpu.models import qwen3_5

    class VLM:
        apply = staticmethod(qwen3_5.apply)
        init_cache = staticmethod(qwen3_5.init_cache)

    params = qwen3_5.init(jax.random.PRNGKey(0), VLM_CFG)
    n_vis = (64 // 16) ** 2 // 2 ** 2  # 4 merged vision tokens
    rng = np.random.default_rng(12)

    def mm_prompt(head, tail):
        return (rng.integers(1, 500, size=head).tolist()
                + [VLM_CFG["image_token_id"]] * n_vis
                + rng.integers(1, 500, size=tail).tolist())

    prompts = [mm_prompt(2, 3), mm_prompt(4, 1)]
    images = [np.asarray(rng.standard_normal((3, 2, 64, 64)), np.float32) for _ in prompts]
    text_only = rng.integers(1, 500, size=5).tolist()

    engine = ContinuousBatchingEngine(
        VLM, params, VLM_CFG, n_slots=2, max_len=48, decode_chunk=3,
        prefill_buckets=(16,), temp=0.0, eos_ids=-1, pad_id=0,
    )
    # warm the multimodal admit family too (round 5): must not perturb live
    # state — the parity assertions below would catch any leakage
    engine.warmup(image_shape=images[0].shape)
    rids = [engine.submit(p, 6, pixels=img) for p, img in zip(prompts, images)]
    rid_text = engine.submit(text_only, 6)
    while engine.step():
        pass

    for rid, p, img in zip(rids, prompts, images):
        ref = qwen3_5.generate_multimodal(
            params, VLM_CFG, jnp.asarray([p], jnp.int32), jnp.asarray(img[None]),
            max_gen=6, temp=0.0, eos_ids=-1, pad_id=0,
        )["sequences"][0, len(p):].tolist()
        assert engine._requests[rid].tokens == ref, (rid, engine._requests[rid].tokens, ref)

    ref_text = gen.generate_kv_cache(
        VLM, params, VLM_CFG, jnp.asarray([text_only], jnp.int32),
        max_gen=6, temp=0.0, eos_ids=-1, pad_id=0,
    )["sequences"][0, len(text_only):].tolist()
    assert engine._requests[rid_text].tokens == ref_text


def test_serving_stats(params):
    """stats() accounting: completions, token counts, monotone stamps,
    utilization in (0, 1]."""
    rng = np.random.default_rng(13)
    prompts = [rng.integers(1, 128, size=n).tolist() for n in (3, 7, 5)]
    engine = ContinuousBatchingEngine(
        qwen3, params, CFG, n_slots=2, max_len=32, decode_chunk=3,
        prefill_buckets=(8,), temp=0.0, eos_ids=-1, pad_id=0, pipeline_depth=1,
    )
    engine.serve([(p, 5) for p in prompts])
    s = engine.stats()
    assert s["requests_submitted"] == 3 and s["requests_completed"] == 3
    assert s["tokens_generated"] == 15
    assert 0 < s["slot_utilization"] <= 1
    assert s["decode_chunks"] >= 3 and s["admit_waves"] >= 2  # 3 reqs / 2 slots
    assert s["ttft_p50_s"] > 0 and s["latency_p50_s"] >= s["ttft_p50_s"]
    assert s["queue_wait_p50_s"] >= 0 and s["gen_tok_per_s"] > 0
    for r in engine._requests.values():
        assert r.t_submit <= r.t_admit <= r.t_first <= r.t_done


@pytest.mark.slow
def test_serving_prefix_plus_multimodal():
    """The canonical VLM serving shape — shared text system prompt +
    per-request image suffix: prefix-cached multimodal requests are
    token-identical to generate_multimodal on the full prompt (validates
    the plen MRoPE translation); pure-text prefixes enforced."""
    from llm_quest_tpu.models import qwen3_5

    class VLM:
        apply = staticmethod(qwen3_5.apply)
        init_cache = staticmethod(qwen3_5.init_cache)

    params = qwen3_5.init(jax.random.PRNGKey(0), VLM_CFG)
    n_vis = 4
    rng = np.random.default_rng(14)
    sysprompt = rng.integers(1, 500, size=9).tolist()
    sfx = [
        rng.integers(1, 500, size=2).tolist() + [VLM_CFG["image_token_id"]] * n_vis
        + rng.integers(1, 500, size=2).tolist()
        for _ in range(2)
    ]
    images = [np.asarray(rng.standard_normal((3, 2, 64, 64)), np.float32) for _ in sfx]

    engine = ContinuousBatchingEngine(
        VLM, params, VLM_CFG, n_slots=2, max_len=48, decode_chunk=3,
        prefill_buckets=(16,), temp=0.0, eos_ids=-1, pad_id=0,
    )
    pid = engine.register_prefix(sysprompt)
    rids = [engine.submit(s, 6, prefix=pid, pixels=img) for s, img in zip(sfx, images)]
    while engine.step():
        pass

    for rid, s, img in zip(rids, sfx, images):
        full = sysprompt + s
        ref = qwen3_5.generate_multimodal(
            params, VLM_CFG, jnp.asarray([full], jnp.int32), jnp.asarray(img[None]),
            max_gen=6, temp=0.0, eos_ids=-1, pad_id=0,
        )["sequences"][0, len(full):].tolist()
        assert engine._requests[rid].tokens == ref, (s, engine._requests[rid].tokens, ref)

    with pytest.raises(ValueError, match="pure text"):
        engine.register_prefix([1, VLM_CFG["image_token_id"], 2])


@pytest.mark.slow
def test_serving_hybrid_on_mesh():
    """The hybrid (GDN + attention) serves mesh-sharded: GDN conv/recurrent
    states shard like the KV pool (slots over "data", value heads over
    "model") and XLA partitions the chunked delta rule; tokens match the
    single-device engine."""
    from llm_quest_tpu.models import qwen3_5
    from llm_quest_tpu.parallel import create_mesh, sharding_rules_llama

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    mesh = create_mesh(8, model_parallel=2)

    class TextModel:
        apply = staticmethod(qwen3_5.apply_text)
        init_cache = staticmethod(qwen3_5.init_cache)

    hp = qwen3_5.init_text(jax.random.PRNGKey(1), HYBRID_CFG)
    rng = np.random.default_rng(15)
    prompts = [rng.integers(1, 128, size=n).tolist() for n in (3, 7, 5, 11, 4)]

    engine = ContinuousBatchingEngine(
        TextModel, hp, HYBRID_CFG, n_slots=4, max_len=32, decode_chunk=3,
        prefill_buckets=(8, 16), temp=0.0, eos_ids=-1, pad_id=0,
        mesh=mesh, param_rules=sharding_rules_llama,
    )
    rec = engine.state["cache"]["recurrent"]
    assert tuple(rec.sharding.spec)[:3] == (None, "data", "model"), rec.sharding.spec
    outs = engine.serve([(p, 5) for p in prompts])
    for p, got in zip(prompts, outs):
        ref = gen.generate_kv_cache(
            TextModel, hp, HYBRID_CFG, jnp.asarray([p], jnp.int32),
            max_gen=5, temp=0.0, eos_ids=-1, pad_id=0,
        )["sequences"][0, len(p):].tolist()
        assert got == ref, (p, got, ref)


def test_serving_speculative_lossless(params):
    """Speculative continuous batching (greedy): per-request tokens are
    IDENTICAL to the plain engine — speculation is lossless — through slot
    reuse, mixed lengths, EOS retirement, and a draft that knows nothing."""
    draft_cfg = dict(CFG, n_layers=1, emb_dim=16, hidden_dim=32, head_dim=4)
    draft_params = qwen3.init(jax.random.PRNGKey(7), draft_cfg)
    rng = np.random.default_rng(16)
    prompts = [rng.integers(1, 128, size=n).tolist() for n in (3, 7, 5, 12, 4)]
    max_gens = [6, 10, 4, 8, 5]

    engine = ContinuousBatchingEngine(
        qwen3, params, CFG, n_slots=2, max_len=40, decode_chunk=2,
        prefill_buckets=(8, 16), temp=0.0, eos_ids=-1, pad_id=0,
        draft_model=qwen3, draft_params=draft_params, draft_cfg=draft_cfg, gamma=3,
    )
    outs = engine.serve(list(zip(prompts, max_gens)))
    for ids, mg, got in zip(prompts, max_gens, outs):
        ref = _reference_tokens(params, ids, mg)
        assert got == ref[: len(got)] and len(got) == mg, (ids, got, ref)

    # EOS mid-stream retires exactly like the plain engine
    ids = prompts[0]
    free = _reference_tokens(params, ids, 8)
    eos = free[3]
    eng2 = ContinuousBatchingEngine(
        qwen3, params, CFG, n_slots=2, max_len=40, decode_chunk=2,
        prefill_buckets=(8,), temp=0.0, eos_ids=eos, pad_id=0,
        draft_model=qwen3, draft_params=draft_params, draft_cfg=draft_cfg, gamma=3,
    )
    outs2 = eng2.serve([(ids, 8), (ids, 8)])
    ref = _reference_tokens(params, ids, 8, eos_ids=eos)
    ref = ref[: ref.index(eos) + 1]
    assert outs2 == [ref, ref], (outs2, ref)


def test_serving_speculative_self_draft_accepts_everything(params):
    """Draft == target: every window accepts all γ drafts + bonus, so each
    request finishes in ~max_gen/(γ+1) windows; tokens still exact."""
    rng = np.random.default_rng(17)
    ids = rng.integers(1, 128, size=5).tolist()
    engine = ContinuousBatchingEngine(
        qwen3, params, CFG, n_slots=1, max_len=48, decode_chunk=1,
        prefill_buckets=(8,), temp=0.0, eos_ids=-1, pad_id=0, pipeline_depth=1,
        draft_model=qwen3, draft_params=params, draft_cfg=CFG, gamma=3,
    )
    outs = engine.serve([(ids, 12)])
    assert outs[0] == _reference_tokens(params, ids, 12)
    # 12 tokens at γ+1=4 per window = 3 windows (decode_chunk=1 ⇒ 3 chunks)
    assert engine.stats()["decode_chunks"] == 3, engine.stats()


def test_serving_chunked_prefill_admission(params):
    """Prompts LONGER than the largest bucket admit through sequential
    fixed-size prefill chunks — tokens identical to the batched engine;
    short requests share the pool; per-row lengths may end in different
    chunks; the hybrid resumes GDN state across chunks."""
    rng = np.random.default_rng(18)
    long_a = rng.integers(1, 128, size=20).tolist()  # 3 chunks of 8
    long_b = rng.integers(1, 128, size=17).tolist()  # ends in chunk 3 col 0
    short = rng.integers(1, 128, size=5).tolist()

    engine = ContinuousBatchingEngine(
        qwen3, params, CFG, n_slots=2, max_len=40, decode_chunk=3,
        prefill_buckets=(8,), temp=0.0, eos_ids=-1, pad_id=0, prefill_chunk=8,
    )
    outs = engine.serve([(long_a, 6), (long_b, 6), (short, 6)])
    for ids, got in zip((long_a, long_b, short), outs):
        assert got == _reference_tokens(params, ids, 6), (len(ids), got)

    # hybrid: GDN conv/recurrent state must thread across prefill chunks
    from llm_quest_tpu.models import qwen3_5

    class TextModel:
        apply = staticmethod(qwen3_5.apply_text)
        init_cache = staticmethod(qwen3_5.init_cache)

    hp = qwen3_5.init_text(jax.random.PRNGKey(0), HYBRID_CFG)
    hyb_engine = ContinuousBatchingEngine(
        TextModel, hp, HYBRID_CFG, n_slots=1, max_len=40, decode_chunk=3,
        prefill_buckets=(8,), temp=0.0, eos_ids=-1, pad_id=0, prefill_chunk=8,
    )
    got = hyb_engine.serve([(long_a, 6)])[0]
    ref = gen.generate_kv_cache(
        TextModel, hp, HYBRID_CFG, jnp.asarray([long_a], jnp.int32),
        max_gen=6, temp=0.0, eos_ids=-1, pad_id=0,
    )["sequences"][0, len(long_a):].tolist()
    assert got == ref, (got, ref)


@pytest.mark.slow
def test_serving_speculative_stochastic(params):
    """temp>0 speculative serving: with draft == target the acceptance
    ratio p/q is exactly 1, so every window fully accepts (reference
    u < p/q semantics) — γ+1 committed per window; a weak draft still
    yields valid in-vocab tokens and full budgets."""
    rng = np.random.default_rng(19)
    ids = rng.integers(1, 128, size=5).tolist()
    engine = ContinuousBatchingEngine(
        qwen3, params, CFG, n_slots=1, max_len=48, decode_chunk=1,
        prefill_buckets=(8,), temp=0.8, eos_ids=-1, pad_id=0, pipeline_depth=1,
        draft_model=qwen3, draft_params=params, draft_cfg=CFG, gamma=3,
    )
    outs = engine.serve([(ids, 12)])
    assert len(outs[0]) == 12 and all(0 <= t < 128 for t in outs[0])
    assert engine.stats()["decode_chunks"] == 3, engine.stats()

    weak_cfg = dict(CFG, n_layers=1, emb_dim=16, hidden_dim=32, head_dim=4)
    weak = qwen3.init(jax.random.PRNGKey(21), weak_cfg)
    eng2 = ContinuousBatchingEngine(
        qwen3, params, CFG, n_slots=2, max_len=48, decode_chunk=2,
        prefill_buckets=(8,), temp=0.8, top_k=20, eos_ids=-1, pad_id=0,
        draft_model=qwen3, draft_params=weak, draft_cfg=weak_cfg, gamma=3,
    )
    outs2 = eng2.serve([(ids, 9), (rng.integers(1, 128, size=7).tolist(), 6)])
    assert [len(o) for o in outs2] == [9, 6]
    assert all(0 <= t < 128 for o in outs2 for t in o)


@pytest.mark.slow
def test_serving_speculative_with_prefix(params):
    """Prefix caching composes with speculative serving: both the target
    and draft pool caches seed from their registered prefix rows; greedy
    tokens equal the plain full-prompt engine (lossless through the
    composition)."""
    draft_cfg = dict(CFG, n_layers=1, emb_dim=16, hidden_dim=32, head_dim=4)
    draft_params = qwen3.init(jax.random.PRNGKey(7), draft_cfg)
    rng = np.random.default_rng(20)
    prefix = rng.integers(1, 128, size=7).tolist()
    suffixes = [rng.integers(1, 128, size=n).tolist() for n in (3, 5, 2)]

    engine = ContinuousBatchingEngine(
        qwen3, params, CFG, n_slots=2, max_len=48, decode_chunk=2,
        prefill_buckets=(8,), temp=0.0, eos_ids=-1, pad_id=0,
        draft_model=qwen3, draft_params=draft_params, draft_cfg=draft_cfg, gamma=3,
    )
    pid = engine.register_prefix(prefix)
    outs = engine.serve([(s, 6, pid) for s in suffixes])
    for s, got in zip(suffixes, outs):
        assert got == _reference_tokens(params, prefix + s, 6), (s, got)


# ---- every cached-decode model family serves through the same engine ----

_GPT2_TINY = {
    "vocab_size": 128, "context_length": 64, "emb_dim": 16, "n_heads": 2,
    "n_layers": 2, "drop_rate": 0.0, "qkv_bias": True,
}
_LLAMA_TINY = {
    "vocab_size": 128, "context_length": 64, "emb_dim": 64, "n_heads": 4,
    "n_layers": 2, "num_kv_groups": 2, "hidden_dim": 128, "rope_base": 10_000,
    "dtype": jnp.float32,
}
_GEMMA_TINY = {**_LLAMA_TINY, "window_size": 8, "local_global_att_ratio": 1}
_DSV3_TINY = {
    "vocab_size": 128, "context_length": 64, "emb_dim": 48, "n_heads": 4,
    "n_layers": 4, "hidden_dim": 96, "num_ffn": 2, "num_experts": 4,
    "num_shared_experts": 1, "top_k": 1, "moe_scaling_factor": 1,
    "moe_bias_update_rate": 1e-3, "mtp_depth": 2, "mtp_loss_coeff": 0.2,
    "rope_base": 10_000, "q_rank": 64, "dtype": jnp.float32,
}
_MIMO_TINY = {
    "vocab_size": 128, "context_length": 64, "emb_dim": 32, "n_layers": 6,
    "n_heads": 4, "num_swa_kv_groups": 4, "num_ga_kv_groups": 2, "head_dim": 12,
    "value_head_dim": 8, "hidden_dim": 64, "window_size": 4, "hybrid_ratio": 3,
    "rope_base": 10_000, "rope_base_ga": 640_000, "partial_rope_factor": 0.33,
    "mtp_depth": 2, "mtp_loss_coeff": 0.3, "num_experts": 4, "top_k": 2,
    "num_shared_experts": 0, "moe_scaling_factor": 1,
    "moe_bias_update_rate": 1e-3, "dtype": jnp.float32,
}


@pytest.mark.parametrize(
    "family,cfg",
    [("gpt2", _GPT2_TINY), ("llama3", _LLAMA_TINY), ("gemma3", _GEMMA_TINY),
     ("deepseek_v3", _DSV3_TINY), ("mimo_v2_flash", _MIMO_TINY)],
)
@pytest.mark.slow
def test_serving_every_model_family(family, cfg):
    """The engine is model-generic: every cached-decode architecture
    (learned-pos GPT-2, GQA Llama, SWA-alternating Gemma, MLA DeepSeek,
    sink+SWA-hybrid MiMo) serves a heterogeneous slot-reuse workload with
    greedy tokens identical to the batch-synchronous engine."""
    import importlib

    model = importlib.import_module(f"llm_quest_tpu.models.{family}")
    params = model.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    prompts = [rng.integers(1, cfg["vocab_size"], size=n).tolist() for n in (5, 9, 3, 12, 7)]
    gens = [8, 5, 11, 4, 9]

    engine = ContinuousBatchingEngine(
        model, params, cfg, n_slots=2, max_len=48, decode_chunk=3,
        prefill_buckets=(8, 16), temp=0.0, eos_ids=-1, pad_id=0,
    )
    outs = engine.serve(list(zip(prompts, gens)))
    for ids, n, got in zip(prompts, gens, outs):
        ref = gen.generate_kv_cache(
            model, params, cfg, jnp.asarray([ids], jnp.int32),
            max_gen=n, temp=0.0, eos_ids=-1, pad_id=0,
        )["sequences"][0, len(ids):].tolist()
        assert got == ref, (family, ids, got, ref)


def test_serving_multi_lora(params):
    """Multi-LoRA serving: requests select per-row stacked adapters in the
    same slot pool; each request's greedy tokens equal the plain engine run
    on its adapter DENSE-MERGED into the base weights (no-adapter requests
    equal the unmodified base)."""
    from llm_quest_tpu.ops import lora as L

    key = jax.random.PRNGKey(5)
    adapters = []
    for a in range(2):
        k = jax.random.fold_in(key, a)
        tree = L.replace_with_lora(
            k, params, 4, 8, path_filter=lambda p: "att" in p or "ffn" in p
        )

        def randomize(node, kk=k):
            if isinstance(node, dict):
                if "lora" in node:
                    b = node["lora"]["B"]
                    noise = 0.2 * jax.random.normal(jax.random.fold_in(kk, b.size), b.shape)
                    return {**node, "lora": {**node["lora"], "B": noise.astype(b.dtype)}}
                return {kk2: randomize(v, kk) for kk2, v in node.items()}
            if isinstance(node, list):
                return [randomize(v, kk) for v in node]
            return node

        adapters.append(randomize(tree))
    stacked = L.stack_adapters(adapters)

    rng = np.random.default_rng(11)
    prompts = [rng.integers(1, 128, size=n).tolist() for n in (5, 8, 3, 6, 4)]
    whos = [0, 1, None, 1, 0]
    gens = [7, 5, 9, 4, 6]

    engine = ContinuousBatchingEngine(
        qwen3, stacked, CFG, n_slots=2, max_len=48, decode_chunk=3,
        prefill_buckets=(8,), temp=0.0, eos_ids=-1, pad_id=0,
    )
    outs = engine.serve([(p, g, None, None, a) for p, g, a in zip(prompts, gens, whos)])
    for p, g, a, got in zip(prompts, gens, whos, outs):
        ref_params = params if a is None else L.merge_adapter(stacked, a)
        ref = gen.generate_kv_cache(
            qwen3, ref_params, CFG, jnp.asarray([p], jnp.int32),
            max_gen=g, temp=0.0, eos_ids=-1, pad_id=0,
        )["sequences"][0, len(p):].tolist()
        assert got == ref, (a, p, got, ref)


@pytest.mark.slow
def test_serving_speculative_on_mesh(params):
    """Speculative serving runs SHARDED: target and draft pools both
    distribute over the (data=4, model=2) mesh (slots over "data", KV heads
    over "model"), draft params TP-shard with their own rules, and greedy
    tokens stay identical to the plain single-device engine (lossless
    through the sharding)."""
    from llm_quest_tpu.parallel import create_mesh, sharding_rules_llama

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    mesh = create_mesh(8, model_parallel=2)

    draft_cfg = dict(CFG, n_layers=1, emb_dim=16, hidden_dim=32, head_dim=4)
    draft_params = qwen3.init(jax.random.PRNGKey(7), draft_cfg)
    rng = np.random.default_rng(13)
    prompts = [rng.integers(1, 128, size=n).tolist() for n in (4, 7, 3, 6, 5, 8)]
    gens = [7, 5, 9, 6, 4, 8]

    engine = ContinuousBatchingEngine(
        qwen3, params, CFG, n_slots=4, max_len=48, decode_chunk=2,
        prefill_buckets=(8,), temp=0.0, eos_ids=-1, pad_id=0,
        mesh=mesh, param_rules=sharding_rules_llama,
        draft_model=qwen3, draft_params=draft_params, draft_cfg=draft_cfg,
        draft_param_rules=sharding_rules_llama, gamma=3,
    )
    # both pools genuinely distributed
    assert tuple(engine.state["cache"]["k"].sharding.spec)[:3] == (None, "data", "model")
    assert tuple(engine.state["d_cache"]["k"].sharding.spec)[:2] == (None, "data")

    outs = engine.serve(list(zip(prompts, gens)))
    for ids, mg, got in zip(prompts, gens, outs):
        assert got == _reference_tokens(params, ids, mg), (ids, got)
    assert tuple(engine.state["d_cache"]["k"].sharding.spec)[:2] == (None, "data")


@pytest.mark.slow
def test_serving_multi_lora_with_prefix(params):
    """Per-tenant "system prompt + adapter": register_prefix(adapter=j)
    prefills the shared prefix THROUGH adapter j; suffix requests on that
    prefix decode through the same adapter, with greedy tokens equal to the
    plain engine on the adapter dense-merged (and base-prefix requests equal
    the base engine). Mismatched request/prefix adapters are rejected."""
    from llm_quest_tpu.ops import lora as L

    key = jax.random.PRNGKey(6)
    adapters = []
    for a in range(2):
        k = jax.random.fold_in(key, a)
        tree = L.replace_with_lora(
            k, params, 4, 8, path_filter=lambda p: "att" in p or "ffn" in p
        )

        def randomize(node, kk=k):
            if isinstance(node, dict):
                if "lora" in node:
                    b = node["lora"]["B"]
                    noise = 0.2 * jax.random.normal(jax.random.fold_in(kk, b.size), b.shape)
                    return {**node, "lora": {**node["lora"], "B": noise.astype(b.dtype)}}
                return {kk2: randomize(v, kk) for kk2, v in node.items()}
            if isinstance(node, list):
                return [randomize(v, kk) for v in node]
            return node

        adapters.append(randomize(tree))
    stacked = L.stack_adapters(adapters)

    rng = np.random.default_rng(17)
    prefix = rng.integers(1, 128, size=6).tolist()
    suffixes = [rng.integers(1, 128, size=n).tolist() for n in (3, 5, 2)]

    engine = ContinuousBatchingEngine(
        qwen3, stacked, CFG, n_slots=2, max_len=48, decode_chunk=2,
        prefill_buckets=(8,), temp=0.0, eos_ids=-1, pad_id=0,
    )
    pid0 = engine.register_prefix(prefix, adapter=0)
    pid_b = engine.register_prefix(prefix)  # base-model prefix
    with pytest.raises(ValueError, match="baked into prefix"):
        engine.submit(suffixes[0], 4, prefix=pid0, adapter=1)
    with pytest.raises(ValueError, match="baked into prefix"):
        engine.submit(suffixes[0], 4, prefix=pid0)  # None != 0

    reqs = [(s, 5, pid0, None, 0) for s in suffixes] + [(suffixes[0], 5, pid_b, None, None)]
    outs = engine.serve(reqs)
    merged = L.merge_adapter(stacked, 0)
    for s, got in zip(suffixes, outs[:3]):
        ref = gen.generate_kv_cache(
            qwen3, merged, CFG, jnp.asarray([prefix + s], jnp.int32),
            max_gen=5, temp=0.0, eos_ids=-1, pad_id=0,
        )["sequences"][0, len(prefix) + len(s):].tolist()
        assert got == ref, (s, got, ref)
    base_ref = gen.generate_kv_cache(
        qwen3, params, CFG, jnp.asarray([prefix + suffixes[0]], jnp.int32),
        max_gen=5, temp=0.0, eos_ids=-1, pad_id=0,
    )["sequences"][0, len(prefix) + len(suffixes[0]):].tolist()
    assert outs[3] == base_ref


def test_serving_per_request_sampling(params):
    """Per-request sampler settings in one pool: greedy (temp=0) and
    top_k=1 requests are deterministic and must match the plain greedy
    engine exactly, while stochastic requests (temp>0) in the SAME pool
    produce valid tokens; mixing with multi-LoRA composes."""
    rng = np.random.default_rng(23)
    prompts = [rng.integers(1, 128, size=n).tolist() for n in (5, 7, 3, 6)]

    engine = ContinuousBatchingEngine(
        qwen3, params, CFG, n_slots=2, max_len=48, decode_chunk=3,
        prefill_buckets=(8,), temp=0.9, top_k=20, eos_ids=-1, pad_id=0,
        per_request_sampling=True,
    )
    rids = [
        engine.submit(prompts[0], 6, temp=0.0),        # greedy override
        engine.submit(prompts[1], 8),                   # engine default (stochastic)
        engine.submit(prompts[2], 7, temp=0.8, top_k=1),  # top_k=1 → argmax
        engine.submit(prompts[3], 5, temp=1.2, top_p=0.9, top_k=None),
    ]
    while engine.step():
        pass
    outs = [engine._requests[r].tokens for r in rids]
    assert outs[0] == _reference_tokens(params, prompts[0], 6)
    assert outs[2] == _reference_tokens(params, prompts[2], 7)
    assert len(outs[1]) == 8 and all(0 <= t < 128 for t in outs[1])
    assert len(outs[3]) == 5 and all(0 <= t < 128 for t in outs[3])

    with pytest.raises(ValueError, match="per_request_sampling"):
        ContinuousBatchingEngine(
            qwen3, params, CFG, n_slots=1, max_len=48, prefill_buckets=(8,),
            temp=0.0, eos_ids=-1, pad_id=0,
        ).submit(prompts[0], 4, temp=0.5)
    with pytest.raises(ValueError, match="top_p and min_p"):
        engine.submit(prompts[0], 4, top_p=0.9, min_p=0.1)


@pytest.mark.slow
def test_serving_per_request_sampling_with_lora(params):
    """Per-request sampling + multi-LoRA in one pool: a greedy request on
    adapter 0 matches the plain engine on the adapter merged dense."""
    from llm_quest_tpu.ops import lora as L

    k = jax.random.PRNGKey(31)
    tree = L.replace_with_lora(k, params, 4, 8, path_filter=lambda p: "att" in p)

    def randomize(node):
        if isinstance(node, dict):
            if "lora" in node:
                b = node["lora"]["B"]
                noise = 0.2 * jax.random.normal(jax.random.fold_in(k, b.size), b.shape)
                return {**node, "lora": {**node["lora"], "B": noise.astype(b.dtype)}}
            return {kk: randomize(v) for kk, v in node.items()}
        if isinstance(node, list):
            return [randomize(v) for v in node]
        return node

    stacked = L.stack_adapters([randomize(tree)])
    rng = np.random.default_rng(29)
    p0, p1 = (rng.integers(1, 128, size=n).tolist() for n in (5, 6))

    engine = ContinuousBatchingEngine(
        qwen3, stacked, CFG, n_slots=2, max_len=48, decode_chunk=2,
        prefill_buckets=(8,), temp=0.7, eos_ids=-1, pad_id=0,
        per_request_sampling=True,
    )
    rids = [engine.submit(p0, 6, adapter=0, temp=0.0), engine.submit(p1, 5)]
    while engine.step():
        pass
    merged = L.merge_adapter(stacked, 0)
    ref = gen.generate_kv_cache(
        qwen3, merged, CFG, jnp.asarray([p0], jnp.int32),
        max_gen=6, temp=0.0, eos_ids=-1, pad_id=0,
    )["sequences"][0, len(p0):].tolist()
    assert engine._requests[rids[0]].tokens == ref
    assert len(engine._requests[rids[1]].tokens) == 5


def test_serving_returns_logprobs(params):
    """return_logprobs=True: each request's per-token logprobs equal the
    teacher-forced log-softmax of the model over prompt+generation (raw
    model distribution, OpenAI convention), aligned with its tokens."""
    rng = np.random.default_rng(41)
    prompts = [rng.integers(1, 128, size=n).tolist() for n in (5, 7, 3)]
    gens = [6, 4, 8]

    engine = ContinuousBatchingEngine(
        qwen3, params, CFG, n_slots=2, max_len=48, decode_chunk=3,
        prefill_buckets=(8,), temp=0.0, eos_ids=-1, pad_id=0,
        return_logprobs=True,
    )
    rids = [engine.submit(p, g) for p, g in zip(prompts, gens)]
    while engine.step():
        pass
    for p, g, rid in zip(prompts, gens, rids):
        toks = engine._requests[rid].tokens
        assert toks == _reference_tokens(params, p, g)
        lps = engine.request_logprobs(rid)
        assert len(lps) == g
        full = jnp.asarray([p + toks], jnp.int32)
        logits, _, _ = qwen3.apply(params, CFG, full)
        ref_lp = jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1)
        for i, (t, lp) in enumerate(zip(toks, lps)):
            want = float(ref_lp[len(p) - 1 + i, t])
            assert abs(lp - want) < 2e-4, (i, lp, want)


@pytest.mark.slow
def test_serving_moe_model_on_mesh():
    """A MoE model serves sharded: expert stacks distribute over "model"
    (the implicit weights-sharded EP path), slots over "data"; greedy
    tokens identical to the single-device engine."""
    from llm_quest_tpu.parallel import create_mesh, sharding_rules_llama

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    mesh = create_mesh(8, model_parallel=2)

    cfg = {
        "model_type": "moe", "vocab_size": 128, "context_length": 64,
        "emb_dim": 32, "n_layers": 2, "n_heads": 4, "num_kv_groups": 2,
        "head_dim": 8, "moe_hidden_dim": 64, "num_experts": 8, "top_k": 2,
        "aux_loss_coef": 0.001, "rope_base": 10_000, "tie_embeddings": False,
        "dtype": jnp.float32,
    }
    params = qwen3.init(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(37)
    prompts = [rng.integers(1, 128, size=n).tolist() for n in (4, 7, 3, 6, 5)]
    gens = [6, 5, 8, 4, 7]

    def ref(ids, mg):
        return gen.generate_kv_cache(
            qwen3, params, cfg, jnp.asarray([ids], jnp.int32),
            max_gen=mg, temp=0.0, eos_ids=-1, pad_id=0,
        )["sequences"][0, len(ids):].tolist()

    engine = ContinuousBatchingEngine(
        qwen3, params, cfg, n_slots=4, max_len=48, decode_chunk=3,
        prefill_buckets=(8,), temp=0.0, eos_ids=-1, pad_id=0,
        mesh=mesh, param_rules=sharding_rules_llama,
    )
    # expert stacks genuinely sharded over the expert dim
    lin1 = engine.params["blocks"][0]["moe"]["experts"]["lin1"]
    assert tuple(lin1.sharding.spec)[0] == "model", lin1.sharding.spec

    outs = engine.serve(list(zip(prompts, gens)))
    for ids, mg, got in zip(prompts, gens, outs):
        assert got == ref(ids, mg), (ids, got)


@pytest.mark.slow
def test_serving_moe_explicit_ep_on_mesh():
    """EXPLICIT expert parallelism in the production decode path: the
    engine serves a MoE model with cfg["expert_parallel"] — every admit
    and decode program dispatches tokens to expert shards via the
    2-all-to-all pattern (waves pad to the device multiple) — with greedy
    tokens identical to the single-device dense-dispatch engine."""
    from llm_quest_tpu.parallel import create_mesh, sharding_rules_llama

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    mesh = create_mesh(8, model_parallel=2)

    cfg = {
        "model_type": "moe", "vocab_size": 128, "context_length": 64,
        "emb_dim": 32, "n_layers": 2, "n_heads": 4, "num_kv_groups": 2,
        "head_dim": 8, "moe_hidden_dim": 64, "num_experts": 8, "top_k": 2,
        "aux_loss_coef": 0.001, "rope_base": 10_000, "tie_embeddings": False,
        "dtype": jnp.float32,
    }
    params = qwen3.init(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(43)
    prompts = [rng.integers(1, 128, size=n).tolist() for n in (4, 7, 3, 6, 5)]
    gens = [6, 5, 8, 4, 7]

    def ref(ids, mg):
        return gen.generate_kv_cache(
            qwen3, params, cfg, jnp.asarray([ids], jnp.int32),
            max_gen=mg, temp=0.0, eos_ids=-1, pad_id=0,
        )["sequences"][0, len(ids):].tolist()

    ep_cfg = dict(cfg, expert_parallel={"mesh": mesh})
    engine = ContinuousBatchingEngine(
        qwen3, params, ep_cfg, n_slots=8, max_len=48, decode_chunk=3,
        prefill_buckets=(8,), temp=0.0, eos_ids=-1, pad_id=0,
        mesh=mesh, param_rules=sharding_rules_llama,
    )
    outs = engine.serve(list(zip(prompts, gens)))
    for ids, mg, got in zip(prompts, gens, outs):
        assert got == ref(ids, mg), (ids, got)

    with pytest.raises(ValueError, match="divide over"):
        ContinuousBatchingEngine(
            qwen3, params, ep_cfg, n_slots=4, max_len=48,
            prefill_buckets=(8,), temp=0.0, eos_ids=-1, pad_id=0, mesh=mesh,
        )


def test_serving_auto_pipeline_depth(params):
    """pipeline_depth="auto" (the default): warmup() times one decode chunk
    against a tiny-op dispatch round trip and resolves depth to 1 (chunk
    dominates) or 2 (dispatch dominates); tokens stay exact either way."""
    rng = np.random.default_rng(11)
    prompts = [rng.integers(1, 128, size=n).tolist() for n in (4, 6, 5)]

    engine = ContinuousBatchingEngine(
        qwen3, params, CFG, n_slots=2, max_len=32, decode_chunk=3,
        prefill_buckets=(8,), temp=0.0, eos_ids=-1, pad_id=0,
    )
    assert engine._auto_depth and engine.pipeline_depth == 2  # pre-warmup default
    engine.warmup()
    assert engine.pipeline_depth in (1, 2)  # resolved from measurements
    outs = engine.serve([(p, 6) for p in prompts])
    for p, got in zip(prompts, outs):
        assert got == _reference_tokens(params, p, 6)
    # explicit int still pins (no auto resolution)
    pinned = ContinuousBatchingEngine(
        qwen3, params, CFG, n_slots=2, max_len=32, decode_chunk=3,
        prefill_buckets=(8,), temp=0.0, eos_ids=-1, pad_id=0, pipeline_depth=3,
    )
    pinned.warmup()
    assert pinned.pipeline_depth == 3


def test_serving_cancel(params):
    """cancel(rid): queued requests never admit; resident ones free their
    slot for the next wave; surviving requests still produce exact tokens."""
    rng = np.random.default_rng(47)
    prompts = [rng.integers(1, 128, size=n).tolist() for n in (5, 6, 4, 7)]

    engine = ContinuousBatchingEngine(
        qwen3, params, CFG, n_slots=2, max_len=48, decode_chunk=2,
        prefill_buckets=(8,), temp=0.0, eos_ids=-1, pad_id=0, pipeline_depth=1,
    )
    rids = [engine.submit(p, 10) for p in prompts]
    engine.step()  # admits rids[0], rids[1]; rids[2], rids[3] queued
    assert engine.cancel(rids[2])      # still queued — never admits
    engine.step()
    assert engine.cancel(rids[1])      # resident — slot frees for rids[3]
    assert not engine.cancel(rids[1])  # idempotent
    while engine.step():
        pass
    assert engine._requests[rids[0]].tokens == _reference_tokens(params, prompts[0], 10)
    assert engine._requests[rids[3]].tokens == _reference_tokens(params, prompts[3], 10)
    assert engine._requests[rids[2]].tokens == []
    assert len(engine._requests[rids[1]].tokens) < 10  # cut short mid-flight


@pytest.mark.slow
def test_serving_multi_lora_over_int8_base(params):
    """Multi-LoRA over a weight-only INT8 base checkpoint (the standard
    production deployment): replace_with_lora wraps quantized linears, the
    per-row delta rides on the int8 matmul, and greedy tokens equal the
    plain engine on the adapter dense-merged over the DEQUANTIZED base."""
    from llm_quest_tpu.ops import lora as L
    from llm_quest_tpu.ops.quantization import quantize_params_int8

    qparams = quantize_params_int8(params, min_size=0)
    k = jax.random.PRNGKey(51)
    tree = L.replace_with_lora(k, qparams, 4, 8, path_filter=lambda p: "att" in p)

    def randomize(node):
        if isinstance(node, dict):
            if "lora" in node:
                b = node["lora"]["B"]
                noise = 0.2 * jax.random.normal(jax.random.fold_in(k, b.size), b.shape)
                return {**node, "lora": {**node["lora"], "B": noise.astype(b.dtype)}}
            return {kk: randomize(v) for kk, v in node.items()}
        if isinstance(node, list):
            return [randomize(v) for v in node]
        return node

    stacked = L.stack_adapters([randomize(tree)])
    assert L.num_adapters(stacked) == 2  # the quantized att linears DID wrap

    rng = np.random.default_rng(53)
    p0, p1 = (rng.integers(1, 128, size=n).tolist() for n in (5, 6))
    engine = ContinuousBatchingEngine(
        qwen3, stacked, CFG, n_slots=2, max_len=48, decode_chunk=2,
        prefill_buckets=(8,), temp=0.0, eos_ids=-1, pad_id=0,
    )
    outs = engine.serve([(p0, 6, None, None, 0), (p1, 5)])

    merged = L.merge_adapter(stacked, 0)  # dense fp32 over dequantized base
    ref0 = gen.generate_kv_cache(
        qwen3, merged, CFG, jnp.asarray([p0], jnp.int32),
        max_gen=6, temp=0.0, eos_ids=-1, pad_id=0,
    )["sequences"][0, len(p0):].tolist()
    ref1 = gen.generate_kv_cache(
        qwen3, L.merge_adapter(stacked, 1), CFG, jnp.asarray([p1], jnp.int32),
        max_gen=5, temp=0.0, eos_ids=-1, pad_id=0,
    )["sequences"][0, len(p1):].tolist()
    assert outs[0] == ref0
    assert outs[1] == ref1  # null adapter == dequantized base


@pytest.mark.slow
def test_serving_multi_lora_chunked_prefill(params):
    """Long prompts (chunked-prefill admission) compose with multi-LoRA:
    adapter requests beyond the largest bucket prefill chunk by chunk
    through their adapter; tokens equal the dense-merged reference."""
    from llm_quest_tpu.ops import lora as L

    k = jax.random.PRNGKey(61)
    tree = L.replace_with_lora(k, params, 4, 16, path_filter=lambda p: "att" in p)

    def randomize(node):
        if isinstance(node, dict):
            if "lora" in node:
                b = node["lora"]["B"]
                noise = 0.2 * jax.random.normal(jax.random.fold_in(k, b.size), b.shape)
                return {**node, "lora": {**node["lora"], "B": noise.astype(b.dtype)}}
            return {kk: randomize(v) for kk, v in node.items()}
        if isinstance(node, list):
            return [randomize(v) for v in node]
        return node

    stacked = L.stack_adapters([randomize(tree)])
    rng = np.random.default_rng(59)
    long_a = rng.integers(1, 128, size=19).tolist()  # 3 chunks of 8
    short = rng.integers(1, 128, size=5).tolist()

    engine = ContinuousBatchingEngine(
        qwen3, stacked, CFG, n_slots=2, max_len=40, decode_chunk=3,
        prefill_buckets=(8,), temp=0.0, eos_ids=-1, pad_id=0, prefill_chunk=8,
    )
    outs = engine.serve([(long_a, 12, None, None, 0), (short, 6)])
    merged = L.merge_adapter(stacked, 0)
    ref_long = gen.generate_kv_cache(
        qwen3, merged, CFG, jnp.asarray([long_a], jnp.int32),
        max_gen=12, temp=0.0, eos_ids=-1, pad_id=0,
    )["sequences"][0, len(long_a):].tolist()
    assert outs[0] == ref_long
    assert outs[1] == _reference_tokens(params, short, 6)
    # the DECODE side must run through the adapter too (regression: a stale
    # per-slot adapter once decoded through the base and still matched a
    # 6-token oracle) — base-model decode from the same prefill must differ
    base_long = gen.generate_kv_cache(
        qwen3, params, CFG, jnp.asarray([long_a], jnp.int32),
        max_gen=12, temp=0.0, eos_ids=-1, pad_id=0,
    )["sequences"][0, len(long_a):].tolist()
    assert outs[0] != base_long


@pytest.mark.slow
def test_serving_multimodal_with_lora():
    """Multimodal + multi-LoRA: an image request through adapter 0 (text
    layers wrapped) equals generate_multimodal on the dense-merged params;
    a base image request and a text-only one share the pool."""
    from llm_quest_tpu.models import qwen3_5
    from llm_quest_tpu.ops import lora as L

    class VLM:
        apply = staticmethod(qwen3_5.apply)
        init_cache = staticmethod(qwen3_5.init_cache)

    params = qwen3_5.init(jax.random.PRNGKey(0), VLM_CFG)
    k = jax.random.PRNGKey(67)
    tree = L.replace_with_lora(
        k, params, 4, 8, path_filter=lambda p: "/text/" in p and "att" in p
    )

    def randomize(node):
        if isinstance(node, dict):
            if "lora" in node:
                b = node["lora"]["B"]
                noise = 0.3 * jax.random.normal(jax.random.fold_in(k, b.size), b.shape)
                return {**node, "lora": {**node["lora"], "B": noise.astype(b.dtype)}}
            return {kk: randomize(v) for kk, v in node.items()}
        if isinstance(node, list):
            return [randomize(v) for v in node]
        return node

    stacked = L.stack_adapters([randomize(tree)])
    assert L.num_adapters(stacked) == 2

    n_vis = (64 // 16) ** 2 // 2 ** 2
    rng = np.random.default_rng(71)

    def mm_prompt(head, tail):
        return (rng.integers(1, 500, size=head).tolist()
                + [VLM_CFG["image_token_id"]] * n_vis
                + rng.integers(1, 500, size=tail).tolist())

    p0, p1 = mm_prompt(2, 3), mm_prompt(3, 2)
    img0, img1 = (np.asarray(rng.standard_normal((3, 2, 64, 64)), np.float32) for _ in range(2))
    text_only = rng.integers(1, 500, size=5).tolist()

    engine = ContinuousBatchingEngine(
        VLM, stacked, VLM_CFG, n_slots=2, max_len=48, decode_chunk=3,
        prefill_buckets=(16,), temp=0.0, eos_ids=-1, pad_id=0,
    )
    r0 = engine.submit(p0, 6, pixels=img0, adapter=0)
    r1 = engine.submit(p1, 6, pixels=img1)
    r2 = engine.submit(text_only, 6)
    while engine.step():
        pass

    merged = L.merge_adapter(stacked, 0)
    ref0 = qwen3_5.generate_multimodal(
        merged, VLM_CFG, jnp.asarray([p0], jnp.int32), jnp.asarray(img0[None]),
        max_gen=6, temp=0.0, eos_ids=-1, pad_id=0,
    )["sequences"][0, len(p0):].tolist()
    ref1 = qwen3_5.generate_multimodal(
        params, VLM_CFG, jnp.asarray([p1], jnp.int32), jnp.asarray(img1[None]),
        max_gen=6, temp=0.0, eos_ids=-1, pad_id=0,
    )["sequences"][0, len(p1):].tolist()
    assert engine._requests[r0].tokens == ref0
    assert engine._requests[r1].tokens == ref1
    ref2 = gen.generate_kv_cache(
        VLM, params, VLM_CFG, jnp.asarray([text_only], jnp.int32),
        max_gen=6, temp=0.0, eos_ids=-1, pad_id=0,
    )["sequences"][0, len(text_only):].tolist()
    assert engine._requests[r2].tokens == ref2


@pytest.mark.slow
def test_serving_speculative_with_lora(params):
    """Speculative serving composes with multi-LoRA: the TARGET verifies
    through each slot's adapter (draft stays base — lossless regardless of
    acceptance), incl. on a registered prefix. Greedy tokens equal the
    plain engine on the dense-merged adapter."""
    from llm_quest_tpu.ops import lora as L

    k = jax.random.PRNGKey(73)
    tree = L.replace_with_lora(k, params, 4, 16, path_filter=lambda p: "att" in p)

    def randomize(node):
        if isinstance(node, dict):
            if "lora" in node:
                b = node["lora"]["B"]
                noise = 0.3 * jax.random.normal(jax.random.fold_in(k, b.size), b.shape)
                return {**node, "lora": {**node["lora"], "B": noise.astype(b.dtype)}}
            return {kk: randomize(v) for kk, v in node.items()}
        if isinstance(node, list):
            return [randomize(v) for v in node]
        return node

    stacked = L.stack_adapters([randomize(tree)])
    draft_cfg = dict(CFG, n_layers=1, emb_dim=16, hidden_dim=32, head_dim=4)
    draft_params = qwen3.init(jax.random.PRNGKey(7), draft_cfg)
    rng = np.random.default_rng(79)
    p0, p1 = (rng.integers(1, 128, size=n).tolist() for n in (5, 7))

    engine = ContinuousBatchingEngine(
        qwen3, stacked, CFG, n_slots=2, max_len=48, decode_chunk=2,
        prefill_buckets=(8,), temp=0.0, eos_ids=-1, pad_id=0,
        draft_model=qwen3, draft_params=draft_params, draft_cfg=draft_cfg, gamma=3,
    )
    outs = engine.serve([(p0, 10, None, None, 0), (p1, 6)])
    merged = L.merge_adapter(stacked, 0)
    ref0 = gen.generate_kv_cache(
        qwen3, merged, CFG, jnp.asarray([p0], jnp.int32),
        max_gen=10, temp=0.0, eos_ids=-1, pad_id=0,
    )["sequences"][0, len(p0):].tolist()
    assert outs[0] == ref0
    assert outs[1] == _reference_tokens(params, p1, 6)
    # decode-side divergence from base proves the verify ran the adapter
    base0 = gen.generate_kv_cache(
        qwen3, params, CFG, jnp.asarray([p0], jnp.int32),
        max_gen=10, temp=0.0, eos_ids=-1, pad_id=0,
    )["sequences"][0, len(p0):].tolist()
    assert outs[0] != base0

    # prefix + spec + adapter: the per-tenant full stack
    prefix = rng.integers(1, 128, size=6).tolist()
    pid = engine.register_prefix(prefix, adapter=0)
    suf = rng.integers(1, 128, size=3).tolist()
    got = engine.serve([(suf, 6, pid, None, 0)])[0]
    ref = gen.generate_kv_cache(
        qwen3, merged, CFG, jnp.asarray([prefix + suf], jnp.int32),
        max_gen=6, temp=0.0, eos_ids=-1, pad_id=0,
    )["sequences"][0, len(prefix) + len(suf):].tolist()
    assert got == ref


@pytest.mark.slow
def test_serving_speculative_chunked_prefill(params):
    """Long prompts + speculative decode: chunked-prefill admission fills
    BOTH pool caches; greedy tokens equal the plain engine (lossless)."""
    draft_cfg = dict(CFG, n_layers=1, emb_dim=16, hidden_dim=32, head_dim=4)
    draft_params = qwen3.init(jax.random.PRNGKey(7), draft_cfg)
    rng = np.random.default_rng(83)
    long_a = rng.integers(1, 128, size=20).tolist()  # 3 chunks of 8
    long_b = rng.integers(1, 128, size=17).tolist()  # ends in chunk 3 col 0
    short = rng.integers(1, 128, size=5).tolist()

    engine = ContinuousBatchingEngine(
        qwen3, params, CFG, n_slots=2, max_len=48, decode_chunk=2,
        prefill_buckets=(8,), temp=0.0, eos_ids=-1, pad_id=0, prefill_chunk=8,
        draft_model=qwen3, draft_params=draft_params, draft_cfg=draft_cfg, gamma=3,
    )
    outs = engine.serve([(long_a, 8), (long_b, 8), (short, 6)])
    for ids, mg, got in zip((long_a, long_b, short), (8, 8, 6), outs):
        assert got == _reference_tokens(params, ids, mg), (len(ids), got)


@pytest.mark.slow
def test_serving_speculative_per_request_sampling(params):
    """Per-request sampling inside SPECULATIVE serving: greedy-override
    requests use exact-match acceptance and match the plain greedy engine
    EXACTLY (lossless through the per-row path) while stochastic requests
    decode in the same pool; top_k=1 stochastic rows are argmax-
    deterministic and also match greedy."""
    draft_cfg = dict(CFG, n_layers=1, emb_dim=16, hidden_dim=32, head_dim=4)
    draft_params = qwen3.init(jax.random.PRNGKey(7), draft_cfg)
    rng = np.random.default_rng(89)
    prompts = [rng.integers(1, 128, size=n).tolist() for n in (5, 7, 4)]

    engine = ContinuousBatchingEngine(
        qwen3, params, CFG, n_slots=2, max_len=48, decode_chunk=2,
        prefill_buckets=(8,), temp=0.9, top_k=20, eos_ids=-1, pad_id=0,
        draft_model=qwen3, draft_params=draft_params, draft_cfg=draft_cfg, gamma=3,
        per_request_sampling=True,
    )
    rids = [
        engine.submit(prompts[0], 9, temp=0.0),           # greedy in a stochastic pool
        engine.submit(prompts[1], 7),                      # engine default stochastic
        engine.submit(prompts[2], 6, temp=0.8, top_k=1),   # argmax-deterministic
    ]
    while engine.step():
        pass
    toks0, done0 = engine.result(rids[0])
    assert done0 and toks0 == _reference_tokens(params, prompts[0], 9)
    toks1, _ = engine.result(rids[1])
    assert len(toks1) == 7 and all(0 <= t < 128 for t in toks1)
    toks2, _ = engine.result(rids[2])
    assert toks2 == _reference_tokens(params, prompts[2], 6)

    with pytest.raises(ValueError, match="min_p"):
        engine.submit(prompts[0], 4, temp=0.5, min_p=0.1)


def test_serving_multimodal_uint8_pixel_transform():
    """uint8 pixel feed + on-device pixel_transform == serving float pixels
    pre-transformed on the host (the wire carries 1/4 the bytes; numerics
    are identical because the transform runs before the encode either way)."""
    from llm_quest_tpu.models import qwen3_5

    class VLM:
        apply = staticmethod(qwen3_5.apply)
        init_cache = staticmethod(qwen3_5.init_cache)

    params = qwen3_5.init(jax.random.PRNGKey(0), VLM_CFG)
    n_vis = (64 // 16) ** 2 // 2 ** 2
    rng = np.random.default_rng(3)
    prompt = ([5, 6] + [VLM_CFG["image_token_id"]] * n_vis + [7])
    img_u8 = rng.integers(0, 256, size=(3, 2, 64, 64), dtype=np.uint8)
    transform = lambda px: (px.astype(jnp.float32) - 127.5) / 58.0

    def serve(pixels, pixel_transform):
        eng = ContinuousBatchingEngine(
            VLM, params, VLM_CFG, n_slots=2, max_len=48, decode_chunk=4,
            prefill_buckets=(16,), temp=0.0, eos_ids=-1, pad_id=0,
            pixel_transform=pixel_transform,
        )
        rid = eng.submit(prompt, 6, pixels=pixels)
        while eng.step():
            pass
        return eng._requests[rid].tokens

    got = serve(img_u8, transform)
    ref = serve(np.asarray(transform(jnp.asarray(img_u8))), None)
    assert got == ref, (got, ref)
