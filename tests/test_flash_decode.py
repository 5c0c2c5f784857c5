"""Flash-decode kernel (int8 KV cache) vs the dequantize-then-sdpa oracle,
plus the cache/attention-router integration on a real model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_quest_tpu.kernels.flash_attention import NEG_INF
from llm_quest_tpu.kernels.flash_decode import flash_decode
from llm_quest_tpu.ops.quantization import QuantKV, quantize_rows_int8

jax.config.update("jax_enable_x64", False)


def _oracle(q, k_q, k_s, v_q, v_s, bias, scale=None):
    scale = scale if scale is not None else q.shape[-1] ** -0.5
    k = k_q.astype(jnp.float32) * k_s[..., None]
    v = v_q.astype(jnp.float32) * v_s[..., None]
    g = q.shape[1] // k.shape[1]
    k = jnp.repeat(k, g, axis=1)
    v = jnp.repeat(v, g, axis=1)
    s = jnp.einsum("bhqd,bhsd->bhqs", q.astype(jnp.float32), k) * scale
    s = s + bias[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqs,bhsd->bhqd", p, v).astype(q.dtype)


def _make(b, hq, hkv, S, d, dv, seed=0, n_valid=None):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, hq, 1, d)), jnp.float32)
    k_q = jnp.asarray(rng.integers(-127, 128, (b, hkv, S, d)), jnp.int8)
    v_q = jnp.asarray(rng.integers(-127, 128, (b, hkv, S, dv)), jnp.int8)
    k_s = jnp.asarray(rng.uniform(0.005, 0.02, (b, hkv, S)), jnp.float32)
    v_s = jnp.asarray(rng.uniform(0.005, 0.02, (b, hkv, S)), jnp.float32)
    valid = np.zeros((b, S), bool)
    for i in range(b):
        n = S if n_valid is None else n_valid[i % len(n_valid)]
        valid[i, :n] = True
    bias = jnp.where(jnp.asarray(valid), 0.0, NEG_INF).astype(jnp.float32)
    return q, k_q, k_s, v_q, v_s, bias


@pytest.mark.parametrize("hq,hkv", [(4, 2), (2, 2), (8, 1)])
def test_flash_decode_matches_oracle(hq, hkv):
    q, k_q, k_s, v_q, v_s, bias = _make(2, hq, hkv, 96, 128, 128, seed=1, n_valid=[96, 31])
    got = flash_decode(q, k_q, k_s, v_q, v_s, bias, block_k=32, interpret=True)
    ref = _oracle(q, k_q, k_s, v_q, v_s, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_flash_decode_pads_seq_and_wide_heads():
    # S not a block multiple (padded with NEG_INF internally), d=256 (qwen3.5)
    q, k_q, k_s, v_q, v_s, bias = _make(2, 4, 2, 70, 256, 128, seed=2, n_valid=[70, 5])
    got = flash_decode(q, k_q, k_s, v_q, v_s, bias, block_k=32, interpret=True)
    ref = _oracle(q, k_q, k_s, v_q, v_s, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_quantized_cache_roundtrip():
    from llm_quest_tpu.inference import cache as kvc

    cache = kvc.init_kv_cache(2, 3, 2, 16, 128, quant="int8")
    rng = np.random.default_rng(3)
    k_new = jnp.asarray(rng.standard_normal((3, 2, 4, 128)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((3, 2, 4, 128)), jnp.float32)
    cache, kq, vq = kvc.update_layer(cache, 1, k_new, v_new)
    assert isinstance(kq, QuantKV) and kq.data.dtype == jnp.int8
    deq = kq.dequant(jnp.float32)[:, :, :4]
    # int8 absmax rows: error bounded by scale/2 = absmax/254
    bound = np.abs(np.asarray(k_new)).max(-1, keepdims=True) / 254 + 1e-6
    assert (np.abs(np.asarray(deq) - np.asarray(k_new)) <= bound).all()
    assert kvc.max_len(cache) == 16
    # layer 0 untouched
    assert not np.asarray(cache["k_q"][0]).any()
    got_v = vq.dequant(jnp.float32)[:, :, :4]
    vb = np.abs(np.asarray(v_new)).max(-1, keepdims=True) / 254 + 1e-6
    assert (np.abs(np.asarray(got_v) - np.asarray(v_new)) <= vb).all()


def _tiny_cfg():
    return {
        "vocab_size": 128, "context_length": 64, "emb_dim": 64, "n_heads": 4,
        "num_kv_groups": 2, "head_dim": 128, "hidden_dim": 96, "n_layers": 2,
        "rope_base": 10_000, "tie_embeddings": False, "qk_norm": True,
        "dtype": jnp.float32,
    }


def test_qwen3_generates_with_int8_kv_cache():
    """End-to-end: kv_quant routes decode through the flash-decode kernel
    (interpret on CPU). Kernel path and dequant-fallback path must produce
    IDENTICAL greedy tokens (same quantized cache, fp32 model — only the
    association order differs); vs the bf16 exact cache the logits agree to
    int8-quantization tolerance."""
    from llm_quest_tpu.inference import generate as gen
    from llm_quest_tpu.models import qwen3

    cfg = dict(_tiny_cfg(), kv_quant="int8")
    params = qwen3.init(jax.random.PRNGKey(0), cfg)
    prompt = jnp.asarray([[5, 9, 17, 3], [7, 2, 0, 0]], jnp.int32)
    attn = jnp.asarray([[1, 1, 1, 1], [1, 1, 0, 0]], bool)

    out_kernel = gen.generate_batched_kv_cache(
        qwen3, params, cfg, prompt, attn,
        max_gen=6, temp=0.0, eos_ids=-1, pad_id=0,
    )["sequences"]
    out_fallback = gen.generate_batched_kv_cache(
        qwen3, params, dict(cfg, use_flash_decode=False), prompt, attn,
        max_gen=6, temp=0.0, eos_ids=-1, pad_id=0,
    )["sequences"]
    np.testing.assert_array_equal(np.asarray(out_kernel), np.asarray(out_fallback))

    # quality vs the exact cache: single-step logits close
    exact = dict(_tiny_cfg())
    cache_e = qwen3.init_cache(exact, 2, 16)
    cache_q = qwen3.init_cache(cfg, 2, 16)
    mask_buf = jnp.concatenate([attn, jnp.zeros((2, 12), bool)], axis=1)
    log_e, cache_e, _ = qwen3.apply(params, exact, prompt, attn_mask=mask_buf, cache=cache_e)
    log_q, cache_q, _ = qwen3.apply(params, cfg, prompt, attn_mask=mask_buf, cache=cache_q)
    a, b = np.asarray(log_e[:, -1]), np.asarray(log_q[:, -1])
    cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
    assert (cos > 0.999).all(), cos


def test_hybrid_qwen3_5_int8_kv_cache():
    """The hybrid flagship: int8 KV on the full-attention layers, fp GDN
    states. Kernel path == dequant-fallback path token-for-token."""
    from llm_quest_tpu.inference import generate as gen
    from llm_quest_tpu.models import qwen3_5

    cfg = {
        "vocab_size": 128, "context_length": 64, "emb_dim": 64,
        "hidden_dim": 96, "n_layers": 4, "linear_sdpa_ratio": 2,
        "n_heads": 4, "num_kv_groups": 2, "head_dim": 128,
        "rope_base": 10_000, "partial_rope_factor": 0.25,
        "linear_num_qk_heads": 2, "linear_num_value_heads": 4,
        "linear_qk_head_dim": 16, "linear_value_head_dim": 16,
        "linear_conv_kernel_size": 4, "tie_embeddings": False,
        "p_dropout": 0.0, "dtype": jnp.float32, "gdn_chunk_size": 8,
        "mrope_section": [6, 5, 5], "kv_quant": "int8",
    }

    class Text:
        apply = staticmethod(qwen3_5.apply_text)
        init_cache = staticmethod(qwen3_5.init_cache)

    params = qwen3_5.init_text(jax.random.PRNGKey(0), cfg)
    prompt = jnp.asarray([[5, 9, 17, 3]], jnp.int32)
    attn = jnp.ones((1, 4), bool)
    out_kernel = gen.generate_batched_kv_cache(
        Text, params, cfg, prompt, attn, max_gen=5, temp=0.0, eos_ids=-1, pad_id=0,
    )["sequences"]
    out_fallback = gen.generate_batched_kv_cache(
        Text, params, dict(cfg, use_flash_decode=False), prompt, attn,
        max_gen=5, temp=0.0, eos_ids=-1, pad_id=0,
    )["sequences"]
    np.testing.assert_array_equal(np.asarray(out_kernel), np.asarray(out_fallback))


def test_serving_engine_int8_kv_cache():
    """Continuous-batching serving over the quantized cache: the per-row
    vector pos writes flow through the int8 buffers; engine output matches
    the batched engine with the same quantized cfg token-for-token."""
    from llm_quest_tpu.inference import generate as gen
    from llm_quest_tpu.inference.serving import ContinuousBatchingEngine
    from llm_quest_tpu.models import qwen3

    cfg = dict(_tiny_cfg(), kv_quant="int8")
    params = qwen3.init(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(11)
    prompts = [rng.integers(1, 128, size=n).tolist() for n in (4, 7)]
    engine = ContinuousBatchingEngine(
        qwen3, params, cfg, n_slots=2, max_len=32, decode_chunk=3,
        prefill_buckets=(16,), temp=0.0, eos_ids=-1, pad_id=0,
    )
    outs = engine.serve([(ids, 5) for ids in prompts])
    for ids, got in zip(prompts, outs):
        ref = gen.generate_kv_cache(
            qwen3, params, cfg, jnp.asarray([ids], jnp.int32),
            max_gen=5, temp=0.0, eos_ids=-1, pad_id=0,
        )["sequences"][0, len(ids):].tolist()
        assert got == ref, (ids, got, ref)
