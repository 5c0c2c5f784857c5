"""Weight-only int8 quantization (ops/quantization.py) — a serving feature
beyond the reference (which has no quantization): per-channel / sub-channel
symmetric int8 with the dequant folded around the matmul, applied as a pure
params-pytree transform that every model serves through the shared
``ops.linear.linear`` dispatch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_quest_tpu.ops.linear import init_linear, linear
from llm_quest_tpu.ops.quantization import (
    dequantize_int8,
    int8_matmul,
    quantize_linear_int8,
    quantize_params_int8,
    quantized_byte_fraction,
)


def test_quantize_roundtrip_error_bound():
    """|w − dequant(quant(w))| ≤ scale/2 elementwise (round-to-nearest)."""
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 48)) * 0.3
    for bs in (None, 16):
        q = quantize_linear_int8({"w": w}, block_size=bs)
        w_hat = dequantize_int8(q["w_q"], q["w_scale"])
        scale = q["w_scale"]
        bound = (
            scale[None, :] if scale.ndim == 1
            else jnp.repeat(scale, w.shape[0] // scale.shape[0], axis=0)
        )
        assert bool(jnp.all(jnp.abs(w - w_hat) <= 0.5 * bound + 1e-7))


def test_block_scales_tighter_than_per_channel():
    """Sub-channel blocks bound the error by the BLOCK max, not the column
    max — strictly tighter on heavy-tailed columns."""
    w = jax.random.normal(jax.random.PRNGKey(1), (128, 32))
    w = w.at[0, :].mul(20.0)  # one outlier row inflates every column scale
    qc = quantize_linear_int8({"w": w})
    qb = quantize_linear_int8({"w": w}, block_size=32)
    err_c = float(jnp.mean(jnp.abs(w - dequantize_int8(qc["w_q"], qc["w_scale"]))))
    err_b = float(jnp.mean(jnp.abs(w - dequantize_int8(qb["w_q"], qb["w_scale"]))))
    assert err_b < 0.5 * err_c


def test_linear_dispatch_matches_manual_dequant():
    """linear() on a quantized dict == x @ dequant(w) + b, both scale forms."""
    p = init_linear(jax.random.PRNGKey(2), 64, 40, bias=True)
    x = jax.random.normal(jax.random.PRNGKey(3), (5, 64))
    for bs in (None, 16):
        q = quantize_linear_int8(p, block_size=bs)
        ref = x @ dequantize_int8(q["w_q"], q["w_scale"]) + p["b"]
        got = linear(q, x)
        assert float(jnp.max(jnp.abs(ref - got))) < 1e-5
        assert q["w_q"].dtype == jnp.int8
        assert bool(jnp.all(q["b"] == p["b"]))  # bias passes through in fp


def test_int8_matmul_block_matches_per_channel_form():
    """The blocked einsum path is the same math as explicit dequant."""
    w = jax.random.normal(jax.random.PRNGKey(4), (96, 56))
    q = quantize_linear_int8({"w": w}, block_size=24)
    x = jax.random.normal(jax.random.PRNGKey(5), (3, 96))
    ref = x @ dequantize_int8(q["w_q"], q["w_scale"])
    got = int8_matmul(x, q["w_q"], q["w_scale"])
    assert float(jnp.max(jnp.abs(ref - got))) < 1e-4


def test_int4_block_quantization():
    """bits=4: s4 storage, error bounded by the block scale/2, dispatch
    through linear() matches explicit dequant."""
    p = init_linear(jax.random.PRNGKey(6), 128, 64, bias=False)
    q = quantize_linear_int8(p, block_size=32, bits=4)
    assert q["w_q"].dtype == jnp.int4
    w_hat = dequantize_int8(q["w_q"], q["w_scale"])
    bound = jnp.repeat(q["w_scale"], 32, axis=0)
    assert bool(jnp.all(jnp.abs(p["w"] - w_hat) <= 0.5 * bound + 1e-7))
    x = jax.random.normal(jax.random.PRNGKey(7), (3, 128))
    got = linear(q, x)
    ref = x @ w_hat
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-4


def test_quantize_params_tree_walk_exclusions():
    """Embeddings, conv taps, and sub-min_size linears stay fp; LoRA
    sub-dicts survive on quantized layers."""
    params = {
        "tok_emb": {"w": jnp.ones((256, 64))},
        "blocks": [
            {
                "att": {
                    "wq": {
                        "w": jnp.full((64, 64), 0.5),
                        "lora": {"a": jnp.ones((64, 4)), "b": jnp.zeros((4, 64))},
                    },
                    "conv_q": {"w": jnp.ones((64, 4))},
                },
                "tiny": {"w": jnp.ones((8, 8))},
                "norm": {"scale": jnp.ones((64,))},
            }
        ],
    }
    q = quantize_params_int8(params, min_size=1024)
    assert "w" in q["tok_emb"] and q["tok_emb"]["w"].dtype == jnp.float32
    blk = q["blocks"][0]
    assert "w_q" in blk["att"]["wq"] and "lora" in blk["att"]["wq"]
    assert "w" in blk["att"]["conv_q"]  # conv excluded
    assert "w" in blk["tiny"]  # below min_size
    assert "scale" in blk["norm"]
    frac = quantized_byte_fraction(q, params)
    assert frac < 1.0


@pytest.fixture(scope="module")
def mesh8():
    from llm_quest_tpu.parallel.mesh import create_mesh

    if jax.device_count() < 8:
        pytest.skip("needs 8 (virtual) devices")
    return create_mesh(8, model_parallel=2)


def _qwen3_cfg():
    return {
        "model_type": "dense", "vocab_size": 128, "context_length": 64,
        "emb_dim": 64, "n_layers": 2, "n_heads": 4, "num_kv_groups": 2,
        "head_dim": 16, "hidden_dim": 128, "rope_base": 10_000,
        "tie_embeddings": False, "dtype": jnp.float32,
    }


def test_quantized_model_logits_close_and_decode_runs():
    """Whole-model int8 serving through the unchanged apply/decode engine:
    logits stay within quantization tolerance and greedy decode runs
    deterministically."""
    from llm_quest_tpu.inference import generate as gen
    from llm_quest_tpu.models import qwen3

    cfg = _qwen3_cfg()
    params = qwen3.init(jax.random.PRNGKey(0), cfg)
    params_q = quantize_params_int8(params, min_size=1024)

    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, 128)
    logits_fp, _, _ = qwen3.apply(params, cfg, ids, training=False)
    logits_q, _, _ = qwen3.apply(params_q, cfg, ids, training=False)
    denom = float(jnp.max(jnp.abs(logits_fp))) + 1e-9
    rel = float(jnp.max(jnp.abs(logits_fp - logits_q))) / denom
    assert rel < 0.05, rel

    out1 = gen.generate_kv_cache(
        qwen3, params_q, cfg, ids[:1, :6], max_gen=8, temp=0.0, eos_ids=-1, pad_id=0
    )
    out2 = gen.generate_kv_cache(
        qwen3, params_q, cfg, ids[:1, :6], max_gen=8, temp=0.0, eos_ids=-1, pad_id=0
    )
    assert out1["sequences"].tolist() == out2["sequences"].tolist()


def test_quantized_moe_matches_dequant_reference():
    """int8 expert stacks through the sort-based ragged_dot dispatch equal
    the same dispatch run on explicitly dequantized fp weights (the scale
    epilogue is exact per expert group), shared experts included."""
    from llm_quest_tpu.ops import moe

    cfg = {"emb_dim": 48, "moe_hidden_dim": 64, "num_experts": 4, "top_k": 2,
           "num_shared_experts": 1, "aux_loss_coef": 0.001}
    params = moe.init_qwen3_moe(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 48))

    q = quantize_params_int8(params, min_size=1)
    assert "lin1_q" in q["experts"] and q["experts"]["lin1_q"].dtype == jnp.int8

    deq = {}
    for k, v in q["experts"].items():
        if k.endswith("_q"):
            name = k[:-2]
            scale = q["experts"][name + "_scale"]
            deq[name] = jnp.stack([
                v[e].astype(jnp.float32) * scale[e][None, :] for e in range(v.shape[0])
            ])
        elif not k.endswith("_scale"):
            deq[k] = v
    params_deq = dict(params, experts=deq)

    out_q, _ = moe.qwen3_moe(q, x, top_k=2, load_coeff=0.0, training=False)
    out_ref, _ = moe.qwen3_moe(params_deq, x, top_k=2, load_coeff=0.0, training=False)
    assert float(jnp.max(jnp.abs(out_q - out_ref))) < 1e-4


def test_quantized_moe_model_decode_runs():
    """A quantized Qwen3-MoE checkpoint serves through the unchanged engine."""
    from llm_quest_tpu.inference import generate as gen
    from llm_quest_tpu.models import qwen3

    cfg = {
        "model_type": "moe", "vocab_size": 128, "context_length": 64, "emb_dim": 64,
        "n_layers": 2, "n_heads": 4, "num_kv_groups": 2, "head_dim": 16,
        "moe_hidden_dim": 64, "num_experts": 4, "top_k": 2, "aux_loss_coef": 0.001,
        "rope_base": 10_000, "tie_embeddings": False, "dtype": jnp.float32,
    }
    params_q = quantize_params_int8(qwen3.init(jax.random.PRNGKey(0), cfg), min_size=1024)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 6), 0, 128)
    out = gen.generate_kv_cache(
        qwen3, params_q, cfg, ids, max_gen=8, temp=0.0, eos_ids=-1, pad_id=0
    )
    assert out["sequences"].shape[-1] == 14


def test_quantized_sharding_specs_follow_base_rules():
    """w_q inherits the w rule; w_scale follows the rule's output axis."""
    from jax.sharding import PartitionSpec as P

    from llm_quest_tpu.parallel.sharding import param_specs, sharding_rules_llama

    params = {
        "blocks": [
            {
                "att": {
                    "wq": {"w_q": jnp.zeros((64, 64), jnp.int8), "w_scale": jnp.zeros((64,))},
                    "out_proj": {
                        "w_q": jnp.zeros((64, 64), jnp.int8),
                        "w_scale": jnp.zeros((4, 64)),  # blocked
                    },
                }
            }
        ],
    }
    specs = param_specs(params, sharding_rules_llama)
    att = specs["blocks"][0]["att"]
    assert att["wq"]["w_q"] == P(None, "model")
    assert att["wq"]["w_scale"] == P("model")
    assert att["out_proj"]["w_q"] == P("model", None)
    assert att["out_proj"]["w_scale"] == P("model", None)


def test_quantized_tp_decode_matches_single_device(mesh8):
    """A quantized checkpoint serves tensor-parallel: identical greedy
    tokens sharded vs unsharded (int8 weights shard like their fp rule)."""
    from llm_quest_tpu.inference import generate as gen
    from llm_quest_tpu.models import qwen3
    from llm_quest_tpu.parallel.sharding import shard_batch, shard_params, sharding_rules_llama

    cfg = dict(_qwen3_cfg(), emb_dim=32, head_dim=8, hidden_dim=64)
    params_q = quantize_params_int8(qwen3.init(jax.random.PRNGKey(0), cfg), min_size=256)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (8, 6), 0, 128)
    mask = jnp.ones((8, 6), bool)

    ref = gen.generate_batched_kv_cache(
        qwen3, params_q, cfg, prompt, mask, max_gen=6, temp=0.0, eos_ids=-1, pad_id=0
    )
    with mesh8:
        sp = shard_params(params_q, mesh8, sharding_rules_llama)
        batch = shard_batch({"ids": prompt}, mesh8)
        out = gen.generate_batched_kv_cache(
            qwen3, sp, cfg, batch["ids"], mask, max_gen=6, temp=0.0, eos_ids=-1, pad_id=0
        )
    assert ref["sequences"].tolist() == out["sequences"].tolist()


def test_quantized_embedding_roundtrip_and_gather():
    """Per-row table quantization: gather-dequant == dequant-then-gather,
    and the row error is bounded by scale/2."""
    from llm_quest_tpu.ops.linear import embedding
    from llm_quest_tpu.ops.quantization import quantize_embedding_int8

    w = jax.random.normal(jax.random.PRNGKey(0), (96, 48)) * 0.2
    q = quantize_embedding_int8({"w": w})
    assert q["w_q"].shape == (96, 48) and q["w_scale"].shape == (96,)
    w_hat = q["w_q"].astype(jnp.float32) * q["w_scale"][:, None]
    assert bool(jnp.all(jnp.abs(w - w_hat) <= 0.5 * q["w_scale"][:, None] + 1e-7))

    ids = jnp.asarray([[3, 17, 95], [0, 1, 2]])
    got = embedding(q, ids, dtype=jnp.float32)
    assert float(jnp.max(jnp.abs(got - w_hat[ids]))) < 1e-6
    # default dequant dtype is the bf16 serving convention
    assert embedding(q, ids).dtype == jnp.bfloat16


def test_quantized_tied_head_exact_epilogue():
    """tied_head on an int8 table == h @ dequant(w).T EXACTLY (fp32): the
    per-row scale is the matmul's output-channel scale, so dequantization
    commutes with the contraction."""
    from llm_quest_tpu.ops.linear import tied_head
    from llm_quest_tpu.ops.quantization import quantize_embedding_int8

    w = jax.random.normal(jax.random.PRNGKey(1), (64, 32))
    h = jax.random.normal(jax.random.PRNGKey(2), (5, 32))
    q = quantize_embedding_int8({"w": w})
    ref = h @ (q["w_q"].astype(jnp.float32) * q["w_scale"][:, None]).T
    got = tied_head(q, h)
    assert float(jnp.max(jnp.abs(ref - got))) < 1e-5


def test_quantize_embeddings_flag_tied_model_decode():
    """quantize_embeddings=True quantizes tok_emb per-row; a TIED-head model
    decodes through the unchanged engine with logits close to the fp path
    (the table is the largest streamed matrix at real vocab sizes)."""
    from llm_quest_tpu.models import qwen3

    cfg = dict(_qwen3_cfg(), tie_embeddings=True)
    params = qwen3.init(jax.random.PRNGKey(0), cfg)
    params_q = quantize_params_int8(params, min_size=256, quantize_embeddings=True)
    assert "w_q" in params_q["tok_emb"] and "w" not in params_q["tok_emb"]
    # default stays conservative: without the flag the table passes through
    assert "w" in quantize_params_int8(params, min_size=256)["tok_emb"]

    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, 128)
    ref_logits, _, _ = qwen3.apply(params, cfg, ids)
    q_logits, _, _ = qwen3.apply(params_q, cfg, ids)
    err = float(jnp.max(jnp.abs(ref_logits - q_logits)))
    scale_ref = float(jnp.max(jnp.abs(ref_logits)))
    assert err < 0.15 * scale_ref, (err, scale_ref)

    from llm_quest_tpu.inference import generate as gen

    out = gen.generate_kv_cache(
        qwen3, params_q, cfg, ids, max_gen=8, temp=0.0, eos_ids=-1, pad_id=0
    )
    assert out["sequences"].shape == (2, 14)
