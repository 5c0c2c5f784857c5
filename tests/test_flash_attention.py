"""Flash-attention Pallas kernels vs XLA sdpa oracle (interpret mode on CPU).

Forward parity across every feature flag, plus full gradient parity through
the custom_vjp backward kernels (dq/dk/dv/dsink).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_quest_tpu.kernels.flash_attention import flash_attention
from llm_quest_tpu.ops.attention import sdpa
from llm_quest_tpu.ops.masks import causal_mask

INTERPRET = jax.default_backend() != "tpu"
FLASH_KW = dict(interpret=INTERPRET, block_q=128, block_k=128)

# interpret mode computes exact fp32; the real chip executes fp32 matmuls at
# bf16-input precision by default, so kernel-vs-XLA diffs land around 1e-3
TOL = 2e-5 if INTERPRET else 1e-2
GRAD_TOL = 5e-5 if INTERPRET else 2e-2


@pytest.fixture(scope="module")
def qkv():
    b, hq, hkv, s, d = 2, 4, 2, 200, 64  # non-multiple-of-block seq, GQA
    q = jax.random.normal(jax.random.PRNGKey(0), (b, hq, s, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, hkv, s, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, hkv, s, d))
    return q, k, v


def test_causal(qkv):
    q, k, v = qkv
    s = q.shape[2]
    ref = sdpa(q, k, v, mask=causal_mask(s))
    out = flash_attention(q, k, v, causal=True, **FLASH_KW)
    assert float(jnp.abs(ref - out).max()) < TOL


def test_padding_mask(qkv):
    q, k, v = qkv
    s = q.shape[2]
    pad = jnp.asarray(np.random.default_rng(0).random((2, s)) > 0.2)
    ref = sdpa(q, k, v, mask=causal_mask(s, attn_mask=pad))
    out = flash_attention(q, k, v, attn_mask=pad, causal=True, **FLASH_KW)
    assert float(jnp.abs(ref - out).max()) < TOL


def test_sliding_window(qkv):
    q, k, v = qkv
    s = q.shape[2]
    ref = sdpa(q, k, v, mask=causal_mask(s, window_size=32))
    out = flash_attention(q, k, v, causal=True, window_size=32, **FLASH_KW)
    assert float(jnp.abs(ref - out).max()) < TOL


def test_bidirectional_and_softcap(qkv):
    q, k, v = qkv
    ref = sdpa(q, k, v)
    out = flash_attention(q, k, v, causal=False, **FLASH_KW)
    assert float(jnp.abs(ref - out).max()) < TOL

    s = q.shape[2]
    ref_cap = sdpa(q, k, v, mask=causal_mask(s), softcap=30.0)
    out_cap = flash_attention(q, k, v, causal=True, softcap=30.0, **FLASH_KW)
    assert float(jnp.abs(ref_cap - out_cap).max()) < TOL


def test_sink(qkv):
    """MiMo-V2 attention sinks: extra softmax mass, no value contribution."""
    q, k, v = qkv
    s = q.shape[2]
    sink = jax.random.normal(jax.random.PRNGKey(3), (q.shape[1],))
    ref = sdpa(q, k, v, mask=causal_mask(s), sink=sink)
    out = flash_attention(q, k, v, sink=sink, causal=True, **FLASH_KW)
    assert float(jnp.abs(ref - out).max()) < TOL


def test_mla_value_dim():
    """dv != d (DeepSeek MLA) and non-lane-multiple head dims."""
    b, h, s, d, dv = 1, 2, 130, 48, 40
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, s, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, s, dv))
    ref = sdpa(q, k, v, mask=causal_mask(s))
    out = flash_attention(q, k, v, causal=True, **FLASH_KW)
    assert float(jnp.abs(ref - out).max()) < TOL


def test_small_sequence_blocks():
    """Sequence smaller than the default block size."""
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 17, 32))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 17, 32))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 17, 32))
    ref = sdpa(q, k, v, mask=causal_mask(17))
    out = flash_attention(q, k, v, causal=True, interpret=INTERPRET)
    assert float(jnp.abs(ref - out).max()) < TOL


def _grads(fn, *args):
    loss = lambda *a: jnp.sum(jnp.sin(fn(*a)))  # nontrivial cotangent
    return jax.grad(loss, argnums=tuple(range(len(args))))(*args)


def test_backward_causal_gqa(qkv):
    q, k, v = qkv
    s = q.shape[2]
    ref_dq, ref_dk, ref_dv = _grads(lambda q, k, v: sdpa(q, k, v, mask=causal_mask(s)), q, k, v)
    dq, dk, dv = _grads(lambda q, k, v: flash_attention(q, k, v, causal=True, **FLASH_KW), q, k, v)
    for a, b_, name in ((ref_dq, dq, "dq"), (ref_dk, dk, "dk"), (ref_dv, dv, "dv")):
        assert float(jnp.abs(a - b_).max()) < GRAD_TOL, (name, float(jnp.abs(a - b_).max()))


def test_backward_window_softcap_padding(qkv):
    q, k, v = qkv
    s = q.shape[2]
    pad = jnp.asarray(np.random.default_rng(1).random((2, s)) > 0.2)

    def ref_fn(q, k, v):
        return sdpa(q, k, v, mask=causal_mask(s, window_size=64, attn_mask=pad), softcap=20.0)

    def flash_fn(q, k, v):
        return flash_attention(q, k, v, attn_mask=pad, causal=True, window_size=64,
                               softcap=20.0, **FLASH_KW)

    refs = _grads(ref_fn, q, k, v)
    outs = _grads(flash_fn, q, k, v)
    for a, b_, name in zip(refs, outs, ("dq", "dk", "dv")):
        assert float(jnp.abs(a - b_).max()) < GRAD_TOL, (name, float(jnp.abs(a - b_).max()))


def test_backward_sink(qkv):
    q, k, v = qkv
    s = q.shape[2]
    sink = jax.random.normal(jax.random.PRNGKey(3), (q.shape[1],))

    refs = _grads(lambda q, k, v, si: sdpa(q, k, v, mask=causal_mask(s), sink=si), q, k, v, sink)
    outs = _grads(lambda q, k, v, si: flash_attention(q, k, v, sink=si, causal=True, **FLASH_KW),
                  q, k, v, sink)
    for a, b_, name in zip(refs, outs, ("dq", "dk", "dv", "dsink")):
        assert float(jnp.abs(a - b_).max()) < GRAD_TOL, (name, float(jnp.abs(a - b_).max()))


@pytest.mark.slow
def test_models_use_flash_parity():
    """cfg["use_flash"] routes model attention through the kernel: logits must
    match the sdpa path for a causal model, an SWA+softcap model, and a
    sink+window model."""
    from llm_quest_tpu.models import gemma3, mimo_v2_flash, qwen3

    s = 320  # above the flash_min_seq threshold
    ids = jax.random.randint(jax.random.PRNGKey(9), (2, s), 0, 64)

    qcfg = {"model_type": "dense", "vocab_size": 64, "context_length": 512, "emb_dim": 32,
            "n_layers": 2, "n_heads": 4, "num_kv_groups": 2, "head_dim": 8, "hidden_dim": 64,
            "rope_base": 10_000, "tie_embeddings": True, "dtype": jnp.float32}
    params = qwen3.init(jax.random.PRNGKey(0), qcfg)
    ref, _, _ = qwen3.apply(params, qcfg, ids)
    out, _, _ = qwen3.apply(params, dict(qcfg, use_flash=True), ids)
    assert float(jnp.abs(ref - out).max()) < 1e-4

    gcfg = {"vocab_size": 64, "context_length": 512, "emb_dim": 32, "n_layers": 2,
            "n_heads": 4, "num_kv_groups": 2, "hidden_dim": 64, "window_size": 48,
            "local_global_att_ratio": 1, "rope_base": 10_000, "dtype": jnp.float32}
    gparams = gemma3.init(jax.random.PRNGKey(1), gcfg)
    gref, _, _ = gemma3.apply(gparams, gcfg, ids)
    gout, _, _ = gemma3.apply(gparams, dict(gcfg, use_flash=True), ids)
    assert float(jnp.abs(gref - gout).max()) < 1e-4

    mcfg = {"vocab_size": 64, "context_length": 512, "emb_dim": 32, "n_layers": 2,
            "n_heads": 4, "num_swa_kv_groups": 4, "num_ga_kv_groups": 2, "head_dim": 12,
            "value_head_dim": 8, "hidden_dim": 64, "window_size": 48, "hybrid_ratio": 2,
            "rope_base": 10_000, "rope_base_ga": 640_000, "partial_rope_factor": 0.33,
            "mtp_depth": 0, "mtp_loss_coeff": 0.0, "num_experts": 4, "top_k": 2,
            "num_shared_experts": 0, "moe_scaling_factor": 1, "moe_bias_update_rate": 1e-3,
            "dtype": jnp.float32}
    mparams = mimo_v2_flash.init(jax.random.PRNGKey(2), mcfg)
    mref, _, _ = mimo_v2_flash.apply(mparams, mcfg, ids)
    mout, _, _ = mimo_v2_flash.apply(mparams, dict(mcfg, use_flash=True), ids)
    assert float(jnp.abs(mref - mout).max()) < 1e-4


@pytest.mark.slow
def test_use_flash_training_grads():
    """Training-step gradients flow through the flash custom_vjp path."""
    from llm_quest_tpu.models import qwen3
    from llm_quest_tpu.training.engine import global_loss

    s = 320
    cfg = {"model_type": "dense", "vocab_size": 64, "context_length": 512, "emb_dim": 32,
           "n_layers": 2, "n_heads": 4, "num_kv_groups": 2, "head_dim": 8, "hidden_dim": 64,
           "rope_base": 10_000, "tie_embeddings": True, "dtype": jnp.float32}
    params = qwen3.init(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(9), (2, s), 0, 64)
    tgt = jax.random.randint(jax.random.PRNGKey(10), (2, s), 0, 64)

    def loss_fn(params, cfg):
        logits, _, aux = qwen3.apply(params, cfg, ids)
        return global_loss(logits, tgt, aux)

    ref_g = jax.grad(loss_fn)(params, cfg)
    out_g = jax.grad(loss_fn)(params, dict(cfg, use_flash=True))
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), ref_g, out_g)
    assert max(jax.tree.leaves(diffs)) < 1e-4, diffs


def test_fused_mha_short_seq():
    """Fused short-sequence MHA kernel vs sdpa oracle."""
    from llm_quest_tpu.kernels.fused_mha import fused_mha

    b, h, s, d = 2, 4, 197, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, s, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, s, d))
    assert float(jnp.abs(sdpa(q, k, v) - fused_mha(q, k, v, interpret=INTERPRET)).max()) < TOL
    ref_c = sdpa(q, k, v, mask=causal_mask(s))
    assert float(jnp.abs(ref_c - fused_mha(q, k, v, causal=True, interpret=INTERPRET)).max()) < TOL


@pytest.mark.parametrize("b,s,h,d", [(2, 197, 12, 64), (2, 65, 8, 32)])
def test_packed_mha_matches_sdpa(b, s, h, d):
    """Transpose-free packed-layout kernel vs split-heads sdpa (fp32 exact);
    covers ViT-B (d=64) and TinyViT (d=32, 4 heads per 128-lane slab)."""
    from llm_quest_tpu.kernels.fused_mha import packed_mha
    from llm_quest_tpu.ops.attention import merge_heads, split_heads

    q, k, v = (jax.random.normal(kk, (b, s, h * d), jnp.float32)
               for kk in jax.random.split(jax.random.PRNGKey(5), 3))
    ref = merge_heads(sdpa(split_heads(q, h), split_heads(k, h), split_heads(v, h)))
    out = packed_mha(q, k, v, h, None, INTERPRET)
    assert float(jnp.abs(ref - out).max()) < TOL

    # gradients flow through the recompute custom_vjp
    g1 = jax.grad(lambda q: jnp.sum(jnp.sin(packed_mha(q, k, v, h, None, INTERPRET))))(q)
    g2 = jax.grad(lambda q: jnp.sum(jnp.sin(merge_heads(sdpa(split_heads(q, h), split_heads(k, h), split_heads(v, h))))))(q)
    assert float(jnp.abs(g1 - g2).max()) < TOL


def test_cached_prefill_sq_lt_sk():
    """Prefill into a pre-allocated max_len cache: sq < sk with a static
    q_start offset — queries at absolute positions [q_start, q_start+sq)
    against a key buffer valid in [0, q_start+sq) (tail is garbage and must
    be causally excluded)."""
    b, h, sq, max_len, d = 2, 4, 150, 384, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, sq, d))
    k_full = jax.random.normal(jax.random.PRNGKey(1), (b, h, max_len, d))
    v_full = jax.random.normal(jax.random.PRNGKey(2), (b, h, max_len, d))

    for q_start in (0, 100):
        # garbage beyond the filled region must not leak
        filled = q_start + sq
        k = k_full.at[:, :, filled:].set(1e3)
        v = v_full.at[:, :, filled:].set(1e3)
        ref = sdpa(q, k, v, mask=causal_mask(sq, max_len, q_start=q_start))
        out = flash_attention(q, k, v, causal=True, q_start=q_start, **FLASH_KW)
        assert float(jnp.abs(ref - out).max()) < TOL, q_start


def test_cached_prefill_with_padding_mask_and_grads():
    """Left-pad prompts: the (b, sk) validity mask composes with the q_start
    causal offset; gradients flow through the sq<sk backward kernels."""
    b, h, sq, max_len, d = 2, 2, 130, 256, 64
    q = jax.random.normal(jax.random.PRNGKey(3), (b, h, sq, d))
    k = jax.random.normal(jax.random.PRNGKey(4), (b, h, max_len, d))
    v = jax.random.normal(jax.random.PRNGKey(5), (b, h, max_len, d))
    pad = jnp.asarray(np.random.default_rng(1).random((b, max_len)) > 0.2)

    ref = sdpa(q, k, v, mask=causal_mask(sq, max_len, q_start=16, attn_mask=pad))
    out = flash_attention(q, k, v, causal=True, q_start=16, attn_mask=pad, **FLASH_KW)
    assert float(jnp.abs(ref - out).max()) < TOL

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(flash_attention(q, k, v, causal=True, q_start=16,
                                               attn_mask=pad, **FLASH_KW)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(sdpa(q, k, v, mask=causal_mask(sq, max_len, q_start=16, attn_mask=pad))))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        assert float(jnp.abs(a - b_).max()) < GRAD_TOL


def test_model_level_flash_prefill_token_parity():
    """qwen3 whole-generation decode with flash prefill (sq < max_len) emits
    the same greedy tokens as the sdpa-prefill path."""
    from llm_quest_tpu.inference import generate as gen
    from llm_quest_tpu.models import qwen3

    base = {
        "model_type": "dense", "vocab_size": 128, "context_length": 512, "emb_dim": 32,
        "n_layers": 2, "n_heads": 4, "num_kv_groups": 2, "head_dim": 8, "hidden_dim": 64,
        "rope_base": 10_000, "tie_embeddings": True, "dtype": jnp.float32,
    }
    params = qwen3.init(jax.random.PRNGKey(0), base)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 300), 0, 128)
    mask = jnp.ones((2, 300), bool)

    cfg_sdpa = dict(base, use_flash=False)
    cfg_flash = dict(base, use_flash=True, flash_min_seq=64)
    ref = gen.generate_batched_kv_cache(qwen3, params, cfg_sdpa, prompt, mask,
                                        max_gen=8, temp=0.0, eos_ids=-1, pad_id=0)
    out = gen.generate_batched_kv_cache(qwen3, params, cfg_flash, prompt, mask,
                                        max_gen=8, temp=0.0, eos_ids=-1, pad_id=0)
    assert ref["sequences"].tolist() == out["sequences"].tolist()


def test_packed_mha_int8_scores():
    """Int8-score packed MHA: output within quantization tolerance of the
    fp32 sdpa oracle, and gradients (straight-through) flow."""
    from llm_quest_tpu.kernels.fused_mha import packed_mha_int8
    from llm_quest_tpu.ops.attention import merge_heads, sdpa, split_heads

    b, s, h, d = 2, 197, 4, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (b, s, h * d)) * 0.7
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s, h * d)) * 0.7
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, h * d))

    ref = merge_heads(sdpa(split_heads(q, h), split_heads(k, h), split_heads(v, h)))
    out = packed_mha_int8(q, k, v, h, None, INTERPRET)
    err = float(jnp.abs(ref - out).max())
    assert err < 0.05, err  # int8 quantization budget, not bf16 ulp

    g = jax.grad(lambda q: jnp.sum(jnp.sin(packed_mha_int8(q, k, v, h, None, INTERPRET))))(q)
    assert bool(jnp.all(jnp.isfinite(g))) and float(jnp.abs(g).max()) > 0


def test_packed_mha_int8_static_scales_and_calibration():
    """Static (calibrated) scales: parity with the dynamic-quant path, and
    the ViT calibration helper produces per-layer scales of the right shape."""
    from llm_quest_tpu.kernels.fused_mha import packed_mha_int8
    from llm_quest_tpu.models import vit
    from llm_quest_tpu.ops.attention import merge_heads, sdpa, split_heads

    b, s, h, d = 2, 60, 2, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (b, s, h * d)) * 0.7
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s, h * d)) * 0.7
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, h * d))

    qs = float(jnp.max(jnp.abs(q))) / 127.0
    ks = float(jnp.max(jnp.abs(k))) / 127.0
    ref = merge_heads(sdpa(split_heads(q, h), split_heads(k, h), split_heads(v, h)))
    out = packed_mha_int8(q, k, v, h, None, INTERPRET, (qs, ks))
    assert float(jnp.abs(ref - out).max()) < 0.05

    cfg = {"img_width": 32, "img_height": 32, "patch_size": 8, "emb_dim": 128, "n_heads": 2,
           "n_layers": 2, "hidden_dim": 256, "num_classes": 10, "num_channels": 3, "qkv_bias": True,
           "drop_rate": 0.0, "dtype": jnp.float32}
    params = vit.init(jax.random.PRNGKey(3), cfg)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 3, 32, 32))
    scales = vit.calibrate_int8_scales(params, cfg, x)
    assert len(scales) == 2 and all(len(p) == 2 and p[0] > 0 and p[1] > 0 for p in scales)


def test_packed_mha_int8_inkernel_matches_epilogue():
    """In-kernel-quantize variant (VMEM-local round/clip of bf16 q/k, the
    round-4 ablation kernel): bit-parity with the epilogue-quantized int8
    path at the same static scales — same int8 values enter the same dots."""
    from llm_quest_tpu.kernels.fused_mha import _packed_mha_int8_impl, packed_mha_int8_inkernel

    b, s, h, d = 2, 50, 2, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (b, s, h * d)) * 0.7
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s, h * d)) * 0.7
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, h * d))
    scales = (float(jnp.max(jnp.abs(q))) / 127.0, float(jnp.max(jnp.abs(k))) / 127.0)

    ref = _packed_mha_int8_impl(q, k, v, n_heads=h, interpret=INTERPRET, static_scales=scales)
    got = packed_mha_int8_inkernel(q, k, v, n_heads=h, static_scales=scales, interpret=INTERPRET)
    assert float(jnp.abs(ref - got).max()) == 0.0
