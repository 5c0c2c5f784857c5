"""Unit tests for core ops: norms, activations, RoPE, masks, sampling.

Oracles are independent re-derivations (numpy/torch formulas written here),
not imports of the reference code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_quest_tpu.ops import rope
from llm_quest_tpu.ops.activations import gelu_erf, gelu_tanh, silu, softcap
from llm_quest_tpu.ops.masks import causal_mask, swa_causal_mask_table
from llm_quest_tpu.ops.norms import (
    init_layer_norm,
    init_rms_norm,
    l2_norm,
    layer_norm,
    rms_norm,
)
from llm_quest_tpu.ops.sampling import min_p_filter, sampling, top_k_filter, top_p_filter


class TestNorms:
    def test_layer_norm_matches_std_eps_formula(self):
        x = np.random.default_rng(0).normal(size=(2, 5, 16)).astype(np.float32)
        params = init_layer_norm(16)
        got = layer_norm(params, jnp.asarray(x))
        mean = x.mean(-1, keepdims=True)
        std = x.std(-1, keepdims=True)  # biased
        want = (x - mean) / (std + 1e-5)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)

    def test_rms_norm(self):
        x = np.random.default_rng(1).normal(size=(2, 3, 8)).astype(np.float32)
        params = init_rms_norm(8)
        got = rms_norm(params, jnp.asarray(x), eps=1e-5)
        want = x / np.sqrt((x**2).mean(-1, keepdims=True) + 1e-5)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)

    def test_l2_norm_unit(self):
        x = jnp.asarray(np.random.default_rng(2).normal(size=(4, 8)).astype(np.float32)) * 3
        normed = l2_norm(x)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(normed), axis=-1), 1.0, atol=1e-4)


class TestActivations:
    def test_gelu_erf_against_scipy_formula(self):
        from math import erf

        x = np.linspace(-3, 3, 13).astype(np.float32)
        got = np.asarray(gelu_erf(jnp.asarray(x)))
        want = np.array([v * 0.5 * (1 + erf(v / np.sqrt(2))) for v in x], dtype=np.float32)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_gelu_tanh_close_to_erf(self):
        x = jnp.linspace(-3, 3, 50)
        assert float(jnp.max(jnp.abs(gelu_erf(x) - gelu_tanh(x)))) < 0.01

    def test_silu(self):
        x = np.float32(1.5)
        assert abs(float(silu(jnp.asarray(x))) - 1.5 / (1 + np.exp(-1.5))) < 1e-6

    def test_softcap_bounds(self):
        x = jnp.asarray([-1e4, 0.0, 1e4])
        y = softcap(x, 30.0)
        assert float(y[0]) == pytest.approx(-30.0, abs=1e-3)
        assert float(y[2]) == pytest.approx(30.0, abs=1e-3)


class TestRoPE:
    def test_rotation_preserves_norm(self):
        cos, sin = rope.compute_angles(10_000, 8, 16)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 2, 16, 8)).astype(np.float32))
        roped = rope.apply(x, cos, sin)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(roped), axis=-1),
            np.linalg.norm(np.asarray(x), axis=-1),
            rtol=1e-5,
        )

    def test_position_zero_is_identity(self):
        cos, sin = rope.compute_angles(10_000, 8, 16)
        x = jnp.ones((1, 1, 1, 8))
        roped = rope.apply(x, cos, sin)
        np.testing.assert_allclose(np.asarray(roped), np.asarray(x), atol=1e-6)

    def test_relative_property(self):
        """<q_m, k_n> after RoPE depends only on m - n."""
        head_dim, ctx = 8, 32
        cos, sin = rope.compute_angles(10_000, head_dim, ctx)
        rng = np.random.default_rng(3)
        q = jnp.asarray(rng.normal(size=(1, 1, 1, head_dim)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(1, 1, 1, head_dim)).astype(np.float32))

        def dot_at(m, n):
            qm = rope.apply(q, cos, sin, position_ids=jnp.asarray([[m]]))
            kn = rope.apply(k, cos, sin, position_ids=jnp.asarray([[n]]))
            return float(jnp.sum(qm * kn))

        assert dot_at(5, 3) == pytest.approx(dot_at(12, 10), abs=1e-4)
        assert dot_at(5, 3) != pytest.approx(dot_at(5, 4), abs=1e-4)

    def test_partial_rotation_passthrough(self):
        cos, sin = rope.compute_angles(10_000, 8, 16, rotation_factor=0.5)
        assert cos.shape == (16, 4)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 1, 4, 8)).astype(np.float32))
        roped = rope.apply(x, cos, sin)
        np.testing.assert_allclose(np.asarray(roped[..., 4:]), np.asarray(x[..., 4:]))

    def test_yarn_scaling_bands(self):
        """Low-frequency thetas get divided by factor, high-frequency untouched."""
        head_dim = 64
        freq_cfg = {"factor": 32.0, "alpha": 1.0, "beta": 32.0, "og_ctx_len": 4096, "ctx_len": 8192}
        base = 10_000
        scaled = rope.wavelength_scaling(base, head_dim, freq_cfg, ntk_aware=False)
        i = np.arange(head_dim // 2, dtype=np.float32)
        plain = 1.0 / base ** (2 * i / head_dim)
        ratio = freq_cfg["og_ctx_len"] / (2 * np.pi / plain)
        high = ratio > freq_cfg["beta"]
        low = ratio < freq_cfg["alpha"]
        np.testing.assert_allclose(scaled[high], plain[high], rtol=1e-6)
        np.testing.assert_allclose(scaled[low], plain[low] / freq_cfg["factor"], rtol=1e-6)

    def test_mrope_text_only_equals_rope(self):
        """T=H=W position ids through MRoPE == standard RoPE with those ids
        (reference behavior: rope.py:309-311)."""
        head_dim, ctx, s, b = 12, 10, 4, 2
        mrope_section = [2, 2, 2]
        cos, sin = rope.compute_angles(10_000, head_dim, ctx)
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(b, 2, s, head_dim)).astype(np.float32))
        pos = jnp.asarray(rng.integers(0, ctx, size=(b, s)))
        pos3 = jnp.stack([pos, pos, pos])
        got = rope.apply_mrope(x, cos, sin, pos3, mrope_section)
        want = rope.apply(x, cos, sin, position_ids=pos)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_vision_rope_2d_shapes_and_axes(self):
        cos, sin = rope.compute_angles_2d(10_000, 8, 2, 3)
        assert cos.shape == (6, 8)
        # patches in the same row share y-angles (first half of half_dim)
        np.testing.assert_allclose(np.asarray(cos[0, :2]), np.asarray(cos[1, :2]))
        # patches in the same column share x-angles
        np.testing.assert_allclose(np.asarray(cos[0, 2:4]), np.asarray(cos[3, 2:4]))


class TestMasks:
    def test_causal_no_cache(self):
        m = causal_mask(4)
        want = np.triu(np.ones((4, 4), dtype=bool), k=1)[None, None]
        np.testing.assert_array_equal(np.asarray(m), want)

    def test_causal_with_cache_offset(self):
        # 1 query at absolute position 3, cache of 8 slots
        m = causal_mask(1, 8, q_start=3)
        want = np.array([[[[False, False, False, False, True, True, True, True]]]])
        np.testing.assert_array_equal(np.asarray(m), want)

    def test_swa_table_matches_iota_builder(self):
        table = np.asarray(swa_causal_mask_table(8, 3))
        live = np.asarray(causal_mask(8, 8, window_size=3))[0, 0]
        np.testing.assert_array_equal(live, table)

    def test_padding_combination(self):
        attn = jnp.asarray([[True, True, False]])
        m = causal_mask(3, attn_mask=attn)
        assert bool(m[0, 0, 2, 2])  # padded key masked even on diagonal


class TestSampling:
    def test_greedy(self):
        logits = jnp.asarray([[0.1, 2.0, -1.0], [3.0, 0.0, 0.5]])
        ids = sampling(None, logits, temp=0.0)
        np.testing.assert_array_equal(np.asarray(ids), [1, 0])

    def test_top_k_keeps_k(self):
        probs = jnp.asarray([[0.4, 0.3, 0.2, 0.1]])
        out = np.asarray(top_k_filter(probs, 2))
        assert (out > 0).sum() == 2
        np.testing.assert_allclose(out[0, :2], [0.4, 0.3])

    def test_top_p_pivot_shift(self):
        # cum: .4, .7, .9, 1.0 with p=.6 → keep .4 and the pivot .3
        probs = jnp.asarray([[0.4, 0.3, 0.2, 0.1]])
        out = np.asarray(top_p_filter(probs, 0.6))
        np.testing.assert_allclose(out[0], [0.4, 0.3, 0.0, 0.0])

    def test_min_p(self):
        probs = jnp.asarray([[0.5, 0.3, 0.15, 0.05]])
        out = np.asarray(min_p_filter(probs, 0.5))  # threshold 0.25
        np.testing.assert_allclose(out[0], [0.5, 0.3, 0.0, 0.0])

    def test_min_p_min_tokens_to_keep(self):
        probs = jnp.asarray([[0.9, 0.06, 0.04]])
        out = np.asarray(min_p_filter(probs, 0.5, min_tokens_to_keep=2))
        assert (out > 0).sum() == 2

    def test_stochastic_sampling_distribution(self):
        rng = jax.random.PRNGKey(0)
        logits = jnp.log(jnp.asarray([[0.7, 0.2, 0.1]]))
        keys = jax.random.split(rng, 512)
        draws = jax.vmap(lambda k: sampling(k, logits, temp=1.0))(keys)
        freq0 = float(jnp.mean((draws == 0).astype(jnp.float32)))
        assert 0.6 < freq0 < 0.8

    def test_top_p_and_top_k_compose(self):
        probs = jnp.asarray([[0.4, 0.3, 0.2, 0.1]])
        out = np.asarray(top_p_filter(probs, 0.99, top_k=2))
        assert (out > 0).sum() == 2


def test_rope_apply_packed_matches_apply():
    """Packed-layout RoPE (b, s, h, d) == transposed apply on (b, h, s, d)."""
    import jax
    import jax.numpy as jnp

    from llm_quest_tpu.ops import rope

    b, h, s, d = 2, 3, 10, 16
    cos, sin = rope.compute_angles(10_000, d, 32)
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, s, d))
    ref = rope.apply(x, cos, sin)
    packed = rope.apply_packed(x.transpose(0, 2, 1, 3), cos, sin).transpose(0, 2, 1, 3)
    assert float(jnp.max(jnp.abs(ref - packed))) < 1e-6

    # partial rotation passes the tail features through unchanged
    cos_p, sin_p = rope.compute_angles(10_000, d // 2, 32)
    ref_p = rope.apply(x, cos_p, sin_p)
    packed_p = rope.apply_packed(x.transpose(0, 2, 1, 3), cos_p, sin_p).transpose(0, 2, 1, 3)
    assert float(jnp.max(jnp.abs(ref_p - packed_p))) < 1e-6


def test_mha_packed_fallback_matches_sdpa():
    """On non-TPU backends mha_packed must fall back to split-heads sdpa."""
    import jax
    import jax.numpy as jnp

    from llm_quest_tpu.ops.attention import merge_heads, mha_packed, sdpa, split_heads

    b, s, h, d = 2, 33, 4, 16  # hd=64 not 128-divisible → fallback everywhere
    q, k, v = (jax.random.normal(kk, (b, s, h * d)) for kk in jax.random.split(jax.random.PRNGKey(1), 3))
    out = mha_packed(q, k, v, h)
    ref = merge_heads(sdpa(split_heads(q, h), split_heads(k, h), split_heads(v, h)))
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-6


def test_sampling_per_row_matches_scalar_and_mixes():
    """sampling_per_row with UNIFORM rows draws bit-identical tokens to the
    scalar sampler for every knob combo (same categorical call); with mixed
    rows, temp=0 and top_k=1 rows are deterministic argmax."""
    from llm_quest_tpu.ops.sampling import sampling_per_row

    rng = jax.random.PRNGKey(0)
    logits = jax.random.normal(jax.random.PRNGKey(1), (6, 50)) * 3

    def rows(temp=0.0, top_k=0, top_p=2.0, min_p=0.0, b=6):
        return dict(
            temp=jnp.full((b,), temp, jnp.float32),
            top_k=jnp.full((b,), top_k, jnp.int32),
            top_p=jnp.full((b,), top_p, jnp.float32),
            min_p=jnp.full((b,), min_p, jnp.float32),
        )

    combos = [
        dict(temp=0.0), dict(temp=0.7), dict(temp=0.7, top_k=5),
        dict(temp=1.1, top_p=0.8), dict(temp=1.1, top_k=8, top_p=0.8),
        dict(temp=0.9, min_p=0.2), dict(temp=0.9, min_p=0.2, top_k=4),
    ]
    for kw in combos:
        scalar = sampling(
            rng, logits, temp=kw.get("temp", 0.0),
            top_k=kw.get("top_k"), top_p=kw.get("top_p"), min_p=kw.get("min_p"),
        )
        perrow = sampling_per_row(rng, logits, **rows(**kw))
        assert (np.asarray(scalar) == np.asarray(perrow)).all(), kw

    mix = rows()
    mix["temp"] = jnp.asarray([0.0, 0.8, 0.0, 1.2, 0.8, 0.0])
    mix["top_k"] = jnp.asarray([0, 1, 0, 0, 20, 0], jnp.int32)
    out = np.asarray(sampling_per_row(rng, logits, **mix))
    am = np.asarray(jnp.argmax(logits, axis=-1))
    assert out[0] == am[0] and out[2] == am[2] and out[5] == am[5]
    assert out[1] == am[1]  # top_k=1 keeps only the argmax


def test_greedy_argmax_matches_jnp_argmax_with_ties():
    from llm_quest_tpu.ops.sampling import greedy_argmax

    rng = np.random.default_rng(0)
    # non-multiple-of-128 vocab exercises the pad path; planted ties check
    # first-occurrence semantics (group and lane level)
    x = rng.normal(size=(5, 1003)).astype(np.float32)
    x[0, 7] = x[0, 900] = 50.0       # cross-group tie -> first group wins
    x[1, 130] = x[1, 131] = 50.0     # in-group tie -> first lane wins
    x[2, 1002] = 99.0                # last (padded-edge) column
    got = greedy_argmax(jnp.asarray(x))
    ref = jnp.argmax(jnp.asarray(x), axis=-1).astype(jnp.int32)
    assert jnp.array_equal(got, ref)

    x3 = jnp.asarray(rng.normal(size=(2, 3, 515)).astype(np.float32))  # (b, γ, v)
    assert jnp.array_equal(greedy_argmax(x3), jnp.argmax(x3, axis=-1).astype(jnp.int32))

    xb = jnp.asarray(rng.normal(size=(4, 384)), jnp.bfloat16)
    assert jnp.array_equal(greedy_argmax(xb), jnp.argmax(xb, axis=-1).astype(jnp.int32))


def test_filter_probs_per_row_head_matches_full_sort():
    """The head-based per-row filter == the exact full-sort scalar filter
    whenever the nucleus/top-k fits inside the head (per-config check on
    peaked distributions), and the nucleus-exceeds-head fallback keeps
    everything."""
    from llm_quest_tpu.ops.sampling import filter_probs, filter_probs_per_row

    rng = np.random.default_rng(5)
    v, b = 2000, 3
    # peaked: nucleus well inside a 64-wide head
    logits = jnp.asarray(rng.normal(size=(b, v)) * 4.0, jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)

    cases = [
        dict(top_k=40, top_p=1.0, min_p=0.0),
        dict(top_k=0, top_p=0.9, min_p=0.0),
        dict(top_k=20, top_p=0.85, min_p=0.0),
        dict(top_k=5, top_p=1.0, min_p=0.05),  # top_k -> min_tokens_to_keep
    ]
    for kw in cases:
        rows = {k: jnp.full((b,), kw[k], jnp.float32) for k in kw}
        got = filter_probs_per_row(probs, head=64, **rows)
        ref = filter_probs(
            probs,
            top_k=kw["top_k"] or None,
            top_p=kw["top_p"] if kw["top_p"] < 1 else None,
            min_p=kw["min_p"] or None,
        )
        assert float(jnp.abs(got - ref).max()) < 1e-6, kw

    # near-uniform + tiny head -> nucleus exceeds head mass -> keep-all
    flat = jnp.full((1, v), 1.0 / v, jnp.float32)
    got = filter_probs_per_row(
        flat, top_k=jnp.zeros((1,)), top_p=jnp.full((1,), 0.9), head=64
    )
    assert float(jnp.abs(got - flat).max()) < 1e-7
