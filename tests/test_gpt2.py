"""GPT-2 model tests: shapes, cache-vs-no-cache equivalence, padding,
last_token_only, early-fusion entry."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from llm_quest_tpu.models import gpt2

TINY_CFG = {
    "vocab_size": 97,
    "context_length": 32,
    "emb_dim": 16,
    "n_heads": 2,
    "n_layers": 2,
    "drop_rate": 0.0,
    "qkv_bias": True,
}


def _params():
    return gpt2.init(jax.random.PRNGKey(0), TINY_CFG)


class TestGPT2:
    def test_forward_shape(self):
        params = _params()
        ids = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 8]])
        logits, cache, aux = gpt2.apply(params, TINY_CFG, ids)
        assert logits.shape == (2, 4, TINY_CFG["vocab_size"])
        assert cache is None

    def test_causality(self):
        """Changing a future token must not change past logits."""
        params = _params()
        ids_a = jnp.asarray([[1, 2, 3, 4]])
        ids_b = jnp.asarray([[1, 2, 3, 90]])
        la, _, _ = gpt2.apply(params, TINY_CFG, ids_a)
        lb, _, _ = gpt2.apply(params, TINY_CFG, ids_b)
        np.testing.assert_allclose(np.asarray(la[0, :3]), np.asarray(lb[0, :3]), atol=1e-5)

    @pytest.mark.slow
    def test_cache_matches_full_forward(self):
        """Prefill + per-token cached decode logits == uncached full forward
        (the reference's cache-vs-no-cache oracle, qwen3_generate.py:13-16)."""
        params = _params()
        ids = jnp.asarray([[3, 14, 15, 92, 65, 35]])
        full_logits, _, _ = gpt2.apply(params, TINY_CFG, ids)

        cache = gpt2.init_cache(TINY_CFG, batch=1, max_len=16)
        prefill_logits, cache, _ = gpt2.apply(params, TINY_CFG, ids[:, :3], cache=cache)
        np.testing.assert_allclose(
            np.asarray(prefill_logits), np.asarray(full_logits[:, :3]), atol=1e-4
        )
        step_logits = []
        for t in range(3, 6):
            lg, cache, _ = gpt2.apply(params, TINY_CFG, ids[:, t : t + 1], cache=cache)
            step_logits.append(np.asarray(lg[:, 0]))
        np.testing.assert_allclose(
            np.stack(step_logits, axis=1), np.asarray(full_logits[:, 3:]), atol=1e-4
        )

    def test_last_token_only_skips_padding(self):
        params = _params()
        ids = jnp.asarray([[1, 2, 3, 0], [4, 5, 0, 0]])
        mask = jnp.asarray([[True, True, True, False], [True, True, False, False]])
        full, _, _ = gpt2.apply(params, TINY_CFG, ids, attn_mask=mask)
        last, _, _ = gpt2.apply(params, TINY_CFG, ids, attn_mask=mask, last_token_only=True)
        np.testing.assert_allclose(np.asarray(last[0]), np.asarray(full[0, 2]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(last[1]), np.asarray(full[1, 1]), atol=1e-5)

    def test_padding_does_not_leak(self):
        """Logits of real tokens are unchanged by what sits in padded slots."""
        params = _params()
        mask = jnp.asarray([[True, True, False, False]])
        la, _, _ = gpt2.apply(params, TINY_CFG, jnp.asarray([[7, 8, 0, 0]]), attn_mask=mask)
        lb, _, _ = gpt2.apply(params, TINY_CFG, jnp.asarray([[7, 8, 55, 66]]), attn_mask=mask)
        np.testing.assert_allclose(np.asarray(la[0, :2]), np.asarray(lb[0, :2]), atol=1e-5)

    def test_input_embedded_entry(self):
        params = _params()
        emb = jnp.asarray(np.random.default_rng(0).normal(size=(1, 5, 16)).astype(np.float32))
        logits, _, _ = gpt2.apply(params, TINY_CFG, emb, input_embedded=True)
        assert logits.shape == (1, 5, TINY_CFG["vocab_size"])

    def test_jit_decode_step(self):
        """The cached decode step must be jittable with static shapes."""
        params = _params()
        cache = gpt2.init_cache(TINY_CFG, batch=1, max_len=8)

        @jax.jit
        def step(params, cache, tok):
            return gpt2.apply(params, TINY_CFG, tok, cache=cache)

        _, cache, _ = step(params, cache, jnp.asarray([[1]]))
        logits, cache, _ = step(params, cache, jnp.asarray([[2]]))
        assert logits.shape == (1, 1, TINY_CFG["vocab_size"])
        assert int(cache["pos"]) == 2
