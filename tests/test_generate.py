"""Generation engine tests: scan-based cached decode vs uncached oracle,
batched right/left padding, EOS handling."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from llm_quest_tpu.inference import generate as gen
from llm_quest_tpu.models import gpt2

CFG = {
    "vocab_size": 61,
    "context_length": 48,
    "emb_dim": 32,
    "n_heads": 4,
    "n_layers": 2,
    "drop_rate": 0.0,
    "qkv_bias": False,
}
PAD = 59
EOS = 60


def _params():
    return gpt2.init(jax.random.PRNGKey(7), CFG)


class TestGenerate:
    @pytest.mark.slow
    def test_cached_greedy_matches_uncached(self):
        params = _params()
        prompt = jnp.asarray([[5, 9, 2, 17]])
        want = gen.generate_loop_uncached(gpt2, params, CFG, prompt, max_gen=6, temp=0.0)
        got = gen.generate_kv_cache(gpt2, params, CFG, prompt, max_gen=6, temp=0.0, eos_ids=EOS, pad_id=PAD)
        np.testing.assert_array_equal(np.asarray(got["sequences"][:, : want.shape[1]]), np.asarray(want))

    @pytest.mark.slow
    def test_right_padded_batch_matches_single(self):
        """Each right-padded row decodes exactly like its unpadded solo run."""
        params = _params()
        p1 = [5, 9, 2, 17]
        p2 = [11, 3]
        batch = jnp.asarray([p1, p2 + [PAD, PAD]])
        mask = jnp.asarray([[1, 1, 1, 1], [1, 1, 0, 0]], dtype=bool)
        out = gen.generate_batched_kv_cache(
            gpt2, params, CFG, batch, mask, max_gen=5, temp=0.0, eos_ids=EOS, pad_id=PAD
        )
        solo1 = gen.generate_kv_cache(gpt2, params, CFG, jnp.asarray([p1]), max_gen=5, temp=0.0, eos_ids=EOS, pad_id=PAD)
        np.testing.assert_array_equal(
            np.asarray(out["sequences"][0, 4:]), np.asarray(solo1["sequences"][0, 4:])
        )
        solo2 = gen.generate_kv_cache(gpt2, params, CFG, jnp.asarray([p2]), max_gen=5, temp=0.0, eos_ids=EOS, pad_id=PAD)
        np.testing.assert_array_equal(
            np.asarray(out["sequences"][1, 4:]), np.asarray(solo2["sequences"][0, 2:7])
        )

    def test_left_padded_batch_matches_single(self):
        params = _params()
        p2 = [11, 3]
        batch = jnp.asarray([[PAD, PAD] + p2])
        mask = jnp.asarray([[0, 0, 1, 1]], dtype=bool)
        out = gen.generate_batched_kv_cache(
            gpt2, params, CFG, batch, mask, max_gen=5, temp=0.0, eos_ids=EOS, pad_id=PAD, left_pad=True
        )
        solo = gen.generate_kv_cache(gpt2, params, CFG, jnp.asarray([p2]), max_gen=5, temp=0.0, eos_ids=EOS, pad_id=PAD)
        np.testing.assert_array_equal(
            np.asarray(out["sequences"][0, 4:]), np.asarray(solo["sequences"][0, 2:7])
        )

    @pytest.mark.slow
    def test_eos_finishes_row_with_pad(self):
        """Once a row emits its EOS token, only PAD follows and the mask bits
        for EOS and the pads are False (reference: generate.py:345-356)."""
        params = _params()
        prompt = jnp.asarray([[5, 9]])
        free = gen.generate_kv_cache(gpt2, params, CFG, prompt, max_gen=4, temp=0.0, eos_ids=EOS, pad_id=PAD)
        first_tok = int(free["sequences"][0, 2])  # greedy token at step 0
        out = gen.generate_kv_cache(
            gpt2, params, CFG, prompt, max_gen=4, temp=0.0, eos_ids=first_tok, pad_id=PAD
        )
        seq = np.asarray(out["sequences"][0])
        np.testing.assert_array_equal(seq[2:], [first_tok, PAD, PAD, PAD])
        assert not np.asarray(out["mask"])[0, 2:].any()

    def test_whole_generate_is_jittable(self):
        params = _params()
        f = jax.jit(
            lambda p, ids, mask: gen.generate_batched_kv_cache(
                gpt2, p, CFG, ids, mask, max_gen=4, temp=0.0, eos_ids=EOS, pad_id=PAD
            )["sequences"]
        )
        ids = jnp.asarray([[5, 9, 2, 17]])
        mask = jnp.ones((1, 4), dtype=bool)
        out = f(params, ids, mask)
        assert out.shape == (1, 8)

    @pytest.mark.slow
    def test_stochastic_rows_independent_of_batch(self):
        params = _params()
        prompt = jnp.asarray([[5, 9, 2, 17]])
        out = gen.generate_kv_cache(
            gpt2, params, CFG, prompt, max_gen=5, temp=1.0, top_k=10, rng=jax.random.PRNGKey(3),
            eos_ids=EOS, pad_id=PAD,
        )
        seq = np.asarray(out["sequences"][0])
        assert seq.shape == (9,)
        assert ((seq >= 0) & (seq < CFG["vocab_size"])).all()
