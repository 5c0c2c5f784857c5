"""Quantized grouped matmul kernel (kernels/quantized_gmm.py) vs the XLA
ragged_dot + row-indexed scale-epilogue oracle (the exact computation
ops/moe.py::_ragged runs for int8 expert stacks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_quest_tpu.kernels.quantized_gmm import quantized_ragged_dot

jax.config.update("jax_enable_x64", False)


def _oracle(x, w_q, scale, group_sizes):
    e_of_row = jnp.repeat(
        jnp.arange(len(group_sizes)), group_sizes, total_repeat_length=x.shape[0]
    )
    y = jax.lax.ragged_dot(x, w_q.astype(x.dtype), group_sizes)
    return y * scale[e_of_row].astype(y.dtype)


def _make(t, d, n, e, seed=0, dtype=jnp.float32, sizes=None):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((t, d)), dtype)
    w_q = jnp.asarray(rng.integers(-127, 128, size=(e, d, n)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.001, 0.02, size=(e, n)), jnp.float32)
    if sizes is None:
        cuts = np.sort(rng.integers(0, t + 1, size=e - 1))
        sizes = np.diff(np.concatenate([[0], cuts, [t]]))
    gs = jnp.asarray(sizes, jnp.int32)
    assert int(gs.sum()) == t
    return x, w_q, scale, gs


@pytest.mark.parametrize("sizes", [None, [0, 7, 0, 9], [16, 0, 0, 0], [1, 1, 1, 13]])
def test_qgmm_matches_ragged_oracle(sizes):
    x, w_q, scale, gs = _make(16, 64, 96, 4, seed=1, sizes=sizes)
    got = quantized_ragged_dot(x, w_q, scale, gs, tile_m=8, interpret=True)
    ref = _oracle(x, w_q, scale, gs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_qgmm_unaligned_groups_many_experts():
    # decode-shaped: 128 routed rows over 16 experts, ragged sizes
    x, w_q, scale, gs = _make(128, 128, 256, 16, seed=2)
    got = quantized_ragged_dot(x, w_q, scale, gs, tile_m=16, interpret=True)
    ref = _oracle(x, w_q, scale, gs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_qgmm_bf16_rows():
    x, w_q, scale, gs = _make(32, 64, 128, 4, seed=3, dtype=jnp.bfloat16)
    got = quantized_ragged_dot(x, w_q, scale, gs, tile_m=16, interpret=True)
    ref = _oracle(x, w_q, scale, gs)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2
    )
