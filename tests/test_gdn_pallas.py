"""Fused GDN Pallas kernel vs the chunked XLA oracle (interpret mode on CPU).

The kernel computes the same chunk algebra as ops/gdn.py::
gated_delta_rule_chunked (itself scan-oracle-tested in test_qwen3_next.py),
so parity here is tight; gradients flow through the custom_vjp recompute.
"""

import jax
import jax.numpy as jnp
import pytest

from llm_quest_tpu.kernels.gdn_pallas import gated_delta_rule_pallas
from llm_quest_tpu.ops.gdn import gated_delta_rule_auto, gated_delta_rule_chunked

INTERPRET = jax.default_backend() != "tpu"

# interpret mode is bit-exact vs the chunked oracle (identical op sequence);
# the real chip runs fp32 matmuls at bf16-input precision by default → ~1e-3
TOL = 1e-5 if INTERPRET else 1e-2


def _inputs(b=2, h=3, s=130, dk=32, dv=48, seed=0):
    from llm_quest_tpu.ops.gdn import l2_norm_clamp

    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    # q/k L2-normalized — the models always apply l2_norm_clamp before the
    # delta rule; raw normals make the unit-triangular system overflow (the
    # scan/chunked forms overflow identically — it's outside the contract)
    q = l2_norm_clamp(jax.random.normal(ks[0], (b, h, s, dk), jnp.float32))
    k = l2_norm_clamp(jax.random.normal(ks[1], (b, h, s, dk), jnp.float32))
    v = jax.random.normal(ks[2], (b, h, s, dv), jnp.float32)
    beta = jax.nn.sigmoid(jax.random.normal(ks[3], (b, h, s)))
    alpha = jax.nn.sigmoid(jax.random.normal(ks[4], (b, h, s)) * 0.3 + 2.0)
    s0 = jax.random.normal(ks[5], (b, h, dv, dk), jnp.float32) * 0.1
    return q, k, v, beta, alpha, s0


def test_matches_chunked_oracle():
    q, k, v, beta, alpha, s0 = _inputs()
    out_ref, st_ref = gated_delta_rule_chunked(q, k, v, beta, alpha, s0, chunk_size=64)
    out_p, st_p = gated_delta_rule_pallas(q, k, v, beta, alpha, s0, 64, INTERPRET)
    assert float(jnp.max(jnp.abs(out_ref - out_p))) < TOL
    assert float(jnp.max(jnp.abs(st_ref - st_p))) < TOL


def test_no_prev_state_and_unpadded():
    q, k, v, beta, alpha, _ = _inputs(s=128, seed=1)
    zero = jnp.zeros((2, 3, 48, 32), jnp.float32)
    out_ref, st_ref = gated_delta_rule_chunked(q, k, v, beta, alpha, None, chunk_size=64)
    out_p, st_p = gated_delta_rule_pallas(q, k, v, beta, alpha, zero, 64, INTERPRET)
    assert float(jnp.max(jnp.abs(out_ref - out_p))) < TOL
    assert float(jnp.max(jnp.abs(st_ref - st_p))) < TOL


@pytest.mark.slow
def test_gradients_match_chunked():
    q, k, v, beta, alpha, s0 = _inputs(s=128, seed=2)

    def loss(fn):
        def inner(q, k, v, beta, alpha, s0):
            o, st = fn(q, k, v, beta, alpha, s0)
            return jnp.sum(jnp.sin(o)) + 0.01 * jnp.sum(st**2)

        return inner

    gp = jax.grad(loss(lambda *a: gated_delta_rule_pallas(*a, 64, INTERPRET)), argnums=(0, 1, 2, 3, 4, 5))(
        q, k, v, beta, alpha, s0
    )
    gc = jax.grad(loss(lambda *a: gated_delta_rule_chunked(*a, chunk_size=64)), argnums=(0, 1, 2, 3, 4, 5))(
        q, k, v, beta, alpha, s0
    )
    for a, b in zip(gp, gc):
        assert float(jnp.max(jnp.abs(a - b))) < TOL


def test_auto_dispatch_short_falls_back_to_scan():
    q, k, v, beta, alpha, s0 = _inputs(s=17, seed=3)
    out, st = gated_delta_rule_auto(q, k, v, beta, alpha, s0, chunk_size=64)
    from llm_quest_tpu.ops.gdn import gated_delta_rule

    out_ref, st_ref = gated_delta_rule(q, k, v, beta, alpha, prev_state=s0)
    assert float(jnp.max(jnp.abs(out - out_ref))) < TOL
    assert float(jnp.max(jnp.abs(st - st_ref))) < TOL


@pytest.mark.slow
def test_gradients_padded_and_vs_scan_oracle():
    """Backward with a padded tail chunk (s=130 ∤ 64), checked against BOTH
    the chunked form and the lax.scan recurrence oracle."""
    from llm_quest_tpu.ops.gdn import gated_delta_rule

    q, k, v, beta, alpha, s0 = _inputs(s=130, seed=4)

    def loss(fn):
        def inner(q, k, v, beta, alpha, s0):
            o, st = fn(q, k, v, beta, alpha, s0)
            return jnp.sum(jnp.sin(o)) + 0.01 * jnp.sum(st**2)

        return inner

    args = (q, k, v, beta, alpha, s0)
    gp = jax.grad(loss(lambda *a: gated_delta_rule_pallas(*a, 64, INTERPRET)), argnums=tuple(range(6)))(*args)
    gc = jax.grad(loss(lambda *a: gated_delta_rule_chunked(*a, chunk_size=64)), argnums=tuple(range(6)))(*args)
    gs = jax.grad(loss(lambda q, k, v, b_, a_, s0: gated_delta_rule(q, k, v, b_, a_, prev_state=s0)),
                  argnums=tuple(range(6)))(*args)
    for a, b in zip(gp, gc):
        assert float(jnp.max(jnp.abs(a - b))) < TOL
    for a, b in zip(gp, gs):
        assert float(jnp.max(jnp.abs(a - b))) < max(TOL, 5e-4)  # scan vs chunked assoc. drift


# ---------------------------------------------------------------- decode step


@pytest.mark.parametrize("b,h,dk,dv", [(1, 16, 128, 128), (3, 8, 64, 64), (32, 16, 128, 128)])
def test_step_kernel_matches_xla_step(b, h, dk, dv):
    from llm_quest_tpu.kernels.gdn_pallas import gated_delta_rule_step_pallas
    from llm_quest_tpu.ops.gdn import gated_delta_rule_step, l2_norm_clamp

    ks = jax.random.split(jax.random.PRNGKey(7), 6)
    q = l2_norm_clamp(jax.random.normal(ks[0], (b, h, dk), jnp.bfloat16))
    k = l2_norm_clamp(jax.random.normal(ks[1], (b, h, dk), jnp.bfloat16))
    v = jax.random.normal(ks[2], (b, h, dv), jnp.bfloat16)
    beta = jax.nn.sigmoid(jax.random.normal(ks[3], (b, h)))
    alpha = jax.nn.sigmoid(jax.random.normal(ks[4], (b, h)) * 0.3 + 2.0)
    s0 = jax.random.normal(ks[5], (b, h, dv, dk), jnp.float32) * 0.1

    out_ref, st_ref = gated_delta_rule_step(q, k, v, beta, alpha, s0)
    out, st = gated_delta_rule_step_pallas(q, k, v, beta, alpha, s0, interpret=INTERPRET)
    assert out.dtype == out_ref.dtype and st.dtype == jnp.float32
    assert float(jnp.abs(st - st_ref).max()) < TOL
    # the output is cast to q's dtype — bf16 quantization of a borderline
    # value dominates the fp32 reduction-order difference
    out_tol = TOL if out.dtype == jnp.float32 else 8e-3
    assert float(jnp.abs(out.astype(jnp.float32) - out_ref.astype(jnp.float32)).max()) < out_tol


def test_step_kernel_chains_like_scan():
    """γ chained decode steps through the kernel == the scan recurrence."""
    from llm_quest_tpu.kernels.gdn_pallas import gated_delta_rule_step_pallas
    from llm_quest_tpu.ops.gdn import gated_delta_rule, l2_norm_clamp

    b, h, s, dk, dv = 2, 8, 6, 64, 64
    ks = jax.random.split(jax.random.PRNGKey(3), 6)
    q = l2_norm_clamp(jax.random.normal(ks[0], (b, h, s, dk), jnp.float32))
    k = l2_norm_clamp(jax.random.normal(ks[1], (b, h, s, dk), jnp.float32))
    v = jax.random.normal(ks[2], (b, h, s, dv), jnp.float32)
    beta = jax.nn.sigmoid(jax.random.normal(ks[3], (b, h, s)))
    alpha = jax.nn.sigmoid(jax.random.normal(ks[4], (b, h, s)) * 0.3 + 2.0)
    s0 = jax.random.normal(ks[5], (b, h, dv, dk), jnp.float32) * 0.1

    out_ref, st_ref = gated_delta_rule(q, k, v, beta, alpha, prev_state=s0)
    st = s0
    for t in range(s):
        out_t, st = gated_delta_rule_step_pallas(
            q[:, :, t], k[:, :, t], v[:, :, t], beta[:, :, t], alpha[:, :, t], st,
            interpret=INTERPRET,
        )
        assert float(jnp.abs(out_t - out_ref[:, :, t]).max()) < TOL
    assert float(jnp.abs(st - st_ref).max()) < TOL


def test_step_stacked_kernel_in_place_update():
    """Stacked-buffer step kernel: updates ONLY the addressed layer, leaves
    every other layer bit-identical, and matches the XLA step's math."""
    from llm_quest_tpu.kernels.gdn_pallas import gated_delta_rule_step_stacked_pallas
    from llm_quest_tpu.ops.gdn import gated_delta_rule_step, l2_norm_clamp

    L, b, h, dk, dv = 4, 2, 8, 64, 64
    ks = jax.random.split(jax.random.PRNGKey(11), 6)
    q = l2_norm_clamp(jax.random.normal(ks[0], (b, h, dk), jnp.float32))
    k = l2_norm_clamp(jax.random.normal(ks[1], (b, h, dk), jnp.float32))
    v = jax.random.normal(ks[2], (b, h, dv), jnp.float32)
    beta = jax.nn.sigmoid(jax.random.normal(ks[3], (b, h)))
    alpha = jax.nn.sigmoid(jax.random.normal(ks[4], (b, h)) * 0.3 + 2.0)
    stacked = jax.random.normal(ks[5], (L, b, h, dv, dk), jnp.float32) * 0.1

    for layer in (0, 2, L - 1):
        out_ref, st_ref = gated_delta_rule_step(q, k, v, beta, alpha, stacked[layer])
        out, new_stacked = gated_delta_rule_step_stacked_pallas(
            q, k, v, beta, alpha, stacked, layer, interpret=INTERPRET
        )
        assert float(jnp.abs(out - out_ref).max()) < TOL
        assert float(jnp.abs(new_stacked[layer] - st_ref).max()) < TOL
        for other in range(L):
            if other != layer:
                assert jnp.array_equal(new_stacked[other], stacked[other]), other
