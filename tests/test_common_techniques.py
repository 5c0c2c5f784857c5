"""Common techniques: LoRA family, QK-clip, hyper-connections, NTL, RAL."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from llm_quest_tpu.models import gpt2, hyper_qwen3
from llm_quest_tpu.ops import hyper_connections as hc
from llm_quest_tpu.ops import lora as lora_ops
from llm_quest_tpu.ops import qk_clip
from llm_quest_tpu.ops.linear import init_linear, linear
from llm_quest_tpu.ops.num_token_loss import num_token_loss
from llm_quest_tpu.ops.reinforced_attention import attention_divergence_loss

# ------------------------------------------------------------------- LoRA


def test_lora_zero_at_init_and_trains():
    lin = init_linear(jax.random.PRNGKey(0), 16, 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16))
    base = linear(lin, x)

    for variant in ("lora", "lora_xs", "tiny_lora"):
        wrapped = lora_ops.replace_with_lora(jax.random.PRNGKey(2), {"l": lin}, 4, 8, variant=variant)
        out = linear(wrapped["l"], x)
        # all variants start as (near-)identity: B=0 / R~1e-5 / v=0
        assert jnp.allclose(out, base, atol=1e-3), variant

    # classic LoRA learns: gradient flows through A and B
    wrapped = lora_ops.replace_with_lora(jax.random.PRNGKey(2), {"l": lin}, 4, 8, variant="lora")
    g = jax.grad(lambda p: jnp.sum(linear(p["l"], x) ** 2))(wrapped)
    assert float(jnp.abs(g["l"]["lora"]["A"]).max()) == 0.0  # B=0 → dL/dA = 0 at init
    assert float(jnp.abs(g["l"]["lora"]["B"]).max()) > 0


def test_lora_xs_svd_reconstruction():
    """Full-rank XS A@B == W (truncated SVD exactness at r=min dim)."""
    lin = init_linear(jax.random.PRNGKey(0), 8, 8, bias=False)
    xs = lora_ops.init_lora_xs(jax.random.PRNGKey(1), lin, 8, 8)
    assert jnp.allclose(xs["A"] @ xs["B"], lin["w"], atol=1e-4)


def test_lora_trainable_mask():
    params = {"att": {"wq": init_linear(jax.random.PRNGKey(0), 8, 8)}}
    wrapped = lora_ops.replace_with_lora(jax.random.PRNGKey(1), params, 2, 4, variant="lora")
    mask = lora_ops.lora_trainable_mask(wrapped)
    assert mask["att"]["wq"]["w"] is False
    assert mask["att"]["wq"]["lora"]["A"] is True
    assert mask["att"]["wq"]["lora"]["B"] is True
    assert mask["att"]["wq"]["lora"]["scale"] is False

    # multi_transform with the mask freezes the base weight
    labels = jax.tree.map(lambda m: "train" if m else "freeze", mask)
    tx = optax.multi_transform({"train": optax.sgd(1.0), "freeze": optax.set_to_zero()}, labels)
    state = tx.init(wrapped)
    g = jax.tree.map(jnp.ones_like, wrapped)
    updates, _ = tx.update(g, state, wrapped)
    assert float(jnp.abs(updates["att"]["wq"]["w"]).max()) == 0.0
    assert float(jnp.abs(updates["att"]["wq"]["lora"]["A"]).max()) > 0


def test_tiny_lora_shared_v():
    params = {
        "a": init_linear(jax.random.PRNGKey(0), 8, 8),
        "b": init_linear(jax.random.PRNGKey(1), 8, 8),
    }
    wrapped = lora_ops.replace_with_lora(
        jax.random.PRNGKey(2), params, 2, 4, variant="tiny_lora", shared_v=True, num_trainable_params=5
    )
    assert "v" not in wrapped["a"]["lora"]
    v = jnp.ones((5,)) * 0.1
    injected = lora_ops.inject_shared_v(wrapped, v)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8))

    def loss(v):
        p = lora_ops.inject_shared_v(wrapped, v)
        return jnp.sum(linear(p["a"], x) ** 2) + jnp.sum(linear(p["b"], x) ** 2)

    g_tied = jax.grad(loss)(v)
    # tied grad == sum of per-layer v grads
    g_tree = jax.grad(lambda p: jnp.sum(linear(p["a"], x) ** 2) + jnp.sum(linear(p["b"], x) ** 2))(injected)
    g_sum = lora_ops.collect_shared_v_grad(g_tree)
    assert jnp.allclose(g_tied, g_sum, atol=1e-5)


# ----------------------------------------------------------------- QK-clip


def test_qk_clip_caps_max_logit():
    key = jax.random.PRNGKey(0)
    d, n_heads, n_kv, hd = 16, 4, 2, 8
    wq = jax.random.normal(key, (d, n_heads * hd))
    wk = jax.random.normal(jax.random.PRNGKey(1), (d, n_kv * hd))
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 6, d))

    def max_logits(wq, wk):
        q = (x @ wq).reshape(2, 6, n_heads, hd).transpose(0, 2, 1, 3)
        k = (x @ wk).reshape(2, 6, n_kv, hd).transpose(0, 2, 1, 3)
        k = jnp.repeat(k, n_heads // n_kv, axis=1)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * hd**-0.5
        return jnp.max(scores, axis=(0, 2, 3))

    ml = max_logits(wq, wk)
    tau = float(jnp.max(ml)) / 2  # force clipping
    new_wq, new_wk = qk_clip.qk_clip_per_head(wq, wk, ml, tau, num_heads=n_heads, num_kv_heads=n_kv)
    new_ml = max_logits(new_wq, new_wk)
    assert float(jnp.max(new_ml)) <= tau * 1.001  # min-reduction guarantees the cap

    # heads under the threshold with an under-threshold group stay untouched
    ml_low = jnp.full((n_heads,), tau / 2)
    same_wq, same_wk = qk_clip.qk_clip_per_head(wq, wk, ml_low, tau, num_heads=n_heads, num_kv_heads=n_kv)
    assert jnp.allclose(same_wq, wq) and jnp.allclose(same_wk, wk)


def test_qk_clip_naive():
    wq = jnp.ones((4, 8))
    wk = jnp.ones((4, 8))
    nq, nk = qk_clip.qk_clip_naive(wq, wk, jnp.asarray(4.0), 1.0, alpha=0.5)
    assert jnp.allclose(nq, wq * 0.5) and jnp.allclose(nk, wk * 0.5)  # eta=0.25, sqrt each


# --------------------------------------------------------- hyper-connections


def test_sinkhorn_knopp_doubly_stochastic():
    p = jax.random.uniform(jax.random.PRNGKey(0), (2, 5, 4, 4)) + 0.1
    ds = hc.sinkhorn_knopp(p, max_iter=30)
    assert jnp.allclose(jnp.sum(ds, axis=-1), 1.0, atol=1e-4)
    assert jnp.allclose(jnp.sum(ds, axis=-2), 1.0, atol=1e-4)


def test_bvn_convex_combination():
    flat, identity_idx = hc.permutation_matrices(3)
    assert flat.shape == (6, 9)
    # identity weights → identity matrix
    w = jnp.zeros((1, 6)).at[0, identity_idx].set(1.0)
    h = hc.bvn_compose(w, flat, 3)
    assert jnp.allclose(h[0], jnp.eye(3))
    # any convex combination is doubly stochastic
    w = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(0), (4, 6)))
    h = hc.bvn_compose(w, flat, 3)
    assert jnp.allclose(jnp.sum(h, axis=-1), 1.0, atol=1e-5)
    assert jnp.allclose(jnp.sum(h, axis=-2), 1.0, atol=1e-5)


def test_hc_res_identity_at_init():
    """Zero-init dynamic weights + identity bias → H_res == I."""
    p = hc.init_hc_set(8, 4)
    x_norm = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 4, 8))
    h = hc.hc_res_matrix(p["res"], x_norm)
    assert jnp.allclose(h, jnp.broadcast_to(jnp.eye(4), h.shape), atol=1e-6)


@pytest.mark.parametrize("hc_type", ["hc", "mhc", "mhc-lite"])
@pytest.mark.slow
def test_hyper_qwen3_forward_and_grads(hc_type):
    cfg = {
        "vocab_size": 64,
        "context_length": 32,
        "emb_dim": 24,
        "n_layers": 2,
        "n_heads": 2,
        "num_kv_groups": 1,
        "head_dim": 12,
        "hidden_dim": 48,
        "rope_base": 10_000,
        "tie_embeddings": True,
        "dtype": jnp.float32,
    }
    params = hyper_qwen3.init(jax.random.PRNGKey(0), cfg, hc_type=hc_type, expansion_rate=3)
    x = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 64)
    logits, _, _ = hyper_qwen3.apply(params, cfg, x, hc_type=hc_type, expansion_rate=3)
    assert logits.shape == (2, 8, 64)
    assert jnp.all(jnp.isfinite(logits))

    def loss(p):
        lg, _, _ = hyper_qwen3.apply(p, cfg, x, hc_type=hc_type, expansion_rate=3)
        return jnp.sum(lg**2)

    g = jax.grad(loss)(params)
    g_hc = g["blocks"][0]["hc_attn"]["res"]["w"]
    assert jnp.all(jnp.isfinite(g_hc)) and float(jnp.abs(g_hc).max()) > 0


# ------------------------------------------------------------------ NTL/RAL


def test_num_token_loss():
    # vocab: ids 0-9 are digits "0".."9", rest NaN
    vocab = jnp.concatenate([jnp.arange(10.0), jnp.full((6,), jnp.nan)])
    labels = jnp.asarray([[4, 12, -100]])  # one number label, one text, one ignored
    # perfect prediction of "4" → distance 0
    logits = jnp.full((1, 3, 16), -10.0).at[0, 0, 4].set(10.0)
    loss = num_token_loss(logits, labels, vocab)
    assert float(loss) < 1e-3
    # mass on "5" instead → distance 1
    logits_off = jnp.full((1, 3, 16), -10.0).at[0, 0, 5].set(10.0)
    assert abs(float(num_token_loss(logits_off, labels, vocab)) - 1.0) < 1e-3
    # mass on "9" → distance 5 (numerically proximal predictions penalized less)
    logits_far = jnp.full((1, 3, 16), -10.0).at[0, 0, 9].set(10.0)
    assert abs(float(num_token_loss(logits_far, labels, vocab)) - 5.0) < 1e-3
    # no number labels → 0
    assert float(num_token_loss(logits, jnp.asarray([[12, 12, -100]]), vocab)) == 0.0


def test_attention_divergence_loss():
    key = jax.random.PRNGKey(0)
    p_attn = jax.nn.softmax(jax.random.normal(key, (2, 2, 4, 4)), axis=-1)
    q_attn = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(1), (2, 2, 4, 4)), axis=-1)
    adv = jnp.asarray([1.0, -0.5])
    mask = jnp.asarray([[1, 1, 1, 0], [1, 1, 0, 0]])
    loss = attention_divergence_loss(p_attn, q_attn, adv, mask)
    assert jnp.isfinite(loss)
    # identical maps → JSD 0 → loss 0
    zero = attention_divergence_loss(p_attn, p_attn, adv, mask)
    assert abs(float(zero)) < 1e-6
    # positive advantage pulls policy toward old: gradient reduces JSD
    g = jax.grad(lambda p: attention_divergence_loss(p, q_attn, jnp.asarray([1.0, 1.0]), mask))(p_attn)
    assert jnp.all(jnp.isfinite(g))


def test_gpt2_with_lora_end_to_end():
    cfg = {"vocab_size": 64, "context_length": 32, "emb_dim": 32, "n_heads": 4, "n_layers": 2,
           "drop_rate": 0.0, "qkv_bias": False}
    params = gpt2.init(jax.random.PRNGKey(0), cfg)
    wrapped = lora_ops.replace_with_lora(
        jax.random.PRNGKey(1), params, 4, 8, variant="lora", path_filter=lambda p: "/att/" in p
    )
    x = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, 64)
    base_logits, _, _ = gpt2.apply(params, cfg, x)
    lora_logits, _, _ = gpt2.apply(wrapped, cfg, x)
    assert jnp.allclose(base_logits, lora_logits, atol=1e-5)  # B=0 → identity

    # only attention linears wrapped
    assert "lora" in wrapped["blocks"][0]["att"]["wq"]
    assert "lora" not in wrapped["blocks"][0]["ffn"]["fc"]


def test_magnitude_qk_clip():
    wq = jnp.ones((8, 8))  # 2 heads x head_dim 4
    wk = jnp.ones((8, 8))
    ml = jnp.asarray([-4.0, 1.0])  # head 0 blows up NEGATIVELY
    nq, nk = qk_clip.magnitude_qk_clip(wq, wk, ml, 1.0, num_heads=2)
    # head 0 scaled by sqrt(1/4)=0.5 on both; head 1 untouched
    assert jnp.allclose(nq[:, :4], 0.5) and jnp.allclose(nk[:, :4], 0.5)
    assert jnp.allclose(nq[:, 4:], 1.0) and jnp.allclose(nk[:, 4:], 1.0)


def test_qk_clip_end_to_end_on_llama3():
    """Collect per-head max logits from a forward, apply QK-clip, verify the
    next forward's max logits are capped — the full reference workflow.
    (Llama-style GQA, no QK-norm: QK-RMSNorm models like Qwen3 make the clip
    a no-op because RMSNorm is scale-invariant.)"""
    import jax.numpy as jnp

    from llm_quest_tpu.models import llama3

    cfg = {
        "vocab_size": 64, "context_length": 32, "emb_dim": 32, "n_layers": 2, "n_heads": 4,
        "num_kv_groups": 2, "hidden_dim": 64, "rope_base": 10_000, "dtype": jnp.float32,
    }
    params = llama3.init(jax.random.PRNGKey(0), cfg)
    for blk in params["blocks"]:
        blk["att"]["wq"]["w"] = blk["att"]["wq"]["w"] * 20.0  # force huge logits

    x = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 64)
    _, _, aux = llama3.apply(params, cfg, x, collect_max_logits=True)
    ml = aux["max_attn_logits"]
    assert len(ml) == 2 and ml[0].shape == (4,)
    tau = float(max(jnp.max(m) for m in ml)) / 2

    clipped = qk_clip.apply_qk_clip(params, ml, tau, num_heads=4, num_kv_heads=2)
    _, _, aux2 = llama3.apply(clipped, cfg, x, collect_max_logits=True)
    for m in aux2["max_attn_logits"]:
        assert float(jnp.max(m)) <= tau * 1.01


@pytest.mark.parametrize("variant", ["lora", "lora_xs", "tiny_lora"])
def test_multi_lora_stacked_selection_matches_merged(variant):
    """Per-row stacked-adapter selection (stack_adapters + select_adapter)
    == each adapter dense-merged into the base weights (merge_adapter);
    the appended null adapter == the unmodified base layer."""
    from llm_quest_tpu.ops.linear import init_linear, linear

    key = jax.random.PRNGKey(0)
    base = init_linear(key, 16, 24, bias=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 16))

    adapters = []
    for a in range(2):
        k = jax.random.fold_in(key, 100 + a)
        tree = lora_ops.replace_with_lora(k, {"lin": dict(base)}, 4, 8, variant=variant)
        lo = tree["lin"]["lora"]
        leaf = {"lora": "B", "lora_xs": "R", "tiny_lora": "v"}[variant]
        lo[leaf] = 0.1 * jax.random.normal(jax.random.fold_in(k, 1), lo[leaf].shape)
        adapters.append(tree)
    stacked = lora_ops.stack_adapters(adapters)
    assert lora_ops.num_adapters(stacked) == 3  # 2 + null

    idx = jnp.asarray([0, 1, 2, 0])
    y = linear(lora_ops.select_adapter(stacked, idx)["lin"], x)
    for row, j in enumerate([0, 1, 2, 0]):
        ref = linear(lora_ops.merge_adapter(stacked, j)["lin"], x[row : row + 1])
        assert float(jnp.max(jnp.abs(y[row : row + 1] - ref))) < 1e-5
    base_y = linear(base, x[2:3])  # null row = base
    assert float(jnp.max(jnp.abs(y[2:3] - base_y))) < 1e-5
