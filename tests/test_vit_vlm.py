"""ViT classifier + ViT→GPT-2 VLM tests."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from llm_quest_tpu.models import gpt2, vit
from llm_quest_tpu.multimodal import vlm
from llm_quest_tpu.training.vit_engine import (
    evaluate_accuracy,
    make_vit_eval_step,
    make_vit_train_step,
)

VIT_TINY = {
    "img_width": 16,
    "img_height": 16,
    "patch_size": 4,
    "num_channels": 3,
    "emb_dim": 32,
    "n_layers": 2,
    "n_heads": 4,
    "drop_rate": 0.0,
    "qkv_bias": True,
    "num_classes": 10,
}

GPT_TINY = {
    "vocab_size": 128,
    "context_length": 96,
    "emb_dim": 48,
    "n_heads": 4,
    "n_layers": 2,
    "drop_rate": 0.0,
    "qkv_bias": False,
}


def test_patch_embedding_matches_conv():
    """Reshape+matmul patchify == stride=kernel conv2d."""
    params = vit.init_patch_embedding(jax.random.PRNGKey(0), VIT_TINY, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 16, 16))
    got = vit.patch_embedding(params, VIT_TINY, x)
    assert got.shape == (2, 17, 32)  # 16 patches + CLS

    conv = jax.lax.conv_general_dilated(
        x, params["conv_w"], window_strides=(4, 4), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    ) + params["conv_b"][None, :, None, None]
    conv_flat = conv.reshape(2, 32, -1).transpose(0, 2, 1)
    assert jnp.allclose(got[:, 1:], conv_flat, atol=1e-4)


def test_vit_forward_and_hidden_states():
    params = vit.init(jax.random.PRNGKey(0), VIT_TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 16, 16))
    logits = vit.apply(params, VIT_TINY, x)
    assert logits.shape == (2, 10)
    hidden = vit.apply(params, VIT_TINY, x, output_hidden_states=True)
    assert hidden.shape == (2, 17, 32)


def test_vit_learns_trivial_task():
    """Few steps on a linearly-separable toy task drop the loss."""
    import optax

    from llm_quest_tpu.training.engine import make_optimizer

    params = vit.init(jax.random.PRNGKey(0), VIT_TINY)
    optimizer = make_optimizer(1e-3)
    opt_state = optimizer.init(params)
    train_step = make_vit_train_step(vit, VIT_TINY, optimizer)

    rng = np.random.default_rng(0)
    labels = jnp.asarray(rng.integers(0, 2, size=16))
    images = jnp.asarray(rng.normal(size=(16, 3, 16, 16)), jnp.float32) + labels[:, None, None, None].astype(
        jnp.float32
    ) * 2.0
    batch = {"image": images, "label": labels}

    key = jax.random.PRNGKey(0)
    _, _, loss0 = train_step(params, opt_state, batch, key)
    for _ in range(10):
        params, opt_state, loss = train_step(params, opt_state, batch, key)
    assert float(loss) < float(loss0)

    eval_step = make_vit_eval_step(vit, VIT_TINY)
    _, acc = evaluate_accuracy([batch], eval_step, params)
    assert acc > 0.6


def test_vlm_loss_alignment():
    """Last vision token predicts the first text token."""
    b, nv, st, v = 2, 5, 4, 128
    logits = jnp.zeros((b, nv + st, v))
    labels = jnp.ones((b, st), jnp.int32)
    mask = jnp.ones((b, st), bool)
    loss = vlm.vlm_loss(logits, labels, mask, nv)
    # uniform logits → CE == log(v)
    assert abs(float(loss) - float(jnp.log(v))) < 1e-4
    # fully-masked text → denominator guard, loss 0
    loss0 = vlm.vlm_loss(logits, labels, jnp.zeros((b, st), bool), nv)
    assert float(loss0) == 0.0


@pytest.mark.slow
def test_vlm_forward_loss_and_grads():
    vit_params = vit.init(jax.random.PRNGKey(0), VIT_TINY)
    llm_params = gpt2.init(jax.random.PRNGKey(1), GPT_TINY)
    adapter = vlm.init_adapter(jax.random.PRNGKey(2), 32, 48, adapter_type="ffn")

    batch = {
        "image": jax.random.normal(jax.random.PRNGKey(3), (2, 3, 16, 16)),
        "input_ids": jax.random.randint(jax.random.PRNGKey(4), (2, 6), 0, 128),
        "attention_mask": jnp.ones((2, 6), bool),
    }

    def loss_fn(adapter_params, llm_params):
        return vlm.vlm_forward_loss(vit, vit_params, VIT_TINY, adapter_params, llm_params, GPT_TINY, batch)

    loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(adapter, llm_params)
    assert jnp.isfinite(loss)
    # adapter + LLM get grads; frozen ViT is outside the diff path
    assert float(jnp.abs(grads[0]["fc"]["w"]).max()) > 0
    assert float(jnp.abs(grads[1]["blocks"][0]["att"]["wq"]["w"]).max()) > 0


def test_vlm_generate_shapes():
    vit_params = vit.init(jax.random.PRNGKey(0), VIT_TINY)
    llm_params = gpt2.init(jax.random.PRNGKey(1), GPT_TINY)
    adapter = vlm.init_adapter(jax.random.PRNGKey(2), 32, 48)
    images = jax.random.normal(jax.random.PRNGKey(3), (2, 3, 16, 16))
    tokens = vlm.vlm_generate(vit, vit_params, VIT_TINY, adapter, llm_params, GPT_TINY, images, bos_id=1, max_gen=5)
    assert tokens.shape == (2, 5)
    assert jnp.all((tokens >= 0) & (tokens < 128))


@pytest.mark.slow
def test_tinyvit_synthetic_convergence_accuracy_bar():
    """Training-correctness bar for the ViT engine beyond loss-goes-down.

    The reference's only published accuracy baseline is TinyViT CIFAR-10
    71.82% @ 20 epochs (reference: multimodal/vision_transformer/
    README.md:77-80). CIFAR-10 itself is network-gated in this container
    (no egress — documented in COVERAGE.md), so this test states a bar on
    a synthetic task with known structure instead: 10 fixed class
    templates + strong pixel noise (SNR 0.5), TinyViT at the reference
    config, full engine path (patchify→blocks→CLS head, AdamW + cosine,
    accuracy evaluator). Bayes accuracy ~1.0; the engine must reach
    >= 0.90 held-out accuracy — a real learning bar, not a smoke test.
    """
    import numpy as np

    from llm_quest_tpu import config as cfg_mod
    from llm_quest_tpu.models import vit
    from llm_quest_tpu.training.vit_engine import vit_training_eval_loop

    cfg = dict(cfg_mod.TINY_VIT_CONFIG)
    rng = np.random.default_rng(0)
    templates = rng.normal(size=(10, 3, cfg["img_height"], cfg["img_width"])).astype(np.float32)
    n_train, n_val, b = 576, 192, 64

    def make_split(n, seed):
        r = np.random.default_rng(seed)
        y = r.integers(0, 10, size=(n,))
        x = 0.5 * templates[y] + r.normal(size=(n, 3, cfg["img_height"], cfg["img_width"]))
        return x.astype(np.float32), y.astype(np.int32)

    tr_x, tr_y = make_split(n_train, 1)
    va_x, va_y = make_split(n_val, 2)
    loader = lambda x, y: [
        {"image": x[i : i + b], "label": y[i : i + b]} for i in range(0, len(x), b)
    ]

    params = vit.init(jax.random.PRNGKey(123), cfg)
    _, metrics = vit_training_eval_loop(
        vit, cfg, params, loader(tr_x, tr_y), loader(va_x, va_y),
        num_epoch=12, peak_lr=3e-4, min_lr=3e-5, warmup_steps=20,
        eval_freq=27, eval_iter=3, log=lambda *_: None,
    )
    assert max(metrics["val_acc"]) >= 0.90, metrics["val_acc"]
