"""On-device preprocessing: normalization weight-folding exactness."""

import jax
import jax.numpy as jnp
import numpy as np

from llm_quest_tpu.data.datasets import CIFAR10_MEAN, CIFAR10_STD
from llm_quest_tpu.models import qwen3_5, vit
from llm_quest_tpu.multimodal.preprocessing import (
    fold_image_normalization,
    make_uint8_encoder,
    resize_bilinear,
)

VIT_TINY = {
    "img_width": 16, "img_height": 16, "patch_size": 4, "num_channels": 3,
    "emb_dim": 32, "n_layers": 2, "n_heads": 4, "drop_rate": 0.0, "qkv_bias": True,
    "num_classes": 10,
}


def test_folding_matches_explicit_normalization_2d():
    params = vit.init(jax.random.PRNGKey(0), VIT_TINY)
    u8 = jnp.asarray(np.random.default_rng(0).integers(0, 255, size=(2, 3, 16, 16)), jnp.float32)

    mean, std = CIFAR10_MEAN, CIFAR10_STD
    normalized = (u8 / 255.0 - mean[None, :, None, None]) / std[None, :, None, None]
    ref = vit.patch_embedding(params["patch_emb"], VIT_TINY, normalized)

    folded = fold_image_normalization(params["patch_emb"], mean, std)
    got = vit.patch_embedding(folded, VIT_TINY, u8)
    assert float(jnp.abs(ref - got).max()) < 1e-4


def test_folding_matches_explicit_normalization_3d():
    cfg = {"patch_size": 4, "temporal_patch_size": 2, "in_channels": 3, "vision_emb_dim": 16}
    params = qwen3_5.init_patch_embedding_3d(jax.random.PRNGKey(0), cfg, jnp.float32)
    u8 = jnp.asarray(np.random.default_rng(1).integers(0, 255, size=(1, 3, 2, 8, 8)), jnp.float32)

    mean = jnp.asarray([0.5, 0.5, 0.5])
    std = jnp.asarray([0.5, 0.5, 0.5])
    normalized = (u8 / 255.0 - mean[None, :, None, None, None]) / std[None, :, None, None, None]
    ref = qwen3_5.patch_embedding_3d(params, cfg, normalized)

    folded = fold_image_normalization(params, mean, std)
    got = qwen3_5.patch_embedding_3d(folded, cfg, u8)
    assert float(jnp.abs(ref - got).max()) < 1e-4


def test_uint8_encoder_end_to_end():
    params = vit.init(jax.random.PRNGKey(0), VIT_TINY)
    encode = make_uint8_encoder(vit, params, VIT_TINY, CIFAR10_MEAN, CIFAR10_STD)
    u8 = jnp.asarray(np.random.default_rng(2).integers(0, 255, size=(2, 3, 16, 16)), jnp.uint8)
    out = encode(u8)
    assert out.shape == (2, 17, 32)

    normalized = (u8.astype(jnp.float32) / 255.0 - CIFAR10_MEAN[None, :, None, None]) / CIFAR10_STD[
        None, :, None, None
    ]
    ref = vit.apply(params, VIT_TINY, normalized, output_hidden_states=True)
    assert float(jnp.abs(ref - out).max()) < 1e-3


def test_resize_bilinear_shape():
    x = jnp.ones((2, 3, 8, 8))
    y = resize_bilinear(x, 16, 16)
    assert y.shape == (2, 3, 16, 16)
    assert jnp.allclose(y, 1.0, atol=1e-6)  # constant image stays constant
