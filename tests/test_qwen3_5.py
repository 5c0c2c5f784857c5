"""Qwen3.5 VLM tests: vision tower, FusedGDN text model, VLM wiring, MRoPE ids."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from llm_quest_tpu.models import qwen3_5 as q35

TINY = {
    # text
    "vocab_size": 256,
    "emb_dim": 32,
    "hidden_dim": 64,
    "n_layers": 4,
    "linear_sdpa_ratio": 2,  # GDN, ATTN, GDN, ATTN
    "n_heads": 4,
    "num_kv_groups": 2,
    "head_dim": 16,
    "rope_base": 10_000_000,
    "partial_rope_factor": 0.25,
    "context_length": 128,
    "linear_num_qk_heads": 2,
    "linear_num_value_heads": 4,
    "linear_qk_head_dim": 8,
    "linear_value_head_dim": 8,
    "linear_conv_kernel_size": 4,
    "tie_embeddings": True,
    "dtype": jnp.float32,
    "mrope_section": [1, 1, 0],  # sums to head_dim*0.25/2 = 2
    # vision
    "vision_n_layers": 2,
    "vision_emb_dim": 24,
    "vision_hidden_dim": 48,
    "vision_num_heads": 2,
    "llm_d_in": 32,
    "in_channels": 3,
    "patch_size": 4,
    "spatial_merge_size": 2,
    "temporal_patch_size": 2,
    "num_position_embeddings": 64,
    "img_width": 16,
    "img_height": 16,
    "vision_rope_base": 10_000,
    "image_token_id": 200,
}


def test_patch_embedding_3d_matches_conv():
    params = q35.init_patch_embedding_3d(jax.random.PRNGKey(0), TINY, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 4, 16, 16))
    got = q35.patch_embedding_3d(params, TINY, x)
    assert got.shape == (2, 2 * 4 * 4, 24)  # (T/2)·(16/4)²

    conv = jax.lax.conv_general_dilated(
        x, params["conv_w"], window_strides=(2, 4, 4), padding="VALID",
        dimension_numbers=("NCTHW", "OITHW", "NCTHW"),
    ) + params["conv_b"][None, :, None, None, None]
    conv_flat = conv.reshape(2, 24, -1).transpose(0, 2, 1)
    assert jnp.allclose(got, conv_flat, atol=1e-4)


@pytest.mark.slow
def test_vision_tower_shapes():
    params = q35.init_vision(jax.random.PRNGKey(0), TINY)
    pixels = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 2, 16, 16))
    out = q35.apply_vision(params, TINY, pixels)
    # 16 patches per frame, 1 actual frame, 2x2 merge → 4 merged patches
    assert out.shape == (1, 4, 32)
    assert jnp.all(jnp.isfinite(out))


def test_merge_adapter_grouping():
    """2x2 blocks concat in (h_in, w_in) order."""
    cfg = dict(TINY, vision_emb_dim=1, spatial_merge_size=2)
    params = {
        "norm": {"scale": jnp.ones((1,)), "shift": jnp.zeros((1,))},
        "lin1": {"w": jnp.eye(4), "b": jnp.zeros((4,))},
        "lin2": {"w": jnp.eye(4)[:, :4], "b": jnp.zeros((4,))},
    }
    # 4x4 grid of patch "values" 0..15 row-major; LayerNorm of a scalar dim
    # zeroes values, so bypass: check only the reshape path via norm scale=1,
    # values passed through the gelu MLP monotonically per-slot.
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 16, 1)
    merged = q35.merge_adapter(params, cfg, x)
    assert merged.shape == (1, 4, 4)


def test_compute_3d_position_ids_reference_example():
    """Docstring example (qwen3_5_vlm_model.py:98-106): 2x2 merged image
    after 6 text tokens; patches share T, H/W form the grid; the token after
    the image jumps by max(t, mh, mw)."""
    cfg = dict(TINY)
    # 6 text, 4 image placeholders (t=1, mh=2, mw=2 merged), 1 text
    ids = np.array([[1, 2, 3, 4, 5, 6, 200, 200, 200, 200, 7]])
    feeds = np.array([[1, 4, 4]])  # t=1, h=4, w=4 patches → merged 2x2
    pos = q35.compute_3d_position_ids(cfg, ids, feeds)
    assert pos.shape == (3, 1, 11)
    t, h, w = pos[0, 0], pos[1, 0], pos[2, 0]
    assert t.tolist() == [0, 1, 2, 3, 4, 5, 6, 6, 6, 6, 8]
    assert h.tolist() == [0, 1, 2, 3, 4, 5, 6, 6, 7, 7, 8]
    assert w.tolist() == [0, 1, 2, 3, 4, 5, 6, 7, 6, 7, 8]


def test_text_only_position_ids_sequential():
    ids = np.zeros((2, 5), np.int64)
    pos = q35.compute_3d_position_ids(TINY, ids, None)
    assert pos.shape == (3, 2, 5)
    assert np.array_equal(pos[0], pos[1]) and np.array_equal(pos[1], pos[2])
    assert pos[0, 0].tolist() == [0, 1, 2, 3, 4]


@pytest.mark.slow
def test_text_cached_decode_matches_uncached():
    """Hybrid-cache greedy decode == full-recompute decode (text only)."""
    params = q35.init_text(jax.random.PRNGKey(0), TINY)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (1, 6), 0, 199)

    # uncached loop
    ids = prompt
    for _ in range(6):
        logits, _, _ = q35.apply_text(params, TINY, ids)
        ids = jnp.concatenate([ids, jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)], axis=1)

    # cached: prefill + steps
    cache = q35.init_cache(TINY, 1, 12)
    mask = jnp.concatenate([jnp.ones((1, 6), bool), jnp.zeros((1, 6), bool)], axis=1)
    logits, cache, _ = q35.apply_text(params, TINY, prompt, attn_mask=mask, cache=cache)
    out = [int(jnp.argmax(logits[0, -1]))]
    for i in range(5):
        mask = mask.at[:, 6 + i].set(True)
        logits, cache, _ = q35.apply_text(
            params, TINY, jnp.asarray([[out[-1]]], jnp.int32), attn_mask=mask, cache=cache
        )
        out.append(int(jnp.argmax(logits[0, 0])))

    assert ids[0, 6:].tolist() == out


def test_vlm_forward_scatters_vision():
    params = q35.init(jax.random.PRNGKey(0), TINY)
    pixels = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 2, 16, 16))
    # 4 merged vision tokens → 4 placeholders
    ids = jnp.asarray([[1, 2, 200, 200, 200, 200, 3]], jnp.int32)

    fused = q35.fuse_embeddings(params, TINY, ids, pixels)
    vision = q35.apply_vision(params["vision"], TINY, pixels)
    assert jnp.allclose(fused[0, 2:6], vision[0], atol=1e-5)
    text_emb = params["text"]["tok_emb"]["w"][jnp.asarray([1, 2])]
    assert jnp.allclose(fused[0, :2], text_emb, atol=1e-6)

    logits, _, _ = q35.apply(params, TINY, ids, image_pixels=pixels)
    assert logits.shape == (1, 7, 256)
    assert jnp.all(jnp.isfinite(logits))


@pytest.mark.slow
def test_vlm_generate_multimodal():
    params = q35.init(jax.random.PRNGKey(0), TINY)
    pixels = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 2, 16, 16))
    ids = jnp.asarray([[1, 2, 200, 200, 200, 200, 3]], jnp.int32)
    out = q35.generate_multimodal(params, TINY, ids, pixels, max_gen=4, temp=0.0, eos_ids=-1, pad_id=0)
    assert out["sequences"].shape == (1, 11)

    # decode continuation must match the uncached full-recompute argmax chain.
    # The oracle extends position ids SEQUENTIALLY past the prompt (decode
    # semantics) — re-deriving them from the grown sequence would mis-treat a
    # sampled token that happens to equal image_token_id as a placeholder.
    # (generated tokens are embedded as plain text even if a sampled id
    # collides with image_token_id — only the prompt's placeholders scatter)
    feeds = q35.get_feeds_3d_shape(TINY, pixels.shape)
    prompt_pos = q35.compute_3d_position_ids(TINY, np.asarray(ids), feeds)
    next0 = prompt_pos.max() + 1
    prompt_emb = q35.fuse_embeddings(params, TINY, ids, pixels)
    gen = []
    for step in range(4):
        ext = next0 + np.arange(step)
        pos = np.concatenate([prompt_pos, np.broadcast_to(ext[None, None], (3, 1, step))], axis=2)
        gen_emb = params["text"]["tok_emb"]["w"][jnp.asarray(gen, jnp.int32)][None] if gen else None
        embs = prompt_emb if gen_emb is None else jnp.concatenate([prompt_emb, gen_emb], axis=1)
        logits, _, _ = q35.apply_text(params["text"], TINY, inputs_embs=embs, position_ids=jnp.asarray(pos))
        gen.append(int(jnp.argmax(logits[0, -1])))
    assert out["sequences"][0, 7:].tolist() == gen


def test_generic_decode_engine_drives_text_model():
    """The batched decode engine (2-D position ids) must drive the MRoPE
    text model — regression for the (b, s) → (3, b, s) broadcast."""
    from llm_quest_tpu.inference import generate as gen

    class TextModel:
        apply = staticmethod(q35.apply_text)
        init_cache = staticmethod(q35.init_cache)

    params = q35.init_text(jax.random.PRNGKey(0), TINY)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 5), 0, 199)
    mask = jnp.ones((2, 5), bool)
    out = gen.generate_batched_kv_cache(
        TextModel, params, TINY, prompt, mask, max_gen=4, temp=0.0, eos_ids=-1, pad_id=0
    )
    assert out["sequences"].shape == (2, 9)
    assert jnp.all(out["sequences"] >= 0)


@pytest.mark.slow
def test_flash_prefill_token_parity_text():
    """Hybrid text decode with flash cached-prefill (long prompt against the
    max_len cache view) == the sdpa-prefill decode, token for token."""
    from llm_quest_tpu.inference import generate as gen

    cfg = dict(TINY, context_length=512)
    params = q35.init_text(jax.random.PRNGKey(0), cfg)

    class TextModel:
        apply = staticmethod(q35.apply_text)
        init_cache = staticmethod(q35.init_cache)

    model = TextModel
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 300), 0, 256)
    mask = jnp.ones((2, 300), bool)

    ref = gen.generate_batched_kv_cache(model, params, dict(cfg, use_flash=False),
                                        prompt, mask, max_gen=6, temp=0.0, eos_ids=-1, pad_id=0)
    out = gen.generate_batched_kv_cache(model, params, dict(cfg, use_flash=True, flash_min_seq=64),
                                        prompt, mask, max_gen=6, temp=0.0, eos_ids=-1, pad_id=0)
    assert ref["sequences"].tolist() == out["sequences"].tolist()
