"""On-device image preprocessing, fused into the encode path.

The reference preprocesses on host with torchvision (resize → ToTensor →
Normalize, dataset.py:295-383; qwen3_5_generate_multimodal.py:38-46). The
BASELINE north-star wants preprocessing fused so the ViT never starves.

TPU design — two layers of fusion:

1. **Weight folding (zero-cost normalize + uint8 scale).** Per-channel affine
   normalization commutes into the patch-embedding projection:
       ((x/255 − μ)/σ) · W  ==  x · W̃ + b̃
   with W̃ = W/(255σ) (per input channel) and b̃ = b − Σ (μ/σ)·W. After
   ``fold_image_normalization`` the model consumes RAW uint8 pixels —
   preprocessing costs zero FLOPs and the host→device transfer shrinks 4×
   (uint8 vs fp32), which is the actual feed bottleneck at 4k images/sec.

2. **On-device resize**: bilinear via jax.image.resize inside the same jit
   (XLA fuses the gather/interp chain; no host round-trip).

Works for both the 2-D ViT patch embed (models/vit.py) and the 3-D Qwen3.5
patch embed (models/qwen3_5.py) — the folding math only touches the
input-channel axis of the conv weight.
"""

import jax
import jax.numpy as jnp


def resize_bilinear(images, height, width):
    """(b, c, H, W) → (b, c, height, width), antialias off (torchvision
    Resize default parity)."""
    b, c = images.shape[:2]
    return jax.image.resize(images.astype(jnp.float32), (b, c, height, width), method="bilinear")


def fold_image_normalization(patch_params, mean, std, *, input_scale=1.0 / 255.0):
    """Fold (x·input_scale − mean)/std into patch-embed conv weights.

    patch_params: {"conv_w": (d, c, ...spatial), "conv_b": (d,)} — 2-D ViT
    (d, c, p, p) or Qwen3.5 3-D (d, c, tp, p, p).
    Returns new params consuming RAW (e.g. uint8-valued) pixels.
    """
    w = patch_params["conv_w"].astype(jnp.float32)
    b = patch_params["conv_b"].astype(jnp.float32)
    c = w.shape[1]
    mean = jnp.asarray(mean, jnp.float32).reshape(1, c, *([1] * (w.ndim - 2)))
    std = jnp.asarray(std, jnp.float32).reshape(1, c, *([1] * (w.ndim - 2)))

    w_folded = w * (input_scale / std)
    # b̃ = b − Σ_{c,spatial} (μ/σ)·W  (the constant the normalization injects)
    b_folded = b - jnp.sum(w * (mean / std), axis=tuple(range(1, w.ndim)))
    return {
        **patch_params,
        "conv_w": w_folded.astype(patch_params["conv_w"].dtype),
        "conv_b": b_folded.astype(jnp.float32).astype(patch_params["conv_b"].dtype),
    }


def make_uint8_encoder(vit_module, params, cfg, mean, std, *, resize_to=None):
    """Jitted uint8-image → ViT-hidden-states encoder with folded
    normalization: the full preprocessing+encode pipeline as ONE program.

    Returns encode(uint8_images (b, c, H, W)) → (b, N+1, d).
    """
    folded = dict(params, patch_emb=fold_image_normalization(params["patch_emb"], mean, std))

    @jax.jit
    def encode(images_u8):
        x = images_u8.astype(cfg.get("dtype", jnp.float32))
        if resize_to is not None:
            x = resize_bilinear(x, *resize_to).astype(x.dtype)
        return vit_module.apply(folded, cfg, x, output_hidden_states=True)

    return encode
