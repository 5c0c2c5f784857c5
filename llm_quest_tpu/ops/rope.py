"""Rotary position embeddings: classic RoPE, NTK-aware + YaRN by-parts scaling,
partial rotation, MRoPE-I (interleaved 3D multimodal), and 2D axial VisionRoPE.

Tables are precomputed once in fp32 (reference: common/rope.py, the behavior
oracle for every formula here) and treated as constants under jit. The
half-split convention is used (rotate halves, not interleaved pairs):
x = [h1, h2] → roped = cos·x + sin·[-h2, h1].

Partial rotation uses floor(head_dim * factor) — note the documented HF
divergence for odd scaled dims (reference: rope.py:8-29).
"""

import jax.numpy as jnp
import numpy as np


def partial_rotation(head_dim, factor):
    """Scaled rotation dim = floor(head_dim * factor) (reference: rope.py:8-29)."""
    assert 0 < factor <= 1.0, "rotation factor must be in (0, 1]"
    return int(head_dim * factor)


def ntk_aware_base_scaling(theta_base, head_dim, ctx_len, old_ctx_len):
    """Fixed NTK-aware θ-base scaling (reference: rope.py:32-36)."""
    return theta_base * (ctx_len / old_ctx_len) ** (head_dim / (head_dim - 2))


def wavelength_scaling(base, head_dim, freq_cfg, ntk_aware=True):
    """YaRN NTK-by-parts smooth frequency scaling across three wavelength
    bands (reference: rope.py:39-94). Returns θ of shape (head_dim//2,)."""
    if ntk_aware:
        base = ntk_aware_base_scaling(base, head_dim, freq_cfg["ctx_len"], freq_cfg["og_ctx_len"])
    i = np.arange(0, head_dim // 2, dtype=np.float32)
    theta = 1.0 / base ** (2 * i / head_dim)

    wavelen = 2 * np.pi / theta
    ratio = freq_cfg["og_ctx_len"] / wavelen

    # low freq (ratio < alpha): full interpolation θ/s; high freq: untouched
    scaled_theta = np.where(ratio < freq_cfg["alpha"], theta / freq_cfg["factor"], theta)

    # medium band: smooth blend γ = clamp((r - α)/(β - α), 0, 1)
    smooth = np.clip((ratio - freq_cfg["alpha"]) / (freq_cfg["beta"] - freq_cfg["alpha"]), 0.0, 1.0)
    smoothed_theta = (1 - smooth) * (theta / freq_cfg["factor"]) + smooth * theta

    is_medium = (ratio >= freq_cfg["alpha"]) & (ratio <= freq_cfg["beta"])
    return np.where(is_medium, smoothed_theta, scaled_theta)


def compute_angles(base, head_dim, ctx_len, *, smooth_scaling_cfg=None, ntk_aware=True, rotation_factor=1.0):
    """Precompute (cos, sin) tables, each (ctx_len, rotation_dim), fp32.

    rotation_dim = head_dim (or floor(head_dim·rotation_factor) for partial
    RoPE). Angles use the half-split layout [θ_0..θ_{d/2-1}, θ_0..θ_{d/2-1}]
    (reference: rope.py:97-168).
    """
    assert head_dim % 2 == 0, "head_dim must be even"
    if rotation_factor != 1.0:
        head_dim = partial_rotation(head_dim, rotation_factor)

    if smooth_scaling_cfg is not None:
        theta = wavelength_scaling(base, head_dim, smooth_scaling_cfg, ntk_aware)
    else:
        i = np.arange(0, head_dim // 2, dtype=np.float32)
        theta = 1.0 / base ** (2 * i / head_dim)

    positions = np.arange(0, ctx_len, dtype=np.float32)
    angles = np.outer(positions, theta)  # (ctx_len, head_dim//2)
    angles = np.concatenate([angles, angles], axis=-1)  # (ctx_len, head_dim)
    return jnp.asarray(np.cos(angles)), jnp.asarray(np.sin(angles))


def rotate_half(x):
    """[-h2, h1] with x split in contiguous halves (reference: rope.py:171-177)."""
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply(x, cos, sin, position_ids=None):
    """Apply RoPE to q or k.

    x: (b, n_heads, s, head_dim). cos/sin: (ctx_len, rotation_dim).
    position_ids: optional (b, s) int positions; if None, positions 0..s-1.
    Partial rotation: if rotation_dim < head_dim, only the first rotation_dim
    features are rotated, the rest pass through (reference: rope.py:180-243).
    """
    head_dim = x.shape[-1]
    rotation_dim = cos.shape[-1]

    if rotation_dim < head_dim:
        x_rest = x[..., rotation_dim:]
        x = x[..., :rotation_dim]

    if position_ids is not None:
        cos_g = cos[position_ids][:, None, :, :].astype(x.dtype)  # (b, 1, s, rot)
        sin_g = sin[position_ids][:, None, :, :].astype(x.dtype)
    else:
        s = x.shape[2]
        cos_g = cos[:s].astype(x.dtype)
        sin_g = sin[:s].astype(x.dtype)

    roped = cos_g * x + sin_g * rotate_half(x)

    if rotation_dim < head_dim:
        return jnp.concatenate([roped, x_rest], axis=-1)
    return roped


def apply_packed(x, cos, sin):
    """RoPE on the PACKED head layout x: (b, s, n_heads, head_dim) — same
    math as ``apply`` with coefficients broadcast over the heads axis. Keeps
    the vision encoders transpose-free (the (b, s, h·d) projection output is
    viewed as (b, s, h, d), roped, and viewed back — all reshape, no copy)."""
    head_dim = x.shape[-1]
    rotation_dim = cos.shape[-1]
    if rotation_dim < head_dim:
        x_rest = x[..., rotation_dim:]
        x = x[..., :rotation_dim]

    s = x.shape[1]
    cos_g = cos[:s].astype(x.dtype)[None, :, None, :]  # (1, s, 1, rot)
    sin_g = sin[:s].astype(x.dtype)[None, :, None, :]
    roped = cos_g * x + sin_g * rotate_half(x)

    if rotation_dim < head_dim:
        return jnp.concatenate([roped, x_rest], axis=-1)
    return roped


def interleave_mrope_coeffs(cos3, sin3, mrope_section):
    """MRoPE-I: interleave chunked [TTT..HHH..WWW] rotary coeffs into
    [T,H,W, T,H,W, ..., T,T] layout (reference: rope.py:246-294;
    https://arxiv.org/abs/2510.23095).

    cos3/sin3: (3, b, s, half_dim). Returns (b, s, half_dim) each.
    T fills every slot by default (positions 0,3,6,... plus any tail); H
    overwrites stride-3 positions starting at 1, W starting at 2.
    """
    half_dim = cos3.shape[-1]
    # slot id within each triplet for every feature index
    feat = np.arange(half_dim)
    sel = np.zeros(half_dim, dtype=np.int64)  # default: T (dim 0)
    h_len = mrope_section[1] * 3
    w_len = mrope_section[2] * 3
    sel[(feat % 3 == 1) & (feat < h_len)] = 1  # H slots
    sel[(feat % 3 == 2) & (feat < w_len)] = 2  # W slots
    sel = jnp.asarray(sel)  # (half_dim,)

    gather = jnp.take_along_axis(
        jnp.moveaxis(cos3, 0, -1),  # (b, s, half_dim, 3)
        sel[None, None, :, None],
        axis=-1,
    )[..., 0]
    gather_sin = jnp.take_along_axis(jnp.moveaxis(sin3, 0, -1), sel[None, None, :, None], axis=-1)[..., 0]
    return gather, gather_sin


def apply_mrope(x, cos, sin, position_ids, mrope_section):
    """Multimodal RoPE with interleaved 3D (T, H, W) sections.

    x: (b, h, s, head_dim); cos/sin: (ctx_len, rotation_dim) standard tables;
    position_ids: (3, b, s) per-dimension positions
    (reference: rope.py:297-358). Text-only input uses identical T=H=W ids,
    which reduces exactly to standard RoPE through this path.
    """
    head_dim = x.shape[-1]
    rotation_dim = cos.shape[-1]
    half_dim = rotation_dim // 2

    cos_half = cos[:, :half_dim]
    sin_half = sin[:, :half_dim]

    chunked_cos = cos_half[position_ids]  # (3, b, s, half_dim)
    chunked_sin = sin_half[position_ids]

    mcos, msin = interleave_mrope_coeffs(chunked_cos, chunked_sin, mrope_section)

    mcos = jnp.concatenate([mcos, mcos], axis=-1)[:, None, :, :].astype(x.dtype)  # (b,1,s,rot)
    msin = jnp.concatenate([msin, msin], axis=-1)[:, None, :, :].astype(x.dtype)

    if rotation_dim < head_dim:
        x_rest = x[..., rotation_dim:]
        x_rot = x[..., :rotation_dim]
        roped = mcos * x_rot + msin * rotate_half(x_rot)
        return jnp.concatenate([roped, x_rest], axis=-1)
    return mcos * x + msin * rotate_half(x)


def compute_angles_2d(base, head_dim, height_patches, width_patches, *, num_frames=1):
    """2D axial VisionRoPE tables (reference: rope.py:399-482; EVA-02 /
    RoPE-Mixed). head_dim split in half: first half encodes rows (y), second
    half columns (x); frequencies shared across axes.

    Returns (cos, sin), each (num_frames * H * W, head_dim), fp32.
    """
    assert head_dim % 4 == 0, "head_dim must be divisible by 4 for 2D RoPE"
    half_dim = head_dim // 2
    i = np.arange(0, half_dim // 2, dtype=np.float32)
    theta = 1.0 / base ** (2 * i / half_dim)

    row_pos, col_pos = np.meshgrid(
        np.arange(height_patches, dtype=np.float32),
        np.arange(width_patches, dtype=np.float32),
        indexing="ij",
    )
    angles_y = np.outer(row_pos.reshape(-1), theta)
    angles_x = np.outer(col_pos.reshape(-1), theta)
    angles_2d = np.concatenate([angles_y, angles_x], axis=-1)  # (H*W, half_dim)

    if num_frames > 1:
        # pure per-frame spatial encoding; temporal awareness comes from MRoPE
        angles_2d = np.tile(angles_2d, (num_frames, 1))

    angles = np.concatenate([angles_2d, angles_2d], axis=-1)  # (T*H*W, head_dim)
    return jnp.asarray(np.cos(angles)), jnp.asarray(np.sin(angles))
