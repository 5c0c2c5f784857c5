"""Hyper-connections: classic HC, DeepSeek mHC (Sinkhorn-Knopp), mHC-lite (BvN).

Behavioral parity with the reference (common/hyper_connections/ + utils.py):

- classic HC (hyper_connections.py:15-345): n-stream expansion; H_res from a
  zero-init θ linear (emb→n) + tanh·α (α=0.01) + identity bias; H_pre
  (emb→1, bias 1/n); H_post (emb→1, bias 1s)
- mHC (manifold_hyper_connections.py:25-133, 246-460): H_res from a
  flattened-streams linear (n·emb→n²), exp → Sinkhorn-Knopp doubly
  stochastic; bias init I·8−8 so exp(bias) ≈ I; H_pre/H_post sigmoid-
  constrained with biases −ln(n−1) / 0 (·2 rescale for post)
- mHC-lite (:135-244): H_res = Σ aₖ·Pₖ — a softmax convex combination of
  the n! permutation matrices (Birkhoff–von Neumann), bias −8 except the
  identity permutation at 0
- SinkhornKnopp (utils.py:657-801) / BirkhoffvonNeumann (utils.py:804-915)
- fp32 coefficient islands (HCCoeffsFP32Mixin, utils.py:632-650): all H
  math in fp32, streams cast back

TPU notes: Sinkhorn-Knopp runs a FIXED iteration count under jit (the
reference's early-exit epsilon check is a host-sync anti-pattern on TPU;
20 iterations of two row/col normalizations are trivially cheap).
"""

import itertools
import math

import jax
import jax.numpy as jnp
import numpy as np


def sinkhorn_knopp(p, *, max_iter=20):
    """Doubly-stochastic projection of non-negative (..., n, n) matrices."""
    p32 = p.astype(jnp.float32)

    def body(_, m):
        m = m / jnp.sum(m, axis=-1, keepdims=True)  # rows
        m = m / jnp.sum(m, axis=-2, keepdims=True)  # cols
        return m

    return jax.lax.fori_loop(0, max_iter, body, p32).astype(p.dtype)


def permutation_matrices(n):
    """All n! permutation matrices, flattened (n!, n·n) + identity index."""
    perms = list(itertools.permutations(range(n)))
    eye = np.eye(n, dtype=np.float32)
    mats = np.stack([eye[list(p)] for p in perms]).reshape(len(perms), n * n)
    identity_index = perms.index(tuple(range(n)))
    return jnp.asarray(mats), identity_index


def bvn_compose(weights, flat_permut_matrices, n):
    """H = Σ aₖ·Pₖ as one matmul. weights: (..., n!)."""
    h = weights @ flat_permut_matrices.astype(weights.dtype)
    return h.reshape(*weights.shape[:-1], n, n)


# ---------------------------------------------------------------- classic HC


def init_hc_set(emb_dim, n, *, dtype=jnp.float32):
    """Params for one HC bundle (res+pre+post) — all dynamic mappings
    zero-init, α=0.01, biases per the papers. Norm scale included."""
    del dtype  # H coefficients live in fp32 (HCCoeffsFP32Mixin parity)
    return {
        "norm": {"scale": jnp.ones((emb_dim,), jnp.float32)},
        "res": {"w": jnp.zeros((emb_dim, n), jnp.float32), "factor": jnp.asarray([0.01], jnp.float32),
                "bias": jnp.eye(n, dtype=jnp.float32)},
        "pre": {"w": jnp.zeros((emb_dim, 1), jnp.float32), "factor": jnp.asarray([0.01], jnp.float32),
                "bias": jnp.full((n,), 1.0 / n, jnp.float32)},
        "post": {"w": jnp.zeros((emb_dim, 1), jnp.float32), "factor": jnp.asarray([0.01], jnp.float32),
                 "bias": jnp.ones((n,), jnp.float32)},
    }


def hc_res_matrix(p, x_norm):
    """H_res: (b, s, n, n) = tanh((x_norm·W)ᵀ)·α + I (reference: :67-91)."""
    x = (x_norm.astype(jnp.float32) @ p["w"]).swapaxes(-1, -2)  # (b, s, n, n): WXᵀ
    return jnp.tanh(x) * p["factor"] + p["bias"]


def hc_pre_vector(p, x_norm):
    """(b, s, 1, n) stream-aggregation weights."""
    x = (x_norm.astype(jnp.float32) @ p["w"])[..., 0]  # (b, s, n)
    return (jnp.tanh(x) * p["factor"] + p["bias"])[..., None, :]


def hc_post_vector(p, x_norm):
    """(b, s, n, 1) broadcast weights."""
    x = (x_norm.astype(jnp.float32) @ p["w"])[..., 0]
    return (jnp.tanh(x) * p["factor"] + p["bias"])[..., None]


# ----------------------------------------------------------------------- mHC


def init_mhc_set(emb_dim, n, *, lite=False, dtype=jnp.float32):
    del dtype
    params = {
        "norm": {"scale": jnp.ones((n * emb_dim,), jnp.float32)},
        "pre": {"w": jnp.zeros((n * emb_dim, n), jnp.float32), "factor": jnp.asarray([0.01], jnp.float32),
                "bias": jnp.full((n,), -math.log(n - 1) if n > 1 else 10.0, jnp.float32)},
        "post": {"w": jnp.zeros((n * emb_dim, n), jnp.float32), "factor": jnp.asarray([0.01], jnp.float32),
                 "bias": jnp.zeros((n,), jnp.float32)},
    }
    if lite:
        num_permuts = math.factorial(n)
        flat, identity_idx = permutation_matrices(n)
        bias = jnp.full((num_permuts,), -8.0, jnp.float32).at[identity_idx].set(0.0)
        params["res"] = {"w": jnp.zeros((n * emb_dim, num_permuts), jnp.float32),
                         "factor": jnp.asarray([0.01], jnp.float32), "bias": bias}
        params["_bvn_flat"] = flat  # fixed buffer (non-trainable)
    else:
        params["res"] = {"w": jnp.zeros((n * emb_dim, n * n), jnp.float32),
                         "factor": jnp.asarray([0.01], jnp.float32),
                         "bias": jnp.eye(n, dtype=jnp.float32) * 8.0 - 8.0}
    return params


def mhc_res_matrix(p, x_norm_flat, n, *, sk_iters=20):
    """mHC H_res: exp(lin·α + bias) → Sinkhorn-Knopp (reference: :88-113)."""
    b, s, _ = x_norm_flat.shape
    x = (x_norm_flat.astype(jnp.float32) @ p["res"]["w"]).reshape(b, s, n, n)
    x = x * p["res"]["factor"] + p["res"]["bias"]
    return sinkhorn_knopp(jnp.exp(x), max_iter=sk_iters)


def mhc_lite_res_matrix(p, x_norm_flat, n):
    """mHC-lite H_res: softmax over n! permutation weights → BvN combo
    (reference: :199-224)."""
    x = x_norm_flat.astype(jnp.float32) @ p["res"]["w"]
    x = x * p["res"]["factor"] + p["res"]["bias"]
    weights = jax.nn.softmax(x, axis=-1)
    return bvn_compose(weights, p["_bvn_flat"], n)


def mhc_pre_vector(p, x_norm_flat):
    x = x_norm_flat.astype(jnp.float32) @ p["pre"]["w"] * p["pre"]["factor"] + p["pre"]["bias"]
    return jax.nn.sigmoid(x)[..., None, :]  # (b, s, 1, n)


def mhc_post_vector(p, x_norm_flat):
    x = x_norm_flat.astype(jnp.float32) @ p["post"]["w"] * p["post"]["factor"] + p["post"]["bias"]
    return (jax.nn.sigmoid(x) * 2.0)[..., None]  # (b, s, n, 1)


# --------------------------------------------------------- sub-block wiring


def _rms(scale, x, eps=1e-6):
    x32 = x.astype(jnp.float32)
    ms = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return scale * x32 * jax.lax.rsqrt(ms + eps)


def hc_wrap(hc_params, x, sub_block_fn, *, hc_type="hc", n=4, sk_iters=20):
    """One HC-wrapped sub-block (attention or FFN):
    residual = H_res·x; y = sub_block_fn(H_pre·x); out = residual + H_post·y
    (reference: hyper_qwen3.py:129-160). x: (b, s, n, d) streams."""
    b, s, _, d = x.shape
    dt = x.dtype
    x32 = x.astype(jnp.float32)

    if hc_type == "hc":
        x_norm = _rms(hc_params["norm"]["scale"], x)
        residual = hc_res_matrix(hc_params["res"], x_norm) @ x32
        single = (hc_pre_vector(hc_params["pre"], x_norm) @ x32)[..., 0, :]
        post = hc_post_vector(hc_params["post"], x_norm)
    else:
        x_flat = _rms(hc_params["norm"]["scale"], x.reshape(b, s, -1))
        if hc_type == "mhc":
            residual = mhc_res_matrix(hc_params, x_flat, n, sk_iters=sk_iters) @ x32
        else:  # mhc-lite
            residual = mhc_lite_res_matrix(hc_params, x_flat, n) @ x32
        single = (mhc_pre_vector(hc_params, x_flat) @ x32)[..., 0, :]
        post = mhc_post_vector(hc_params, x_flat)

    y = sub_block_fn(single.astype(dt))  # (b, s, d)
    out = residual + post * y.astype(jnp.float32)[..., None, :]
    return out.astype(dt)
