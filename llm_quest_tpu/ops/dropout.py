"""Dropout as an explicit-RNG pure function."""

import jax


def dropout(rng, x, rate, deterministic=True):
    """Inverted dropout. No-op when deterministic or rate == 0."""
    if deterministic or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jax.numpy.where(mask, x / keep, 0.0).astype(x.dtype)
