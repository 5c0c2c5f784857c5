"""Device-mesh construction.

One mesh serves the whole framework; axis names are the contract every
sharding rule is written against:

  "data"  — DP axis (batch dim of activations; grads psum here)
  "model" — TP axis (head/hidden/vocab dims of weights)

On a v5e-8 slice the default is (data=4, model=2); on a single chip both axes
collapse to 1 and every sharding becomes a no-op replication, so the same
jitted program runs anywhere.
"""

import jax
import numpy as np
from jax.sharding import Mesh


def local_mesh_shape(n_devices=None, *, model_parallel=None):
    """Pick a (data, model) factorization of n_devices.

    model_parallel: explicit TP degree; default 1 (pure DP) — TP is opt-in
    because at LLM-quest model scales (<2B) DP is the better default.
    """
    n = n_devices if n_devices is not None else jax.device_count()
    tp = model_parallel if model_parallel is not None else 1
    if n % tp != 0:
        raise ValueError(f"n_devices={n} not divisible by model_parallel={tp}")
    return (n // tp, tp)


def create_mesh(n_devices=None, *, model_parallel=None, devices=None):
    """Build a ("data", "model") Mesh over the first n_devices devices."""
    devices = devices if devices is not None else jax.devices()
    n = n_devices if n_devices is not None else len(devices)
    dp, tp = local_mesh_shape(n, model_parallel=model_parallel)
    grid = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(grid, ("data", "model"))
