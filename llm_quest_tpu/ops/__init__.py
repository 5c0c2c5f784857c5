"""Shared ops: the functional building blocks every model is assembled from.

Conventions
-----------
- Parameters are nested dicts of jnp arrays (pytrees).
- Every op is a pair of pure functions: ``init_*(key, ...) -> params`` and the
  apply fn ``*(params, x, ...) -> out``. No hidden state, no in-place mutation.
- Mask polarity follows the reference convention: boolean masks are
  True = MASKED (see masks.py).
"""
