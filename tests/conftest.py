"""Per-module JAX cache clearing.

The full matrix (~300 tests) compiles many hundreds of XLA:CPU programs in
one process; three independent full-matrix runs segfaulted in native XLA
code (LLVM compile / executable serialize / deserialize) around the ~90%
mark while every involved test file passes in isolation — in-process
accumulation of resident executables is the common factor, not any one
program (reproduced with the persistent compile cache both on and off).

Clearing JAX's compilation caches between test MODULES bounds that
accumulation. Cross-module sharing is minimal anyway (each file uses its
own tiny configs/shapes), so the wall-clock cost is small; module-internal
caching — where the real reuse is — is untouched.
"""

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    import jax

    jax.clear_caches()
