"""llm_quest_tpu — a TPU-native (JAX/XLA/Pallas/pjit) LLM framework.

Brand-new implementation of the full capability surface of casinca/LLM-quest
(reference mounted read-only at /root/reference), redesigned TPU-first:

- functional core: parameters are pytrees, models are pure ``init``/``apply`` fns
- static-shape KV / hybrid caches threaded through ``lax.scan`` decode loops
- pjit/``jax.sharding`` parallelism over device meshes (DP/TP/EP)
- Pallas kernels for hot inner ops (attention, GatedDeltaNet recurrence)

Layer map (mirrors the reference's layering, SURVEY.md §1):
  config  →  data  →  ops/common  →  models  →  generate  →  engines  →  scripts
"""

__version__ = "0.1.0"
