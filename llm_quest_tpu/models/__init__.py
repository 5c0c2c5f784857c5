"""Model architectures.

Every model module exposes the same functional contract:

    init(key, cfg) -> params                  (pytree of jnp arrays)
    apply(params, cfg, x, *, attn_mask=None, cache=None, position_ids=None,
          ...) -> (logits, cache)

mirroring the reference's uniform nn.Module forward contract
(e.g. qwen/qwen3/qwen3_model.py:60) in functional form: the cache is explicit
carried state instead of a mutated object, which is what lets the decode loop
live inside one jitted ``lax.scan``.
"""
