"""Rematerialization policy for gradient checkpointing.

The reference trades memory for FLOPs with a fixed recompute-everything
checkpoint (torch.utils.checkpoint semantics). Under XLA the policy is a
tunable: ``jax.checkpoint`` takes a saveable-filter deciding WHICH
intermediates the backward may keep (SURVEY §1 L2 / the scaling-book
remat recipe).

cfg["remat_policy"]:
- "full" (default): save only block inputs — minimum memory, backward
  recomputes every matmul (≈ +1 block forward of FLOPs). The reference's
  behavior.
- "dots": ``dots_with_no_batch_dims_saveable`` — save matmul OUTPUTS,
  recompute only the cheap elementwise chains between them. Less FLOP
  overhead at higher activation memory.
- "none": no remat at all (same as gradient_checkpointing=False) — one
  cfg key to A/B against the policies above.

Measured on v5e-1 (bench.py train workload: ~300M dense, b=4 s=2048
bf16, fused-head CE, float(loss)-synced timing): full 22,845 tok/s
(33% MFU) · dots 24,861 (36%) · none 28,663 (41%). At this scale the
activations fit, so "none" wins; remat is for the configs that don't.
"""

import jax


def checkpoint_block(cfg, fn):
    """Wrap a block function in jax.checkpoint per cfg["remat_policy"]."""
    policy = cfg.get("remat_policy", "full")
    if policy == "none":
        return fn
    if policy == "dots":
        return jax.checkpoint(
            fn, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        )
    return jax.checkpoint(fn)
