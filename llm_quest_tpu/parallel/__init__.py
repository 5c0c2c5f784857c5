"""Parallelism: device meshes, sharding rules, distributed train steps.

Net-new design territory for the TPU build — the reference is explicitly
single-device (reference: qwen3_moe.py:6-7 "no distributed training here").
Design follows the scaling-book recipe: pick a Mesh, annotate parameter /
activation shardings with NamedSharding, and let XLA insert the ICI
collectives (psum for DP grads, all-gather/reduce-scatter for TP).

Axes:
  "data"  — batch sharding (DP); gradients all-reduce over this axis.
            With ``fsdp_specs`` the same axis also shards parameters and
            optimizer state ZeRO-3 style (XLA all-gathers at use sites,
            reduce-scatters the grads).
  "model" — tensor parallelism (TP); attention heads / FFN hidden / vocab
            shard over this axis.
"""

from llm_quest_tpu.parallel.expert_parallel import capacity_for, ep_qwen3_moe
from llm_quest_tpu.parallel.mesh import create_mesh, local_mesh_shape
from llm_quest_tpu.parallel.sharding import (
    batch_sharding,
    fsdp_specs,
    make_sharded_train_step,
    opt_state_shardings,
    replicated,
    shard_opt_state,
    shard_params,
    sharding_rules_gpt2,
    sharding_rules_llama,
)

__all__ = [
    "capacity_for",
    "ep_qwen3_moe",
    "create_mesh",
    "local_mesh_shape",
    "shard_params",
    "shard_opt_state",
    "opt_state_shardings",
    "batch_sharding",
    "replicated",
    "sharding_rules_gpt2",
    "sharding_rules_llama",
    "fsdp_specs",
    "make_sharded_train_step",
]
