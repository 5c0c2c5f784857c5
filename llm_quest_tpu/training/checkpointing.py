"""Checkpoint save/load via Orbax + best-checkpoint gating.

Reference behavior (SURVEY §5.4): plain torch.save of model_state_dict
(+optionally optimizer) with conditional best-checkpoint saving via
CheckpointEvaluator (utils.py:323-394). TPU redesign: Orbax PyTree
checkpointing (sharded-array aware, async-capable), same gated-save policy
through utils.CheckpointEvaluator.

Step/optimizer-state resume (absent from the reference) comes for free:
save_checkpoint accepts the full train state.
"""

import os

_ASYNC = None  # singleton AsyncCheckpointer (owns a background thread pool)


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def _async_checkpointer():
    global _ASYNC
    if _ASYNC is None:
        import orbax.checkpoint as ocp

        _ASYNC = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC


def save_checkpoint(path, params, *, opt_state=None, step=None, extra=None,
                    blocking=True):
    """Save a train-state pytree. path: directory (created if needed).

    blocking=False schedules an ASYNC save: device arrays are snapshotted
    to host immediately (so training may donate/overwrite them the very
    next step) and the serialization runs on Orbax's background thread —
    the train loop never waits on disk. Call ``wait_for_saves()`` before
    reading the checkpoint back (or at loop end); a second async save
    transparently waits for the previous one first (Orbax serializes on
    its own commit thread)."""
    state = {"params": params}
    if opt_state is not None:
        state["opt_state"] = opt_state
    if step is not None:
        state["step"] = step
    if extra is not None:
        state["extra"] = extra
    path = os.path.abspath(path)
    if not blocking:
        _async_checkpointer().save(path, state, force=True)
        return path
    _checkpointer().save(path, state, force=True)
    return path


def wait_for_saves():
    """Block until every scheduled async save has committed to disk."""
    if _ASYNC is not None:
        _ASYNC.wait_until_finished()


def load_checkpoint(path, *, target=None):
    """Load a train-state pytree.

    target: optional matching pytree of sharded ``jax.Array``s or
    ``jax.ShapeDtypeStruct``s carrying ``.sharding`` — each leaf is restored
    DIRECTLY onto its NamedSharding (each host/chip reads only its own
    shards; no full-array host materialization), and the returned tree keeps
    the target's container types (e.g. optax namedtuples). Without a target,
    the raw saved tree is returned fully replicated on the default device —
    fine for single-chip reference parity, wrong for mesh-resumed training.
    """
    path = os.path.abspath(path)
    if target is None:
        import warnings

        with warnings.catch_warnings():
            # Orbax warns that it populates sharding from the checkpoint's
            # sharding file on targetless restores — here that IS the intent
            # (single-process replicated load); mesh-topology restores must
            # pass `target` and never reach this branch.
            warnings.filterwarnings("ignore", message="Sharding info not provided")
            return _checkpointer().restore(path)
    import jax
    import orbax.checkpoint as ocp

    def _abstract(x):
        if isinstance(x, jax.ShapeDtypeStruct):
            return x
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        return x  # python scalars (step counters) pass through

    abstract = jax.tree.map(_abstract, target)
    restore_args = ocp.checkpoint_utils.construct_restore_args(abstract)
    return _checkpointer().restore(
        path, ocp.args.PyTreeRestore(item=abstract, restore_args=restore_args)
    )


def save_if_best(path, evaluator, kind, metrics, params, **kw):
    """Gated best-checkpoint save (reference: CheckpointEvaluator usage,
    grpo_engine.py:947-951, rlvr_engine.py:396-400).

    kind: "rlhf" | "rlvr" (metrics: {"kl", "reward"}) or "rm"
    (metrics: {"accuracy", "val_loss"}). Returns True if saved.
    """
    if kind in ("rlhf", "rlvr"):
        fn = evaluator.is_rlhf_grpo_best if kind == "rlhf" else evaluator.is_rlvr_grpo_best
        best = fn(metrics["kl"], metrics["reward"])
    elif kind == "rm":
        best = evaluator.is_rm_accu_best(metrics["accuracy"], metrics["val_loss"])
    else:
        raise ValueError(f"Unknown checkpoint kind: {kind}")
    if best:
        save_checkpoint(path, params, **kw)
    return best
