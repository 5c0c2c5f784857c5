"""Parameter/activation sharding: path-pattern rules → NamedSharding.

The rule engine walks the params pytree, renders each leaf's path as a
"/"-joined string (list indices become their number), and applies the first
matching regex rule's PartitionSpec. Anything unmatched is replicated — the
safe default for norms, biases and small tables.

TP layout (Megatron-style, collectives ride ICI):
  - QKV / FFN-in (gate/up/fc) weights (in, out): shard OUT dim → column
    parallel, activations become head-sharded with no collective.
  - out_proj / FFN-down (down/proj) weights (in, out): shard IN dim → row
    parallel; XLA inserts the psum when the residual add needs replication.
  - embedding (vocab, emb) and LM head (emb, vocab): shard the vocab dim.

DP: batch axis of every input array is sharded over "data"; optimizer states
inherit parameter shardings through jit's sharding propagation.
"""

import re

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def _path_str(path):
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


# Rules are (regex, PartitionSpec); first match wins; None → replicated.

# GPT-2 / ViT param tree: blocks/i/att/{wq,wk,wv,out_proj}, blocks/i/ffn/{fc,proj}
sharding_rules_gpt2 = [
    (r".*/(wq|wk|wv)/w$", P(None, "model")),
    (r".*/out_proj/w$", P("model", None)),
    (r".*/ffn/fc/w$", P(None, "model")),
    (r".*/ffn/proj/w$", P("model", None)),
    (r".*tok_emb/w$", P("model", None)),
    (r".*pos_emb/w$", P(None, None)),
    (r".*/out/w$", P(None, "model")),
]

# Llama/Gemma/Qwen family: att/{wq,wk,wv,out_proj}, ffn/{gate,up,down};
# stacked-expert arrays (n_experts, in, out) shard the EXPERT dim (EP)
sharding_rules_llama = [
    (r".*/(wq|wk|wv|wqg|w_qkv)/w$", P(None, "model")),
    (r".*/out_proj/w$", P("model", None)),
    (r".*/ffn/(gate|up)/w$", P(None, "model")),
    (r".*/ffn/down/w$", P("model", None)),
    (r".*/(experts|routed|shared)/(lin1|gate|lin2)$", P("model", None, None)),  # EP
    (r".*emb/w$", P("model", None)),
    (r".*/out/w$", P(None, "model")),
]


def _spec_for(path, rules, leaf=None):
    s = _path_str(path)
    # int8 checkpoints (ops/quantization.py): "w_q" shards exactly like the
    # "w" it replaced; "w_scale" follows the OUTPUT dim of that rule
    # (per-channel (out,) → P(out_axis); per-block (nb, out) → the block dim
    # follows the contraction axis). The scale epilogue commutes with the
    # row-parallel psum, so this is exact under TP.
    scale = False
    if s.endswith("/w_q"):
        s = s[: -len("/w_q")] + "/w"
    elif s.endswith("/w_scale"):
        scale = True
        s = s[: -len("/w_scale")] + "/w"
    for pat, spec in rules:
        if re.match(pat, s):
            if scale:
                out_axis = spec[-1] if len(spec) else None
                if getattr(leaf, "ndim", 1) == 2:
                    return P(spec[0] if len(spec) > 1 else None, out_axis)
                return P(out_axis)
            return spec
    return P()


def param_specs(params, rules):
    """PartitionSpec pytree matching params, from path-pattern rules."""
    if not isinstance(rules, (list, tuple)):
        return rules  # already a spec pytree (e.g. from fsdp_specs)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for(path, rules, leaf), params
    )


def fsdp_specs(params, rules, mesh, *, axis="data", min_size=None):
    """ZeRO-3-style fully-sharded specs: compose FSDP over the TP rules.

    Each leaf takes its TP spec from ``rules``, then additionally shards its
    LARGEST still-unsharded dim over ``axis`` (when divisible by the axis
    size). Parameters and — through ``shard_opt_state``'s mirroring — both
    Adam moments then live 1/|axis| per chip; XLA's SPMD partitioner inserts
    the all-gather at each weight's use site and reduce-scatters the grads,
    which is exactly the scaling-book FSDP recipe (no hand-written gather
    schedule — the compiler overlaps them with compute).

    Leaves smaller than ``min_size`` (default: 2 × axis size) stay on their
    TP spec: gathering a (64,) norm scale costs more in latency than its
    replication costs in HBM.

    The reference has no distributed training at all (qwen3_moe.py:6-7);
    this axis is net-new TPU design per SURVEY §2.1.
    """
    n = mesh.shape[axis]
    if min_size is None:
        min_size = 2 * n

    def one(path, leaf):
        spec = _spec_for(path, rules, leaf)
        if leaf.size < min_size:
            return spec
        entries = list(spec) + [None] * (leaf.ndim - len(spec))
        # largest dim that is unsharded and divisible by the fsdp axis
        cands = [
            d for d in range(leaf.ndim)
            if entries[d] is None and leaf.shape[d] % n == 0
        ]
        if not cands:
            return spec
        d = max(cands, key=lambda i: leaf.shape[i])
        entries[d] = axis
        return P(*entries)

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(params, mesh, rules):
    """Place a params pytree onto the mesh per the rules (a regex rule list
    or a PartitionSpec pytree from ``fsdp_specs``)."""
    specs = param_specs(params, rules)
    return jax.tree_util.tree_map(
        lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec)), params, specs
    )


def replicated(mesh):
    return NamedSharding(mesh, P())


def batch_sharding(mesh, ndim=2):
    """Shard the leading (batch) dim over "data", replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_batch(batch, mesh):
    """Place a dict batch with leading batch dims onto the data axis."""
    return {k: jax.device_put(v, batch_sharding(mesh, v.ndim)) for k, v in batch.items()}


def opt_state_shardings(optimizer, sharded_params, mesh):
    """NamedSharding pytree for an optax state: param-shaped moment subtrees
    (mu/nu in Adam — same treedef as params) mirror the param shardings;
    everything else (step counters, empty states) is replicated.

    Without this, Adam on a TP-sharded 1B model replicates two full fp32
    moment copies per chip — the dominant HBM cost of training.
    """
    ptd = jax.tree_util.tree_structure(sharded_params)
    pshard = jax.tree_util.tree_map(lambda p: p.sharding, sharded_params)

    def is_param_tree(x):
        return jax.tree_util.tree_structure(x) == ptd

    def assign(node):
        if is_param_tree(node):
            return pshard
        return jax.tree_util.tree_map(lambda _: replicated(mesh), node)

    state_shape = jax.eval_shape(optimizer.init, sharded_params)
    return jax.tree_util.tree_map(assign, state_shape, is_leaf=is_param_tree)


def shard_opt_state(optimizer, sharded_params, mesh, opt_state=None):
    """Initialise (or re-place) optimizer state sharded like the params.

    With ``opt_state=None`` a fresh state is built under jit with explicit
    out_shardings. An existing state (e.g. restored from a checkpoint) is
    placed leaf-by-leaf onto the same shardings instead.
    """
    shardings = opt_state_shardings(optimizer, sharded_params, mesh)
    if opt_state is None:
        return jax.jit(optimizer.init, out_shardings=shardings)(sharded_params)
    return jax.tree_util.tree_map(jax.device_put, opt_state, shardings)


def make_sharded_train_step(model, cfg, optimizer, mesh, rules, *, loss_fn=None):
    """Jitted DP+TP train step with explicit parameter shardings.

    Parameters and optimizer state live sharded on the mesh; the batch arrives
    data-sharded; XLA inserts the grad all-reduce over "data" and the TP
    collectives over "model". Returns (train_step, shard_fn) where shard_fn
    places (params, opt_state) on the mesh.
    """
    from llm_quest_tpu.training.engine import global_loss

    if loss_fn is None:

        def loss_fn(params, batch):
            logits, _, aux = model.apply(params, cfg, batch["input_ids"], attn_mask=batch.get("attn_mask"))
            return global_loss(logits, batch["targets"], aux)

    def shard_fn(params, opt_state=None):
        """Place (params, opt_state) on the mesh; moments mirror param
        shardings (see shard_opt_state). opt_state=None initialises fresh."""
        params = shard_params(params, mesh, rules)
        opt_state = shard_opt_state(optimizer, params, mesh, opt_state)
        return params, opt_state

    from functools import partial

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch):
        import optax

        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step, shard_fn
