"""LoRA family: classic LoRA, LoRA-XS, TinyLoRA — as params-tree transforms.

Behavioral parity with the reference (common/lora.py):
- LoRA (:9-64): y = xW + α/r·xAB; A ~ N(0, 0.02), B zero-init
- LoRA-XS (:92-157): frozen A = U_r·Σ_r, B = V_rᵀ from the truncated SVD of
  W; trainable (r, r) R ~ N(0, 1e-5); y = xW + α/r·xARB
- TinyLoRA (:160-244): R = (v @ P_flat).reshape(r, r) from u trainable
  scalars v and fixed N(0,1) matrices P; optional v tied across layers
- replace_with_lora (:69-89): recursive wrap of every linear

TPU redesign — no module wrappers: ``replace_with_lora`` augments matching
linear param dicts with a "lora" sub-dict; ``ops.linear.linear`` applies the
delta when present. Freezing is an OPTIMIZER concern in functional JAX:
``lora_trainable_mask`` yields the bool pytree for ``optax.masked`` so only
A/B (LoRA), R (XS) or v (Tiny) receive updates.

TinyLoRA v-tying: separate leaves can't alias in a pytree, so tying is two
helpers — ``inject_shared_v`` broadcasts one vector into every tiny-LoRA
layer before apply, and the tied gradient is the SUM of the per-layer v
grads (exactly what autodiff of a shared parameter yields).
"""

import jax
import jax.numpy as jnp
import numpy as np


def init_lora(key, linear_params, r, alpha, *, dtype=None):
    """Classic LoRA sub-dict for a linear {"w": (d, k)} (or int8 {"w_q"})."""
    w = linear_params["w"] if "w" in linear_params else linear_params["w_q"]
    dtype = dtype or (w.dtype if "w" in linear_params else linear_params["w_scale"].dtype)
    d, k = w.shape
    return {
        "A": (0.02 * jax.random.normal(key, (d, r))).astype(dtype),
        "B": jnp.zeros((r, k), dtype),
        "scale": jnp.asarray(alpha / r, jnp.float32),
    }


def init_lora_xs(key, linear_params, r, alpha, *, dtype=None):
    """LoRA-XS: frozen truncated-SVD A/B, trainable R."""
    w = _dense_weight(linear_params)
    dtype = dtype or w.dtype
    u, s, vt = np.linalg.svd(np.asarray(w, np.float32), full_matrices=False)
    return {
        "A": jnp.asarray(u[:, :r] @ np.diag(s[:r]), dtype),  # frozen
        "B": jnp.asarray(vt[:r, :], dtype),  # frozen
        "R": (1e-5 * jax.random.normal(key, (r, r))).astype(dtype),
        "scale": jnp.asarray(alpha / r, jnp.float32),
    }


def init_tiny_lora(key, linear_params, r, alpha, *, num_trainable_params=13, shared_v=False, dtype=None):
    """TinyLoRA: frozen SVD A/B + fixed P; trainable v (absent when tied —
    inject via inject_shared_v before apply)."""
    w = _dense_weight(linear_params)
    dtype = dtype or w.dtype
    u, s, vt = np.linalg.svd(np.asarray(w, np.float32), full_matrices=False)
    params = {
        "A": jnp.asarray(u[:, :r] @ np.diag(s[:r]), dtype),
        "B": jnp.asarray(vt[:r, :], dtype),
        "P": jax.random.normal(key, (num_trainable_params, r * r)).astype(dtype),
        "scale": jnp.asarray(alpha / r, jnp.float32),
    }
    if not shared_v:
        params["v"] = jnp.zeros((num_trainable_params,), dtype)
    return params


def lora_delta(lora, x):
    """The low-rank update α/r · x·(update) for any variant (by structure).

    Stacked multi-adapter form (``stack_adapters``): leaves carry a leading
    adapter axis and ``lora["idx"]`` holds each batch row's adapter id
    (``select_adapter``) — row i's delta uses adapter idx[i], computed as a
    per-row gather + batched einsums (x must be (b, s, d))."""
    if getattr(lora["A"], "ndim", 0) == 3:  # stacked multi-adapter
        idx = lora["idx"]  # (b,) int32 — select_adapter pinned it
        r = int(lora["A"].shape[-1])
        # rows = axis 0; fold any middle axes into one so (b, d) decode-step
        # inputs and (b, s, d) prefill inputs go through the same einsums
        shape = x.shape
        xs = x.reshape(shape[0], -1, shape[-1])
        scale = lora["scale"][idx].astype(x.dtype)[:, None, None]
        A = lora["A"][idx].astype(x.dtype)  # (b, d, r)
        xa = jnp.einsum("bsd,bdr->bsr", xs, A)
        if "P" in lora:  # TinyLoRA
            R = jnp.einsum("bk,bkq->bq", lora["v"][idx], lora["P"][idx]).reshape(-1, r, r)
            xa = jnp.einsum("bsr,brq->bsq", xa, R.astype(x.dtype))
        elif "R" in lora:  # LoRA-XS
            xa = jnp.einsum("bsr,brq->bsq", xa, lora["R"][idx].astype(x.dtype))
        out = scale * jnp.einsum("bsr,bro->bso", xa, lora["B"][idx].astype(x.dtype))
        return out.reshape(shape[:-1] + (out.shape[-1],))
    scale = lora["scale"].astype(x.dtype)
    if "v" in lora or "P" in lora:  # TinyLoRA
        r = int(lora["A"].shape[-1])
        R = (lora["v"] @ lora["P"]).reshape(r, r)
        return scale * (x @ lora["A"] @ R.astype(x.dtype) @ lora["B"])
    if "R" in lora:  # LoRA-XS
        return scale * (x @ lora["A"] @ lora["R"] @ lora["B"])
    return scale * (x @ lora["A"] @ lora["B"])  # classic


def _is_linear(node):
    if not isinstance(node, dict):
        return False
    if "w" in node and hasattr(node["w"], "ndim") and node["w"].ndim == 2:
        return True
    # weight-only int8 linears (ops/quantization.py): {"w_q", "w_scale"} —
    # the LoRA delta is dtype-independent of the base matmul, so adapters
    # wrap quantized checkpoints too (the common serving deployment)
    return "w_q" in node and hasattr(node["w_q"], "ndim") and node["w_q"].ndim == 2


def _dense_weight(linear_params):
    """The (in, out) fp32 weight of a plain or int8-quantized linear —
    LoRA-XS/Tiny need it for their SVD init."""
    if "w" in linear_params:
        return linear_params["w"]
    from llm_quest_tpu.ops.quantization import dequantize_int8

    return dequantize_int8(linear_params["w_q"], linear_params["w_scale"])


def replace_with_lora(key, params, rank, alpha, *, variant="lora", path_filter=None, **kw):
    """Walk the params tree, augment every matching 2-D linear with a "lora"
    sub-dict (reference: lora.py:69-89). path_filter(path_str) → bool limits
    the wrap (e.g. lambda p: "att" in p). Paths containing "conv" or "emb"
    never wrap regardless of the filter: their 2-D weights look like linears
    but are not applied through ops.linear.linear (the reference wraps
    nn.Linear modules only), so a delta there would merge but never apply."""
    init_fn = {"lora": init_lora, "lora_xs": init_lora_xs, "tiny_lora": init_tiny_lora}[variant]
    counter = [0]

    def walk(node, path):
        skip = "conv" in path.rsplit("/", 1)[-1] or "emb" in path.rsplit("/", 1)[-1]
        if not skip and _is_linear(node) and (path_filter is None or path_filter(path)):
            counter[0] += 1
            sub = jax.random.fold_in(key, counter[0])
            return {**node, "lora": init_fn(sub, node, rank, alpha, **kw)}
        if isinstance(node, dict):
            return {k: walk(v, f"{path}/{k}") for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, f"{path}/{i}") for i, v in enumerate(node)]
        return node

    return walk(params, "")


def lora_trainable_mask(params):
    """Bool pytree: True only on trainable LoRA leaves (A/B, R, or v).
    Freeze the rest via
    ``optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()},
    jax.tree.map(lambda m: "train" if m else "freeze", mask))``."""

    def walk(node, in_lora=False, siblings=()):
        if isinstance(node, dict):
            return {
                k: walk(v, in_lora or k == "lora", tuple(node.keys())) for k, v in node.items()
            }
        if isinstance(node, list):
            return [walk(v, in_lora, siblings) for v in node]
        return False

    def mark(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if k == "lora" and isinstance(v, dict):
                if "v" in v:
                    trainable = {"v"}
                elif "R" in v:
                    trainable = {"R"}
                else:
                    trainable = {"A", "B"}
                out[k] = {kk: (kk in trainable) for kk in v}
            elif isinstance(v, dict):
                out[k] = mark(v)
            elif isinstance(v, list):
                out[k] = [mark(x) for x in v]
            else:
                out[k] = False
        return out

    return mark(params)


def inject_shared_v(params, v):
    """Tie one TinyLoRA v across all layers: set it on every tiny-LoRA dict
    missing (or holding) "v". Gradient of the tied v = SUM over layers."""

    def walk(node):
        if isinstance(node, dict):
            if "P" in node and "A" in node and "B" in node:  # tiny lora dict
                return {**node, "v": v}
            return {k: walk(x) for k, x in node.items()}
        if isinstance(node, list):
            return [walk(x) for x in node]
        return node

    return walk(params)


def collect_shared_v_grad(grads):
    """Sum the per-layer v grads (the tied-parameter gradient)."""
    total = None

    def walk(node):
        nonlocal total
        if isinstance(node, dict):
            if "P" in node and "v" in node:
                total = node["v"] if total is None else total + node["v"]
            for x in node.values():
                walk(x)
        elif isinstance(node, list):
            for x in node:
                walk(x)

    walk(grads)
    return total


# ---------------------------------------------------------- multi-adapter
# Multi-LoRA serving (beyond the reference, vLLM-style): many adapters over
# one base model, selected PER ROW of a batch. Adapters stack along a new
# leading axis inside each "lora" sub-dict; ``select_adapter`` pins a (b,)
# index vector and ``lora_delta`` gathers each row's adapter — a tiny
# (b, d, r) gather + two batched einsums, fully jitted, no ragged grouping.


def stack_adapters(adapter_params):
    """Stack n same-rank adapter params trees (each from ``replace_with_lora``
    over the SAME base params) into ONE tree whose "lora" sub-dicts carry a
    leading adapter axis, with a NULL adapter (zero update) appended at index
    n — requests without an adapter select it. Base (non-lora) leaves are
    taken from the first tree."""
    first = adapter_params[0]

    def walk(nodes):
        node = nodes[0]
        if isinstance(node, dict):
            out = {}
            for k in node:
                if k == "lora":
                    lora = {}
                    for leaf in node[k]:
                        rows = [n[k][leaf] for n in nodes]
                        null = jnp.zeros_like(rows[0]) if leaf != "scale" else rows[0]
                        lora[leaf] = jnp.stack(rows + [null])
                    out[k] = lora
                else:
                    out[k] = walk([n[k] for n in nodes])
            return out
        if isinstance(node, list):
            return [walk([n[i] for n in nodes]) for i in range(len(node))]
        return node

    del first
    return walk(list(adapter_params))


def num_adapters(params):
    """Number of stacked adapters (incl. the null) in a stacked-LoRA params
    tree, or 0 if the tree carries no stacked adapters."""
    found = [0]

    def walk(node):
        if isinstance(node, dict):
            if "lora" in node and getattr(node["lora"].get("A"), "ndim", 0) == 3:
                found[0] = node["lora"]["A"].shape[0]
                return
            for v in node.values():
                walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)

    walk(params)
    return found[0]


def select_adapter(params, idx):
    """Pin per-row adapter indices ``idx`` (b,) int32 into every stacked
    "lora" sub-dict (as "idx"), so ``lora_delta`` gathers row i's adapter.
    A pure tree transform — call INSIDE jit with a traced idx."""

    def walk(node):
        if isinstance(node, dict):
            if "lora" in node and getattr(node["lora"].get("A"), "ndim", 0) == 3:
                return {**node, "lora": {**node["lora"], "idx": idx}}
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)


def merge_adapter(params, j):
    """Dense-merge stacked adapter ``j`` into the base weights (w + scale·U)
    and drop the lora dicts — the single-adapter deployment form and the
    parity oracle for per-row selection."""

    def update(lora):
        A, B = lora["A"][j], lora["B"][j]
        if "P" in lora:  # TinyLoRA
            r = A.shape[-1]
            R = (lora["v"][j] @ lora["P"][j]).reshape(r, r)
            U = A @ R.astype(A.dtype) @ B
        elif "R" in lora:  # LoRA-XS
            U = A @ lora["R"][j] @ B
        else:
            U = A @ B
        return lora["scale"][j].astype(U.dtype) * U

    def walk(node):
        if isinstance(node, dict):
            if "lora" in node and getattr(node["lora"].get("A"), "ndim", 0) == 3:
                rest = {k: v for k, v in node.items()
                        if k not in ("lora", "w", "w_q", "w_scale")}
                u = update(node["lora"])
                # int8 base merges DENSE (dequant + update, fp32): the merged
                # form is the parity oracle / deployment convenience, not a
                # round-trip back to int8
                base = _dense_weight(node)
                return {**walk(rest), "w": (base + u.astype(base.dtype)).astype(base.dtype)}
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)
