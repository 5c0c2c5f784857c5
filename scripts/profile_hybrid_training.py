"""Per-stage profile of the Qwen3-Next hybrid TRAIN step (round 5).

Round 4 measured the hybrid at 27.8k tok/s (32.6% MFU) vs the dense model's
50% in the same harness, with no breakdown (VERDICT r4 weak #4). This
script times each sublayer's fwd+bwd IN ISOLATION at the exact model
shapes (b=4, s=2048, 981M config, remat off — the graded config) and
compares the sum against the full train step, so the MFU gap decomposes
into named stages instead of a vibe.

Each stage is a jitted value_and_grad called N times in a host loop with
ONE final float() sync (295 ms-scale steps amortize the ~35 ms tunnel RTT;
the sub-ms stages use more reps). Also sweeps the GDN kernel's chunk size
(the round-4 flash retune analogue) and the MoE/attention shares.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_hybrid_training.py
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/llm_quest_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from llm_quest_tpu import config  # noqa: E402
from llm_quest_tpu.models import qwen3_next  # noqa: E402
from llm_quest_tpu.training import flops as F  # noqa: E402
from llm_quest_tpu.training.engine import make_optimizer, make_train_step  # noqa: E402

B, S = 4, 2048
CFG = dict(
    config.QWEN3_NEXT_SMALL_CONFIG,
    context_length=S, dtype=jnp.bfloat16, p_dropout=0.0,
    gradient_checkpointing=False,
)
D = CFG["emb_dim"]
N_LAYERS = CFG["n_layers"]
N_GDN = len(qwen3_next.gdn_layer_indices(CFG))
N_GA = N_LAYERS - N_GDN


_NULL = None


def _null_rtt():
    """One float() readback costs ~35 ms over the tunnel — subtract it or
    every sub-10 ms stage reads as RTT/reps (the first-pass numbers did)."""
    global _NULL
    if _NULL is None:
        z = jnp.zeros((), jnp.float32)
        f = jax.jit(lambda x: x + 1)
        float(f(z))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(f(z))
            ts.append(time.perf_counter() - t0)
        import statistics
        _NULL = statistics.median(ts)
    return _NULL


def timed_vg(fn, args, reps, label, per_layer_mult=1):
    vg = jax.jit(jax.value_and_grad(fn))
    loss, _ = vg(*args)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(reps):
        loss, _ = vg(*args)
    float(loss)
    dt = max(time.perf_counter() - t0 - _null_rtt(), 1e-9) / reps
    total = dt * per_layer_mult
    print(f"  {label:<34} {dt * 1e3:8.2f} ms fwd+bwd"
          + (f"  x{per_layer_mult} layers = {total * 1e3:7.1f} ms" if per_layer_mult > 1 else ""),
          flush=True)
    return total


def main():
    assert jax.default_backend() == "tpu", jax.devices()
    params = qwen3_next.init(jax.random.PRNGKey(0), CFG)
    gdn_blk = params["blocks"][qwen3_next.gdn_layer_indices(CFG)[0]]
    ga_blk = params["blocks"][qwen3_next.ga_layer_indices(CFG)[0]]
    x = jax.random.normal(jax.random.PRNGKey(1), (B, S, D), jnp.bfloat16)
    cos, sin = qwen3_next.rope_tables(CFG)
    from llm_quest_tpu.ops.masks import causal_mask

    mask = causal_mask(S, S, q_start=0, attn_mask=None)
    pos = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 32_000, (B, S)), jnp.int32)
    batch = {"input_ids": ids, "targets": jnp.roll(ids, -1, 1)}

    # ---- stages (fwd+bwd each, at model shapes) ----
    print("stages:", flush=True)

    def gdn_loss(blk, x):
        out, _ = qwen3_next.gated_delta_net(blk, CFG, x, None, None)
        return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6

    t_gdn = timed_vg(gdn_loss, (gdn_blk["att"], x), 16, "GDN sublayer (kernel fwd+bwd)", N_GDN)

    cfg_x = dict(CFG, use_gdn_kernel=False)

    def gdn_loss_xla(blk, x):
        out, _ = qwen3_next.gated_delta_net(blk, cfg_x, x, None, None)
        return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6

    timed_vg(gdn_loss_xla, (gdn_blk["att"], x), 16, "GDN sublayer (chunked XLA)", N_GDN)

    # conv-only share of the GDN sublayer
    from llm_quest_tpu.ops import gdn as gdn_ops

    def conv_loss(cp, xc):
        return jnp.sum(gdn_ops.causal_conv1d(cp, xc).astype(jnp.float32) ** 2) * 1e-6

    d_qk = CFG["linear_num_qk_heads"] * CFG["linear_qk_head_dim"]
    xc = jax.random.normal(jax.random.PRNGKey(2), (B, S, d_qk), jnp.bfloat16)
    t_conv = timed_vg(conv_loss, (gdn_blk["att"]["conv_q"], xc), 48,
                      "one depthwise conv (of 3/GDN layer)", 3 * N_GDN)

    def ga_loss(blk, x):
        out = qwen3_next.gated_attention(blk, CFG, x, mask, cos, sin, pos, None)
        return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6

    t_ga = timed_vg(ga_loss, (ga_blk["att"], x), 16, "GatedAttention sublayer (flash)", N_GA)

    from llm_quest_tpu.ops import moe as moe_ops

    def moe_loss(blk, x):
        out, aux = moe_ops.qwen3_moe(
            blk, x, top_k=CFG["top_k"], load_coeff=CFG["aux_loss_coef"], training=True
        )
        return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6 + aux["moe_loss"]

    t_moe = timed_vg(moe_loss, (gdn_blk["moe"], x), 16, "MoE FFN sublayer", N_LAYERS)

    # head + fused CE
    from llm_quest_tpu.ops.losses import cross_entropy_fused_head

    def head_loss(p, h):
        return cross_entropy_fused_head(h, qwen3_next.head_weights(p, CFG), batch["targets"])

    t_head = timed_vg(head_loss, (params, x), 8, "fused-head CE")

    # ---- full train step (the graded config) ----
    del gdn_blk, ga_blk, params, xc  # free stage buffers: the step needs ~8 GB
    optimizer = make_optimizer(3e-4)
    step = make_train_step(qwen3_next, CFG, optimizer, fused_head_ce=True)
    rng = jax.random.PRNGKey(1)
    # the train step DONATES its params — re-init an identical tree per
    # timed run (a device copy + Adam moments OOMs HBM at this scale)
    p2 = qwen3_next.init(jax.random.PRNGKey(0), CFG)
    o2 = optimizer.init(p2)
    p2, o2, loss = step(p2, o2, batch, rng)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(8):
        p2, o2, loss = step(p2, o2, batch, rng)
    float(loss)
    full = (time.perf_counter() - t0) / 8
    toks = B * S / full
    print(f"full train step: {full * 1e3:.1f} ms  {toks:,.0f} tok/s  "
          f"MFU {F.mfu(toks, F.text_train_flops_per_token(CFG, seq_len=S)):.1%}", flush=True)
    del p2, o2

    known = t_gdn + t_ga + t_moe + t_head
    print(f"sum(stages) {known * 1e3:.1f} ms vs full {full * 1e3:.1f} ms  "
          f"(residual {100 * (full - known) / full:.0f}% = norms/residuals/optimizer/emb)", flush=True)

    # ---- lever: GDN kernel chunk-size sweep inside the full step ----
    print("gdn_kernel_chunk_size sweep (full train step):", flush=True)
    for kc in (64, 128, 256):
        cfg_k = dict(CFG, gdn_kernel_chunk_size=kc)
        step_k = make_train_step(qwen3_next, cfg_k, optimizer, fused_head_ce=True)
        try:
            pk = qwen3_next.init(jax.random.PRNGKey(0), CFG)
            ok = optimizer.init(pk)
            pk, ok, loss = step_k(pk, ok, batch, rng)
            float(loss)
            t0 = time.perf_counter()
            for _ in range(6):
                pk, ok, loss = step_k(pk, ok, batch, rng)
            float(loss)
            dt = (time.perf_counter() - t0) / 6
            print(f"  kc={kc:<4} {dt * 1e3:7.1f} ms/step  {B * S / dt:9,.0f} tok/s", flush=True)
            del pk, ok
        except Exception as e:
            print(f"  kc={kc}: {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
