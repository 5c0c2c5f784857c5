"""Batched-decode roofline breakdown for the flagship 0.8B hybrid (real chip).

The repo's own accounting (training/flops.py::decode_bytes_per_token) says
flagship decode MBU falls 0.74 (b=1) -> ~0.36 (b=32) -> ~0.20 (b=128): the
batched pool that serving runs on leaves ~2x on the bandwidth roofline.
This script is the decode counterpart of the ViT roofline note (COVERAGE):
it times each stage of the decode step IN ISOLATION as an in-graph chained
loop (per-call host timing is ~35 ms tunnel RTT — useless), compares each
against its analytic HBM-traffic floor, and prints the residual the full
step carries on top of the sum of its parts.

Stages (per decode step, flagship config: 24 layers = 18 GDN + 6 attention):
- gdn_state:   18x gated_delta_rule_step on the STACKED (18,b,16,128,128)
               fp32 state with .at[i].set write-back — the model's exact
               access pattern (models/qwen3_5.py:512-522)
- gdn_flat:    same math on 18 SEPARATE state arrays — isolates whether the
               stacked-buffer update costs extra copies
- conv:        18x causal_conv1d_update on the rolling (b,3,6144) taps
               (round 5 re-layout: time on the sublane axis — the prior
               (b,6144,3) layout put k-1=3 on the 128-lane axis and
               measured 28.7x its HBM floor at b=32)
- proj:        every weight matmul of the step (in/out/beta/alpha/gate
               projections, QKV, FFN) on (b,1,d) activations — the
               weight-streaming floor shared by the whole batch
- head:        tied head (b,1024) @ (248320,1024)^T — the 508 MB table
- attn:        6x cached-attention decode (KV write + 1-token SDPA)
- sample:      greedy argmax over (b, 248320) logits
- full:        one apply_text decode step through the real model

Usage: python scripts/profile_decode_roofline.py [b ...]   (default 8 32 128)
"""

import os
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/llm_quest_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from llm_quest_tpu import config
from llm_quest_tpu.models import qwen3_5
from llm_quest_tpu.ops import gdn as gdn_ops
from llm_quest_tpu.training import flops as F

CFG = dict(config.QWEN3_5_08B_CONFIG, dtype=jnp.bfloat16)
N_LAYERS = CFG["n_layers"]
N_GDN = len(qwen3_5.gdn_layer_indices(CFG))
N_ATTN = N_LAYERS - N_GDN
NV, DK, DV = CFG["linear_num_value_heads"], CFG["linear_qk_head_dim"], CFG["linear_value_head_dim"]
D = CFG["emb_dim"]
VOCAB = CFG["vocab_size"]
MAX_LEN = 128
ITERS = 128

PEAK_GBPS = F.device_peaks()["hbm_gbps"]


_NULL_S = None


def _null_overhead():
    """Per-call host/tunnel overhead (dispatch + 1-element readback RTT,
    ~35 ms here): measured once with a trivial program and subtracted from
    every stage — at ITERS=32 it silently added ~1.1 ms/step to EVERY
    stage (the round-5 first-pass numbers had this baked in)."""
    global _NULL_S
    if _NULL_S is None:
        tiny = jax.jit(lambda x: x + 1)
        z = jnp.zeros((8,), jnp.int32)
        np.asarray(tiny(z))
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            np.asarray(tiny(z))
            ts.append(time.perf_counter() - t0)
        _NULL_S = statistics.median(ts)
    return _NULL_S


def timed(fn, n=5):
    fn()  # compile + warm
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return max(statistics.median(samples) - _null_overhead(), 1e-9) / ITERS


def chain(body, init_carry, const=None):
    """ITERS chained iterations inside one jitted fori_loop (data-dependent
    so XLA cannot elide or reorder them). ``const`` (weights etc.) is passed
    as a REAL jit argument — a closed-over array would be captured as a
    compile-time constant and XLA constant-folds it (a 1.5 GB params tree
    makes the compile effectively never finish)."""

    @jax.jit
    def run(carry, cst):
        return lax.fori_loop(0, ITERS, lambda i, c: body(i, c, cst), carry)

    def call(carry=init_carry):
        out = run(carry, const)
        jax.block_until_ready(out)
        leaf = jax.tree.leaves(out)[0]
        np.asarray(jax.tree.leaves(out)[-1].reshape(-1)[:1])  # force a real transfer
        return leaf

    return call


def row(name, t_s, bytes_floor, extra=""):
    floor = bytes_floor / (PEAK_GBPS * 1e9)
    print(
        f"  {name:<11} {t_s * 1e6:9.1f} us/step   floor {floor * 1e6:8.1f} us"
        f"   ({bytes_floor / 1e6:8.1f} MB)   x{t_s / floor if floor else float('inf'):5.2f}"
        f"  {extra}"
    )
    return t_s, floor


def profile(b):
    print(f"\n=== batch {b} ===")
    key = jax.random.PRNGKey(0)
    results = {}

    # ---- gdn_state: stacked-state access pattern (the model's) ----
    state = jnp.zeros((N_GDN, b, NV, DV, DK), jnp.float32)
    q = jax.random.normal(key, (b, NV, DK), jnp.bfloat16)
    v = jax.random.normal(key, (b, NV, DV), jnp.bfloat16)
    beta = jax.nn.sigmoid(jax.random.normal(key, (b, NV)))
    alpha = jax.nn.sigmoid(jax.random.normal(key, (b, NV)))

    def gdn_stacked_body(it, carry, _):
        st, o = carry
        qq = q + o[:, :, :DK].astype(q.dtype) * 1e-30  # chain dependency
        for i in range(N_GDN):
            out, new = gdn_ops.gated_delta_rule_step(qq, qq, v, beta, alpha, st[i])
            st = st.at[i].set(new)
        return st, out.astype(jnp.float32)

    t = timed(chain(gdn_stacked_body, (state, jnp.zeros((b, NV, DV)))))
    sbytes = N_GDN * b * NV * DV * DK * 4
    results["gdn_state"] = row("gdn_state", t, 2 * sbytes, f"(state {sbytes / 1e6:.0f} MB, floor = 1R+1W)")

    # ---- gdn_flat: same math, separate per-layer arrays ----
    states = tuple(jnp.zeros((b, NV, DV, DK), jnp.float32) for _ in range(N_GDN))

    def gdn_flat_body(it, carry, _):
        sts, o = carry
        qq = q + o[:, :, :DK].astype(q.dtype) * 1e-30
        new_sts = []
        for st in sts:
            out, new = gdn_ops.gated_delta_rule_step(qq, qq, v, beta, alpha, st)
            new_sts.append(new)
        return tuple(new_sts), out.astype(jnp.float32)

    t = timed(chain(gdn_flat_body, (states, jnp.zeros((b, NV, DV)))))
    results["gdn_flat"] = row("gdn_flat", t, 2 * sbytes)

    # ---- gdn_kernel: the fused IN-PLACE stacked Pallas step kernel ----
    # (the sliced-operand variant measured 2x SLOWER than XLA: handing
    # pallas st[i] makes XLA materialize slice + DUS copies around the
    # opaque call — the stacked kernel takes the whole buffer + index)
    if jax.default_backend() == "tpu":
        from llm_quest_tpu.kernels.gdn_pallas import gated_delta_rule_step_stacked_pallas

        st5 = jnp.zeros((N_GDN, b, NV, DV, DK), jnp.float32)

        def gdn_kernel_body(it, carry, _):
            st, o = carry
            qq = q + o[:, :, :DK].astype(q.dtype) * 1e-30
            for i in range(N_GDN):
                out, st = gated_delta_rule_step_stacked_pallas(qq, qq, v, beta, alpha, st, i)
            return st, out.astype(jnp.float32)

        t = timed(chain(gdn_kernel_body, (st5, jnp.zeros((b, NV, DV)))))
        results["gdn_kernel"] = row("gdn_kernel", t, 2 * sbytes, "(in-place stacked: 1R+1W per layer)")

    # free the GDN stage buffers before the param-heavy stages — at b=128
    # three live 2.4 GB state copies OOM the full-model stage
    del states
    if jax.default_backend() == "tpu":
        del st5

    # ---- conv: rolling depthwise taps ----
    _, _, fused = qwen3_5._fused_dims(CFG)
    ksz = CFG["linear_conv_kernel_size"]
    conv_params = gdn_ops.init_conv1d(key, fused, ksz, dtype=jnp.bfloat16)
    conv_state = jnp.zeros((N_GDN, b, ksz - 1, fused), jnp.bfloat16)
    x_t = jax.random.normal(key, (b, fused), jnp.bfloat16)

    def conv_body(it, carry, cp):
        st, o = carry
        xx = x_t + o * 1e-30
        for i in range(N_GDN):
            o, new = gdn_ops.causal_conv1d_update(cp, xx, st[i])
            st = st.at[i].set(new)
        return st, o

    t = timed(chain(conv_body, (conv_state, jnp.zeros((b, fused), jnp.bfloat16)), conv_params))
    cbytes = 2 * N_GDN * b * fused * (ksz - 1) * 2
    results["conv"] = row("conv", t, cbytes)

    # ---- proj: the per-step weight matmuls (weight streaming floor) ----
    params = qwen3_5.init_text(jax.random.PRNGKey(0), CFG)
    blocks = params["blocks"]
    h0 = jax.random.normal(key, (b, D), jnp.bfloat16)

    def proj_body(it, h, bl):
        from llm_quest_tpu.ops.linear import linear

        for i, blk in enumerate(bl):
            a = blk["att"]
            if qwen3_5.is_gdn_layer(CFG, i):
                f = linear(a["w_qkv"], h)
                bta = linear(a["w_beta"], h) + linear(a["w_alpha"], h)
                g = linear(a["w_gate"], h)
                ctx = f[:, : NV * DV] * (1e-30 * (bta[:, :1] + g[:, :1]))
                h = h + linear(a["out_proj"], ctx + g)
            else:
                qg = linear(a["wqg"], h)
                kk = linear(a["wk"], h) + linear(a["wv"], h)
                h = h + linear(a["out_proj"], qg[:, : CFG["n_heads"] * CFG["head_dim"]] + kk[:, :1] * 1e-30)
            f = blk["ffn"]
            h = h + linear(f["down"], jax.nn.silu(linear(f["gate"], h)) * linear(f["up"], h))
        return h * 1e-3

    t = timed(chain(proj_body, h0, blocks))
    pbytes = F.param_bytes(blocks)
    results["proj"] = row("proj", t, pbytes, f"(block weights {pbytes / 1e9:.2f} GB)")

    # ---- head: tied LM head on the 248k-row table ----
    from llm_quest_tpu.ops.linear import tied_head

    def head_body(it, h, emb):
        logits = tied_head(emb, h[:, None, :])
        return h + logits[:, 0, :1].astype(h.dtype) * 1e-30

    t = timed(chain(head_body, h0, params["tok_emb"]))
    hbytes = VOCAB * D * 2
    results["head"] = row("head", t, hbytes, f"(table {hbytes / 1e6:.0f} MB)")

    # ---- attn: 6x cached attention decode step ----
    kvc = {
        "k": jnp.zeros((N_ATTN, b, CFG["num_kv_groups"], MAX_LEN, CFG["head_dim"]), jnp.bfloat16),
        "v": jnp.zeros((N_ATTN, b, CFG["num_kv_groups"], MAX_LEN, CFG["head_dim"]), jnp.bfloat16),
        "conv": jnp.zeros((N_GDN, b, fused, ksz - 1), jnp.bfloat16),
        "recurrent": jnp.zeros((N_GDN, b, NV, DV, DK), jnp.float32),
        "pos": jnp.full((), MAX_LEN // 2, jnp.int32),
    }
    cos, sin = qwen3_5.rope_tables(CFG)
    from llm_quest_tpu.inference import cache as kv_cache
    from llm_quest_tpu.ops.masks import causal_mask

    attn_blocks = [blocks[i]["att"] for i in qwen3_5.attn_layer_indices(CFG)]
    pids = jnp.broadcast_to(jnp.full((1, b, 1), MAX_LEN // 2, jnp.int32), (3, b, 1))

    def attn_body(it, carry, ab):
        cache, h = carry
        mask = causal_mask(1, MAX_LEN, q_start=cache["pos"], attn_mask=None)
        hn = h[:, None, :]
        for idx, a in enumerate(ab):
            def kv_view(k_new, v_new, idx=idx):
                nonlocal cache
                cache, kc, vc = kv_cache.write_layer(cache, idx, k_new, v_new, cache["pos"])
                return kc, vc

            out = qwen3_5.mrope_attention(a, CFG, hn, mask, cos, sin, pids, kv_view)
            hn = hn + out * 1e-30
        return cache, hn[:, 0, :]

    t = timed(chain(attn_body, (kvc, h0), attn_blocks))
    abytes = (2 * N_ATTN * b * CFG["num_kv_groups"] * (MAX_LEN // 2) * CFG["head_dim"] * 2
              + F.param_bytes(attn_blocks))
    results["attn"] = row("attn", t, abytes, "(KV read at pos=64 + attn weights)")

    # ---- sample: greedy argmax over the vocab ----
    logits = jax.random.normal(key, (b, VOCAB), jnp.bfloat16)

    def sample_body(it, carry, _):
        tok = jnp.argmax(logits + carry[:, None].astype(jnp.bfloat16) * 1e-30, axis=-1)
        return tok.astype(jnp.float32)

    t = timed(chain(sample_body, jnp.zeros((b,), jnp.float32)))
    lbytes = b * VOCAB * 2
    results["sample"] = row("sample", t, lbytes, "(XLA variadic argmax)")

    from llm_quest_tpu.ops.sampling import greedy_argmax

    def sample2_body(it, carry, _):
        tok = greedy_argmax(logits + carry[:, None].astype(jnp.bfloat16) * 1e-30)
        return tok.astype(jnp.float32)

    t = timed(chain(sample2_body, jnp.zeros((b,), jnp.float32)))
    results["sample2"] = row("sample2", t, lbytes, "(two-stage greedy_argmax)")

    # ---- full: the real model decode step ----
    del state, conv_state, kvc
    cache0 = qwen3_5.init_cache(CFG, b, MAX_LEN)
    # advance pos to mid-cache so attention reads a realistic KV span
    cache0 = {**cache0, "pos": jnp.full((), MAX_LEN // 2, jnp.int32)}
    tok0 = jnp.zeros((b, 1), jnp.int32)

    def full_body(it, carry, pp):
        cache, tok = carry
        logits, cache, _ = qwen3_5.apply_text(pp, CFG, tok, cache=cache)
        # hold pos fixed so ITERS iterations never overflow the cache
        cache = {**cache, "pos": cache["pos"] - 1}
        return cache, jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]

    t = timed(chain(full_body, (cache0, tok0), params))
    fbytes = (
        2 * sbytes + cbytes + F.param_bytes(params) + abytes + lbytes
    )
    results["full"] = row("full", t, fbytes, "(sum of floors incl. head+emb weights)")

    parts = sum(results[k][0] for k in ("gdn_state", "conv", "proj", "head", "attn", "sample"))
    print(f"  {'sum(parts)':<11} {parts * 1e6:9.1f} us/step   residual in full: "
          f"{(results['full'][0] - parts) * 1e6:+9.1f} us")
    tok_s = b / results["full"][0]
    print(f"  full-step throughput {tok_s:,.0f} tok/s | MBU(r+w) "
          f"{F.mbu(tok_s, fbytes / b):.3f}")
    return results


if __name__ == "__main__":
    batches = [int(a) for a in sys.argv[1:]] or [8, 32, 128]
    for b in batches:
        profile(b)
