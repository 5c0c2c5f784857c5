"""Training engine tests: LR schedule parity, loss plumbing, and a tiny
overfitting run (loss must drop)."""

import numpy as np
import pytest

from llm_quest_tpu.data.datasets import collate_function, data_loader, gpt_windows
from llm_quest_tpu.models import gpt2
from llm_quest_tpu.training import engine


class _CharTok:
    def encode(self, text):
        return [ord(c) % 60 for c in text]


CFG = {
    "vocab_size": 64,
    "context_length": 16,
    "emb_dim": 32,
    "n_heads": 4,
    "n_layers": 2,
    "drop_rate": 0.0,
    "qkv_bias": False,
}


class TestLRSchedule:
    def test_warmup_then_cosine(self):
        sched = engine.make_lr_schedule(
            total_steps=100, init_lr=1e-5, peak_lr=1e-3, warmup_steps=10, min_lr=1e-4, decay="cosine"
        )
        assert float(sched(0)) == pytest.approx(1e-5)
        # linear warmup: step 5 halfway-ish
        assert float(sched(5)) == pytest.approx(1e-5 + (1e-3 - 1e-5) / 10 * 5)
        assert float(sched(10)) == pytest.approx(1e-3, rel=1e-6)  # peak at warmup end
        assert float(sched(100)) == pytest.approx(1e-4, rel=1e-5)  # min at the end

    def test_validation_errors(self):
        with pytest.raises(ValueError):
            engine.make_lr_schedule(10, 1e-3, 1e-4, warmup_steps=5)  # init >= peak
        with pytest.raises(ValueError):
            engine.make_lr_schedule(10, 1e-5, 1e-4, min_lr=1e-3, decay="cosine")  # min >= peak
        with pytest.raises(ValueError):
            engine.make_lr_schedule(10, 1e-5, 1e-4, decay="cosine")  # decay without min_lr
        with pytest.raises(ValueError):
            engine.make_lr_schedule(10, 1e-5, 1e-4, min_lr=1e-5)  # min_lr without decay

    def test_no_warmup_constant(self):
        sched = engine.make_lr_schedule(100, 1e-5, 1e-3, warmup_steps=0)
        assert float(sched(0)) == pytest.approx(1e-3)
        assert float(sched(50)) == pytest.approx(1e-3)


class TestTrainingLoop:
    def test_tiny_overfit(self):
        """Loss on a repetitive corpus must fall substantially."""
        import jax

        text = "abcdefgh " * 80
        inputs, targets = gpt_windows(text, _CharTok(), max_length=16, stride=8)
        loader = data_loader((inputs, targets), batch_size=8, shuffle=True)
        params = gpt2.init(jax.random.PRNGKey(0), CFG)

        logs = []
        params, train_losses, val_losses = engine.training_eval_loop(
            gpt2,
            CFG,
            params,
            loader,
            loader,
            num_epoch=8,
            peak_lr=3e-3,
            warmup_steps=0,
            eval_freq=1000,
            eval_iter=2,
            log=logs.append,
        )
        eval_step = engine.make_eval_step(gpt2, CFG)
        final = engine.calc_loss_loader(loader, eval_step, params, num_batches=3)
        assert final < 1.0, f"did not overfit: final loss {final}"

    def test_collate_function_shapes(self):
        batch = [[1, 2, 3, 4], [5, 6]]
        out = collate_function(batch, pad_token_id=0)
        np.testing.assert_array_equal(out["input_ids"], [[1, 2, 3, 4], [5, 6, 0, 0]])
        np.testing.assert_array_equal(out["targets"], [[2, 3, 4, 0], [6, 0, -100, -100]])
        np.testing.assert_array_equal(out["attn_mask"], [[1, 1, 1, 1], [1, 1, 0, 0]])

    def test_grad_accumulation_runs(self):
        import jax

        text = "abcdefgh " * 40
        inputs, targets = gpt_windows(text, _CharTok(), max_length=16, stride=8)
        loader = data_loader((inputs, targets), batch_size=4)
        params = gpt2.init(jax.random.PRNGKey(0), CFG)
        params, tr, va = engine.training_eval_loop(
            gpt2, CFG, params, loader, loader,
            num_epoch=1, peak_lr=1e-3, accumulation_steps=2,
            eval_freq=1000, eval_iter=1, log=lambda m: None,
        )
        assert np.isfinite(tr[0])


class TestFusedHeadCE:
    def test_matches_plain_cross_entropy(self):
        import jax
        import jax.numpy as jnp

        from llm_quest_tpu.ops.losses import cross_entropy, cross_entropy_fused_head

        key = jax.random.PRNGKey(0)
        b, s, d, v = 2, 37, 16, 97  # non-multiple of chunk
        hidden = jax.random.normal(key, (b, s, d))
        head_w = jax.random.normal(jax.random.PRNGKey(1), (d, v))
        targets = jax.random.randint(jax.random.PRNGKey(2), (b, s), 0, v)
        targets = targets.at[0, :5].set(-100)  # ignored slots

        ref = cross_entropy((hidden @ head_w).reshape(-1, v), targets.reshape(-1))
        got = cross_entropy_fused_head(hidden, head_w, targets, chunk_size=16)
        assert abs(float(ref) - float(got)) < 1e-5

        # gradients match too (rematerialized backward)
        g_ref = jax.grad(lambda h: cross_entropy((h @ head_w).reshape(-1, v), targets.reshape(-1)))(hidden)
        g_got = jax.grad(lambda h: cross_entropy_fused_head(h, head_w, targets, chunk_size=16))(hidden)
        assert float(jnp.abs(g_ref - g_got).max()) < 1e-5


@pytest.mark.slow
@pytest.mark.parametrize("model_name", ["qwen3", "gpt2"])
def test_fused_head_ce_train_step_matches_plain(model_name):
    """fused_head_ce train step == plain step (same loss, same update).

    gpt2 covers the untied bias-free head (head_weights returns out.w);
    qwen3 covers the tied-embedding head."""
    import jax
    import jax
    import jax.numpy as jnp
    import optax

    from llm_quest_tpu.models import qwen3
    from llm_quest_tpu.training.engine import make_optimizer, make_train_step

    if model_name == "gpt2":
        model, cfg = gpt2, dict(CFG)
    else:
        model = qwen3
        cfg = {
            "model_type": "dense", "vocab_size": 128, "context_length": 64, "emb_dim": 32,
            "n_layers": 2, "n_heads": 4, "num_kv_groups": 2, "head_dim": 8, "hidden_dim": 64,
            "rope_base": 10_000, "tie_embeddings": True, "dtype": jnp.float32,
        }
    params = model.init(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(1e-3)
    opt_state = optimizer.init(params)
    x = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg["vocab_size"])
    batch = {"input_ids": x, "targets": jnp.roll(x, -1, -1)}
    rng = jax.random.PRNGKey(0)

    plain = make_train_step(model, cfg, optimizer)
    fused = make_train_step(model, cfg, optimizer, fused_head_ce=True)
    # train steps DONATE (params, opt_state) — pass fresh copies to each
    copy = lambda t: jax.tree.map(lambda x: x + 0, t)
    p1, _, l1 = plain(copy(params), copy(opt_state), batch, rng)
    p2, _, l2 = fused(copy(params), copy(opt_state), batch, rng)
    assert abs(float(l1) - float(l2)) < 1e-5
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), p1, p2)
    assert max(jax.tree.leaves(diffs)) < 1e-4  # Adam amplifies fp32 summation-order noise


@pytest.mark.slow
def test_training_loop_async_checkpoints(tmp_path):
    """checkpoint_every: the loop schedules async saves and the final state
    restores bit-exact (params AND optimizer state), resumable at `step`."""
    import numpy as np

    from llm_quest_tpu.training.checkpointing import load_checkpoint

    import jax
    import jax
    import jax.numpy as jnp

    cfg = dict(CFG)
    params = gpt2.init(jax.random.PRNGKey(0), cfg)
    data = [
        {"input_ids": np.full((2, 8), i % 60, np.int32),
         "targets": np.full((2, 8), (i + 1) % 60, np.int32)}
        for i in range(6)
    ]
    path = str(tmp_path / "loop_ckpt")
    out_params, tr, va = engine.training_eval_loop(
        gpt2, cfg, params, data, data[:2], num_epoch=1, eval_freq=100,
        eval_iter=1, checkpoint_every=2, checkpoint_path=path,
    )
    restored = load_checkpoint(path)
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(jnp.asarray(a) - jnp.asarray(b)))),
        restored["params"], out_params,
    )
    assert max(jax.tree.leaves(diffs)) == 0.0
    assert int(restored["step"]) == 6
    assert "opt_state" in restored


def test_training_loop_scheduled_profiler(tmp_path):
    """profiler=: the loop drives a ScheduledProfiler once per optimizer
    step and a real XPlane trace lands for the active window."""
    import glob

    import jax

    from llm_quest_tpu.training.profiling import ScheduledProfiler

    cfg = dict(CFG)
    params = gpt2.init(jax.random.PRNGKey(0), cfg)
    data = [
        {"input_ids": np.full((2, 8), i % 60, np.int32),
         "targets": np.full((2, 8), (i + 1) % 60, np.int32)}
        for i in range(5)
    ]
    with ScheduledProfiler(tmp_path, wait=1, warmup=1, active=2, repeat=1) as p:
        engine.training_eval_loop(
            gpt2, cfg, params, data, data[:2], num_epoch=1, eval_freq=100,
            eval_iter=1, profiler=p,
        )
    assert glob.glob(str(tmp_path / "cycle_0" / "**" / "*.xplane.pb"), recursive=True)


def test_qwen3_next_train_step_capacity_dispatch_matches_exact():
    import jax
    import jax.numpy as jnp
    """cfg["moe_capacity_factor"] threads into the hybrid train step; with
    capacity >= worst case the loss equals the exact ragged dispatch, and
    inference (cache decode) always keeps the exact path regardless."""
    import numpy as np

    from llm_quest_tpu import config as cfg_mod
    from llm_quest_tpu.models import qwen3_next
    from llm_quest_tpu.training.engine import make_optimizer, make_train_step

    base = dict(
        cfg_mod.QWEN3_NEXT_SMALL_CONFIG,
        n_layers=4, emb_dim=64, head_dim=16, n_heads=4, num_kv_groups=2,
        linear_num_qk_heads=2, linear_num_value_heads=4,
        linear_qk_head_dim=16, linear_value_head_dim=16,
        moe_hidden_dim=96, shared_expert_hidden_dim=96, num_experts=4, top_k=2,
        vocab_size=256, context_length=64, dtype=jnp.float32, p_dropout=0.0,
        gradient_checkpointing=False,
    )
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 33)), jnp.int32)
    batch = {"input_ids": ids[:, :-1], "targets": ids[:, 1:]}
    rng = jax.random.PRNGKey(1)

    losses = {}
    for name, cf in (("exact", None), ("cap", 4.0)):
        cfg = dict(base)
        if cf is not None:
            cfg["moe_capacity_factor"] = cf
        params = qwen3_next.init(jax.random.PRNGKey(0), cfg)
        optimizer = make_optimizer(1e-3)
        step = make_train_step(qwen3_next, cfg, optimizer, fused_head_ce=True)
        _, _, loss = step(params, optimizer.init(params), batch, rng)
        losses[name] = float(loss)
    assert abs(losses["exact"] - losses["cap"]) < 1e-4, losses
