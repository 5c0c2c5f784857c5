"""Infra tests: checkpointing, profiling meter, datasets, classifier engine."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from llm_quest_tpu.data import datasets as ds
from llm_quest_tpu.models import gpt2
from llm_quest_tpu.training.checkpointing import load_checkpoint, save_checkpoint, save_if_best
from llm_quest_tpu.training.classifier import (
    classifier_accuracy,
    make_classifier_eval_step,
    make_classifier_train_step,
)
from llm_quest_tpu.training.profiling import ThroughputMeter
from llm_quest_tpu.utils import CheckpointEvaluator

TINY = {"vocab_size": 64, "context_length": 32, "emb_dim": 16, "n_heads": 2, "n_layers": 1,
        "drop_rate": 0.0, "qkv_bias": False}


class CharTok:
    def encode(self, text):
        return [min(b, 63) for b in text.encode()]

    def decode(self, ids):
        return bytes(int(i) for i in ids).decode(errors="ignore")


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    params = gpt2.init(jax.random.PRNGKey(0), TINY)
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)
    path = save_checkpoint(str(tmp_path / "ckpt"), params, opt_state=opt_state, step=7)
    restored = load_checkpoint(path)
    diffs = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
                         params, restored["params"])
    assert max(jax.tree.leaves(diffs)) == 0.0
    assert int(restored["step"]) == 7
    assert "opt_state" in restored


def test_save_if_best_gating(tmp_path):
    params = {"w": jnp.ones((2,))}
    ev = CheckpointEvaluator(kl_div_threshold=0.5, min_reward_threshold=6.0)
    assert not save_if_best(str(tmp_path / "a"), ev, "rlhf", {"kl": 0.9, "reward": 10.0}, params)
    assert save_if_best(str(tmp_path / "b"), ev, "rlhf", {"kl": 0.1, "reward": 8.0}, params)
    assert load_checkpoint(str(tmp_path / "b"))["params"]["w"].shape == (2,)


def test_throughput_meter():
    m = ThroughputMeter()
    m.update(1000)
    r = m.report()
    assert r["tok_s_interval"] > 0 and r["tok_s_cumulative"] > 0


def test_spam_dataset_and_classifier_engine(tmp_path):
    rows = [("buy cheap pills now", 1), ("hi mom how are you", 0), ("free money claim prize", 1),
            ("see you at dinner", 0)]
    data = ds.spam_dataset(rows, CharTok())
    assert data["input_ids"].shape[0] == 4
    assert data["attn_mask"].dtype == bool
    # consistent max_length reuse for the val set
    val = ds.spam_dataset(rows[:2], CharTok(), max_length=data["max_length"])
    assert val["input_ids"].shape[1] == data["max_length"]

    # classifier engine end-to-end on the toy task
    params = gpt2.init(jax.random.PRNGKey(0), TINY)
    batch = {k: jnp.asarray(v) for k, v in data.items() if k != "max_length"}
    optimizer = optax.adamw(1e-3)
    opt_state = optimizer.init(params)
    # binary task: model head has 64 classes, labels 0/1 still valid targets
    step = make_classifier_train_step(gpt2, TINY, optimizer)
    _, _, loss0 = step(params, opt_state, batch)
    for _ in range(40):
        params, opt_state, loss = step(params, opt_state, batch)
    assert float(loss) < float(loss0)
    eval_step = make_classifier_eval_step(gpt2, TINY)
    assert classifier_accuracy([batch], eval_step, params) >= 0.5


def test_reasoning_dataset(tmp_path):
    path = tmp_path / "gsm8k.jsonl"
    entries = [{"question": "What is 2+2?", "answer": "2 plus 2 equals 4.\n#### 4"}]
    path.write_text("\n".join(json.dumps(e) for e in entries))
    out = ds.reasoning_dataset(str(path), CharTok())
    assert len(out) == 1
    assert out[0]["answer"].strip() == "4"  # raw gold answer from <answer> tags (unsanitized, reference parity)
    assert isinstance(out[0]["prompt"], list)


def test_preference_dataset(tmp_path):
    path = tmp_path / "pref.json"
    entries = [{"instruction": "Greet", "input": "", "chosen": "Hello!", "rejected": "Go away."}]
    path.write_text(json.dumps(entries))
    out = ds.preference_dataset(str(path), CharTok())
    assert set(out[0]) == {"prompt", "chosen", "rejected"}
    assert len(out[0]["chosen"]) > len(out[0]["prompt"])  # includes prompt + response
    prompts = ds.preference_dataset(str(path), CharTok(), prompts_only=True)
    assert prompts[0] == out[0]["prompt"]


def test_rpt_structured_dataset():
    entries = [{"question": "Count to five:", "answer": "one two three four five\n#### five"}]

    class ByteTok:  # full byte range — host-side only, no vocab clamp needed
        def encode(self, t):
            return list(t.encode())

        def decode(self, ids):
            return bytes(int(i) for i in ids).decode(errors="ignore")

    tok = ByteTok()
    samples, allowed, getter = ds.rpt_structured_dataset(
        entries, tok, max_context_length=256, labels_length=5, min_context_tokens=3
    )
    assert len(allowed) > 0
    item = getter(0)
    assert isinstance(item["prompt"], list) and isinstance(item["labels"], str)
    # labels are the continuation right after the context
    s_idx, t_idx = allowed[0]
    want = tok.decode(samples[0][t_idx + 1 : t_idx + 6])
    assert item["labels"] == want
    # answer reformatted to <answer> tags
    assert "<answer>five</answer>" in tok.decode(samples[0])


def test_normalize_images():
    imgs = (np.ones((2, 8, 8, 3)) * 255).astype(np.uint8)
    out = ds.normalize_images(imgs)
    assert out.shape == (2, 3, 8, 8)
    # value 1.0 normalized by CIFAR stats
    np.testing.assert_allclose(out[0, 0, 0, 0], (1.0 - 0.4914) / 0.2470, rtol=1e-4)


def test_multimodal_batches():
    imgs = np.zeros((4, 8, 8, 3), np.uint8)
    caps = ["a cat", "a dog", "a bird", "a fish"]
    batches = ds.multimodal_batches(imgs, caps, CharTok(), batch_size=2)
    assert len(batches) == 2
    assert batches[0]["image"].shape == (2, 3, 8, 8)
    assert batches[0]["input_ids"].shape[0] == 2
    assert batches[0]["attention_mask"].dtype == bool


def test_debug_checks_catches_nans_and_restores_flags():
    import jax
    import jax.numpy as jnp
    import pytest as _pytest

    from llm_quest_tpu.training.profiling import debug_checks

    with debug_checks():
        with _pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x))(jnp.float32(-1.0)).block_until_ready()
    assert jax.config.jax_debug_nans is False


def test_rpt_dataset_chat_template():
    from llm_quest_tpu.data.datasets import rpt_structured_dataset

    class ChatTok:
        def encode(self, t):
            return [ord(c) % 97 for c in t][:80]

        def decode(self, ids):
            return "".join(chr(97 + int(i) % 26) for i in ids)

        def apply_chat_template(self, messages, *, tokenize, add_generation_prompt, enable_thinking):
            assert messages[0]["role"] == "user" and add_generation_prompt
            wrapped = "<u>" + messages[0]["content"] + "<g>"
            if tokenize:
                return [1, 2] + self.encode(messages[0]["content"]) + [3]
            return wrapped  # string form: getter re-encodes the combined turn

    entries = [{"question": "Count 1 2 3 4 5 6 7 8", "answer": "nine\n#### 9"}]
    tok = ChatTok()
    _, allowed, getter = rpt_structured_dataset(
        entries, tok, 64, labels_length=4, apply_chat_template=True, min_context_tokens=2
    )
    item = getter(0)
    # the template wraps instruction+context COMBINED (context inside the user
    # turn, before the generation prompt — reference dataset.py:705-720), so
    # the prompt is the encoding of "<u>" + instruction + context + "<g>"
    assert item["prompt"][: len(tok.encode("<u>"))] == tok.encode("<u>")
    s_idx, t_idx = allowed[0]
    assert item["prompt"] == tok.encode("<u>" + _RPT_INSTR_PLUS_CTX(tok, entries, t_idx) + "<g>")[:80]
    assert isinstance(item["labels"], str)


def _RPT_INSTR_PLUS_CTX(tok, entries, t_idx):
    from llm_quest_tpu.data.datasets import RPT_DEFAULT_INSTRUCTION

    solution, _, answer = entries[0]["answer"].rpartition("\n#### ")
    full = entries[0]["question"] + "\n\n" + f"{solution} So the answer is <answer>{answer}</answer>"
    ctx = tok.decode(tok.encode(full)[: t_idx + 1])
    return RPT_DEFAULT_INSTRUCTION + ctx


def test_prefetch_to_device_order_and_errors():
    """data/prefetch.py: batches arrive in order, already on device; an
    iterator exception re-raises at the consumer; mesh shardings apply."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from llm_quest_tpu.data.prefetch import prefetch_to_device
    from llm_quest_tpu.parallel import create_mesh

    batches = [{"x": np.full((8, 4), i, np.float32), "i": np.int32(i)} for i in range(5)]
    got = list(prefetch_to_device(iter(batches), size=2))
    assert len(got) == 5
    for i, b in enumerate(got):
        assert isinstance(b["x"], jax.Array) and int(b["i"]) == i
        assert float(b["x"][0, 0]) == i

    # mesh placement via a per-batch shardings callable (DP over "data")
    if jax.device_count() >= 8:
        mesh = create_mesh(8, model_parallel=2)

        def shardings(batch):
            def spec(x):
                nd = getattr(x, "ndim", 0)
                return NamedSharding(mesh, P("data", *([None] * (nd - 1))) if nd else P())

            return jax.tree.map(spec, batch)

        got = list(prefetch_to_device(iter(batches), sharding=shardings))
        assert got[3]["x"].sharding.spec[0] == "data"
        np.testing.assert_array_equal(np.asarray(got[3]["x"]), batches[3]["x"])

    def bad():
        yield batches[0]
        raise RuntimeError("loader broke")

    it = prefetch_to_device(bad(), size=2)
    next(it)
    with pytest.raises(RuntimeError, match="loader broke"):
        next(it)


@pytest.mark.slow
def test_async_checkpoint_overlaps_training(tmp_path):
    """Async save: the scheduled checkpoint snapshots the state AT SCHEDULING
    time, training continues (donating/updating params) while serialization
    runs in the background, and the restore matches the snapshot exactly —
    not the mutated post-save params."""
    from llm_quest_tpu.training.checkpointing import wait_for_saves

    params = gpt2.init(jax.random.PRNGKey(0), TINY)
    snapshot = jax.tree.map(np.asarray, params)  # host copy for the oracle

    path = save_checkpoint(str(tmp_path / "async_ckpt"), params, step=3, blocking=False)
    # keep "training": overwrite params several times while the save runs
    for i in range(4):
        params = jax.tree.map(lambda x: x + 1.0 + i, params)
    wait_for_saves()

    restored = load_checkpoint(path)
    diffs = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a) - b).max()),
                         restored["params"], snapshot)
    assert max(jax.tree.leaves(diffs)) == 0.0
    assert int(restored["step"]) == 3

    # a second async save to the same path supersedes the first
    save_checkpoint(path, params, step=4, blocking=False)
    wait_for_saves()
    assert int(load_checkpoint(path)["step"]) == 4


def test_flops_accounting_sane():
    """Analytic FLOPs cross-checked against the 2·N-params rule of thumb
    and known published magnitudes (ViT-B/16 @224 ≈ 17.6 GMACs = 35 GFLOPs)."""
    import jax
    import jax.numpy as jnp

    from llm_quest_tpu import config
    from llm_quest_tpu.models import qwen3_5
    from llm_quest_tpu.training import flops as F

    vit = F.vit_flops_per_image(dict(config.VIT_BASE_CONFIG))
    assert 33e9 < vit < 38e9, vit

    cfg = dict(config.QWEN3_5_08B_CONFIG)
    f = F.text_forward_flops_per_token(cfg, kv_len=64)
    params = qwen3_5.init_text(
        jax.random.PRNGKey(0), dict(cfg, dtype=jnp.bfloat16, n_layers=2)
    )
    # full-depth param count from the 2-layer init (cheap): emb + L·per-layer
    n2 = sum(x.size for x in jax.tree.leaves(params))
    emb = cfg["vocab_size"] * cfg["emb_dim"]
    n_full = emb + (n2 - emb) * cfg["n_layers"] // 2
    # matmul FLOPs/token ≈ 2(N−emb) + 2·emb (head): within 15% of analytic
    approx = 2 * (n_full - emb) + 2 * emb
    assert abs(f - approx) / approx < 0.15, (f, approx)

    # train step = 3× forward
    assert F.text_train_flops_per_token(cfg, seq_len=128) == 3 * F.text_forward_flops_per_token(cfg, kv_len=64)

    # MFU/MBU are monotone in rate and bounded sanely at known points
    assert 0.6 < F.mfu(3800, vit) < 0.75
    bytes_tok = F.decode_bytes_per_token(params, dict(cfg, n_layers=2), kv_len=64)
    assert bytes_tok > F.param_bytes(params)  # weights + per-seq cache read


def test_scheduled_profiler_schedule(tmp_path, monkeypatch):
    """ScheduledProfiler: wait/warmup untraced, exactly `active` traced steps
    per cycle into logdir/cycle_<k>, `repeat` cycles then inert, and close()
    finalizes an in-flight trace."""
    import llm_quest_tpu.training.profiling as prof

    events = []
    monkeypatch.setattr(prof.jax.profiler, "start_trace", lambda d: events.append(("start", d)))
    monkeypatch.setattr(prof.jax.profiler, "stop_trace", lambda: events.append(("stop", None)))

    with prof.ScheduledProfiler(tmp_path, wait=2, warmup=1, active=2, repeat=2) as p:
        traced = [p.step() for _ in range(12)]

    # per cycle: steps 0-1 wait, 2 warmup, 3-4 traced; two cycles then inert
    assert traced == [False, False, False, True, True] * 2 + [False, False]
    assert [e[0] for e in events] == ["start", "stop", "start", "stop"]
    assert events[0][1].endswith("cycle_0") and events[2][1].endswith("cycle_1")

    events.clear()
    p2 = prof.ScheduledProfiler(tmp_path, wait=0, warmup=0, active=5, repeat=1)
    assert p2.step() and p2.step()  # tracing started, window unfinished
    p2.close()
    assert [e[0] for e in events] == ["start", "stop"]


def test_scheduled_profiler_writes_real_trace(tmp_path):
    """One real cycle through jax.profiler produces an XPlane dump on disk."""
    import glob

    import jax.numpy as jnp

    from llm_quest_tpu.training.profiling import ScheduledProfiler

    x = jnp.ones((8, 8))
    with ScheduledProfiler(tmp_path, wait=1, warmup=0, active=1, repeat=1) as p:
        for _ in range(2):
            float(jnp.sum(x @ x))
            p.step()
    assert glob.glob(str(tmp_path / "cycle_0" / "**" / "*.xplane.pb"), recursive=True)
