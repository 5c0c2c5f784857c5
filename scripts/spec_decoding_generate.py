"""Speculative decoding benchmark entry script
(reference: speculative_decoding/spec_decoding_generate.py): sweeps gamma and
max_gen, reports speedup vs plain decode and tok/s.
"""

import time

import jax
import jax.numpy as jnp

from llm_quest_tpu import config
from llm_quest_tpu.inference import generate as gen
from llm_quest_tpu.inference.spec_decoding import speculative_generate
from llm_quest_tpu.models import gpt2

GAMMAS = (1, 2, 4, 8)
MAX_GENS = (50, 100)
TEMP = 0.0  # greedy (reference benchmark setting)

if __name__ == "__main__":
    target_cfg = dict(config.gpt2_config_creator("gpt_m"), dtype=jnp.bfloat16)
    draft_cfg = dict(config.gpt2_config_creator("gpt_s"), dtype=jnp.bfloat16)
    target = gpt2.init(jax.random.PRNGKey(0), target_cfg)
    draft = gpt2.init(jax.random.PRNGKey(1), draft_cfg)

    prompt = jnp.asarray([[464, 2068, 7586, 21831, 18045, 625, 262]])  # "The quick brown fox jumps over the"

    for max_gen in MAX_GENS:
        # plain target-only baseline
        run_plain = lambda: gen.generate_kv_cache(
            gpt2, target, target_cfg, prompt, max_gen=max_gen, temp=TEMP, eos_ids=-1, pad_id=50256
        )
        jax.block_until_ready(run_plain()["sequences"])  # compile
        t0 = time.perf_counter()
        jax.block_until_ready(run_plain()["sequences"])
        t_plain = time.perf_counter() - t0
        print(f"max_gen={max_gen}  plain: {max_gen / t_plain:.1f} tok/s")

        for gamma in GAMMAS:
            run_spec = lambda: speculative_generate(
                gpt2, target, target_cfg, gpt2, draft, draft_cfg, prompt,
                max_gen=max_gen, draft_max_gen=gamma, temp=TEMP,
            )
            out = run_spec()
            jax.block_until_ready(out["sequences"])  # compile
            t0 = time.perf_counter()
            out = run_spec()
            jax.block_until_ready(out["sequences"])
            t_spec = time.perf_counter() - t0
            n = int(out["num_generated"])
            print(
                f"  gamma={gamma}: {n / t_spec:6.1f} tok/s  speedup {t_plain / t_spec * n / max_gen:.2f}x  "
                f"steps={int(out['num_steps'])}"
            )
