"""ViT→GPT-2 VLM captioning training entry script
(reference: multimodal/vlm_training.py): frozen ViT, trains GPT-2 + adapter.
Flickr-style data when provided; synthetic images/captions fallback.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from llm_quest_tpu import config
from llm_quest_tpu.data.datasets import multimodal_batches
from llm_quest_tpu.models import gpt2, vit
from llm_quest_tpu.multimodal import vlm

BATCH_SIZE = 4
NUM_EPOCHS = 2
LR = 1e-4
ADAPTER_TYPE = "ffn"


class _ByteTok:
    def encode(self, t):
        return [b % 50000 for b in t.encode()]


if __name__ == "__main__":
    vit_cfg = dict(config.TINY_VIT_CONFIG)
    llm_cfg = dict(config.GPT_SMALL_CONFIG, context_length=512)

    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, size=(32, 32, 32, 3), dtype=np.uint8)
    captions = [f"a synthetic image number {i}" for i in range(32)]
    batches = multimodal_batches(images, captions, _ByteTok(), BATCH_SIZE)

    vit_params = vit.init(jax.random.PRNGKey(0), vit_cfg)  # frozen (or load a trained ckpt)
    llm_params = gpt2.init(jax.random.PRNGKey(1), llm_cfg)
    adapter = vlm.init_adapter(jax.random.PRNGKey(2), vit_cfg["emb_dim"], llm_cfg["emb_dim"],
                               adapter_type=ADAPTER_TYPE)

    optimizer = optax.adamw(LR)
    opt_state = optimizer.init((adapter, llm_params))

    @jax.jit
    def train_step(adapter, llm_params, opt_state, batch):
        def loss_fn(trainable):
            a, lp = trainable
            return vlm.vlm_forward_loss(vit, vit_params, vit_cfg, a, lp, llm_cfg, batch)

        loss, grads = jax.value_and_grad(loss_fn)((adapter, llm_params))
        updates, opt_state = optimizer.update(grads, opt_state, (adapter, llm_params))
        adapter, llm_params = optax.apply_updates((adapter, llm_params), updates)
        return adapter, llm_params, opt_state, loss

    for epoch in range(1, NUM_EPOCHS + 1):
        for batch in batches:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            adapter, llm_params, opt_state, loss = train_step(adapter, llm_params, opt_state, batch)
        print(f"epoch {epoch} loss {float(loss):.4f}")

    # caption generation demo
    tokens = vlm.vlm_generate(
        vit, vit_params, vit_cfg, adapter, llm_params, llm_cfg,
        jnp.asarray(batches[0]["image"][:1]), bos_id=1, max_gen=10,
    )
    print("generated token ids:", tokens[0].tolist())
