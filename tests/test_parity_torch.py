"""Logit parity vs the torch reference implementation — network-free.

Each test instantiates the reference module from /root/reference with a tiny
config, ports its state_dict through weights/ref_torch.py, runs both forwards
in fp32, and asserts max |logit diff| <= 1e-4 (the SURVEY §4 parity bar).
Greedy-generation token parity rides on top for the decode-relevant models.

Oracle for the methodology: reference utils.py:1037-1060
(test_generation_with_weights) and the per-module __main__ fixtures, e.g.
reference qwen3_5_text_model.py:511-569.
"""

import sys

import numpy as np
import pytest

REF_PATH = "/root/reference"
torch = pytest.importorskip("torch")
if REF_PATH not in sys.path:
    sys.path.insert(0, REF_PATH)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from llm_quest_tpu.weights import ref_torch  # noqa: E402

ATOL = 1e-4
_silent = lambda *_: None


def _sd(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def _max_diff(ref_logits, our_logits):
    return float(np.max(np.abs(ref_logits.detach().cpu().numpy() - np.asarray(our_logits))))


def _greedy_ref(model, ids, n, call=None):
    """n greedy tokens from the torch reference via plain uncached argmax."""
    call = call or (lambda m, x: m(x))
    ids = ids.clone()
    with torch.no_grad():
        for _ in range(n):
            logits = call(model, ids)
            ids = torch.cat([ids, logits[:, -1].argmax(-1, keepdim=True)], dim=-1)
    return ids.numpy()


def _greedy_ours(model_mod, params, cfg, ids_np, n):
    from llm_quest_tpu.inference.generate import generate_kv_cache

    out = generate_kv_cache(
        model_mod, params, cfg, jnp.asarray(ids_np), max_gen=n, temp=0.0, eos_ids=-1, pad_id=0
    )
    return np.asarray(out["sequences"])


@pytest.mark.slow
def test_gpt2_parity():
    from llm_quest.gpt.gpt_model import GPTModel

    from llm_quest_tpu.models import gpt2

    cfg = {"vocab_size": 128, "context_length": 64, "emb_dim": 64, "n_heads": 4,
           "n_layers": 2, "drop_rate": 0.0, "qkv_bias": True}
    torch.manual_seed(0)
    ref = GPTModel(cfg).eval()
    params = gpt2.init(jax.random.PRNGKey(0), cfg)
    params = ref_torch.load_ref_gpt2(params, _sd(ref), log=_silent)

    ids = torch.randint(0, 128, (2, 12))
    with torch.no_grad():
        ref_logits = ref(ids)
    ours, _, _ = gpt2.apply(params, cfg, jnp.asarray(ids.numpy()))
    assert _max_diff(ref_logits, ours) < ATOL

    ref_tokens = _greedy_ref(ref, ids[:, :6], 8)
    our_tokens = _greedy_ours(gpt2, params, cfg, ids[:, :6].numpy(), 8)
    assert (ref_tokens == our_tokens).all()


@pytest.mark.slow
def test_qwen3_dense_parity():
    from llm_quest.qwen.qwen3.qwen3_model import Qwen3Model

    from llm_quest_tpu.models import qwen3

    cfg = {"model_type": "dense", "vocab_size": 128, "context_length": 64, "emb_dim": 48,
           "n_heads": 4, "num_kv_groups": 2, "head_dim": 16, "hidden_dim": 96, "n_layers": 2,
           "rope_base": 10_000.0, "tie_embeddings": False, "qk_norm": True}
    torch.manual_seed(0)
    ref = Qwen3Model(dict(cfg, dtype=torch.float32)).eval()
    jcfg = dict(cfg, dtype=jnp.float32)
    params = qwen3.init(jax.random.PRNGKey(0), jcfg)
    params = ref_torch.load_ref_qwen3(params, jcfg, _sd(ref), log=_silent)

    ids = torch.randint(0, 128, (2, 12))
    with torch.no_grad():
        ref_logits = ref(ids)
    ours, _, _ = qwen3.apply(params, jcfg, jnp.asarray(ids.numpy()))
    assert _max_diff(ref_logits, ours) < ATOL

    ref_tokens = _greedy_ref(ref, ids[:, :6], 8)
    our_tokens = _greedy_ours(qwen3, params, jcfg, ids[:, :6].numpy(), 8)
    assert (ref_tokens == our_tokens).all()


def test_qwen3_moe_parity():
    from llm_quest.qwen.qwen3.qwen3_model import Qwen3MoEModel

    from llm_quest_tpu.models import qwen3

    cfg = {"model_type": "moe", "vocab_size": 128, "context_length": 64, "emb_dim": 48,
           "n_heads": 4, "num_kv_groups": 2, "head_dim": 16, "n_layers": 2,
           "rope_base": 10_000.0, "tie_embeddings": False, "qk_norm": True,
           "num_experts": 4, "top_k": 2, "moe_hidden_dim": 32, "hidden_dim": 32,
           "aux_loss_coef": 0.001}
    torch.manual_seed(0)
    ref = Qwen3MoEModel(dict(cfg, dtype=torch.float32)).eval()
    jcfg = dict(cfg, dtype=jnp.float32)
    params = qwen3.init(jax.random.PRNGKey(0), jcfg)
    params = ref_torch.load_ref_qwen3(params, jcfg, _sd(ref), log=_silent)

    ids = torch.randint(0, 128, (2, 12))
    with torch.no_grad():
        ref_logits = ref(ids)
    ours, _, _ = qwen3.apply(params, jcfg, jnp.asarray(ids.numpy()))
    assert _max_diff(ref_logits, ours) < ATOL


@pytest.mark.slow
def test_qwen3_next_parity():
    from llm_quest.qwen.qwen3_next.qwen3_next_model import Qwen3NextModel

    from llm_quest_tpu.models import qwen3_next

    cfg = {"vocab_size": 128, "context_length": 64, "emb_dim": 32, "n_layers": 4,
           "linear_sdpa_ratio": 2, "n_heads": 4, "head_dim": 8, "num_kv_groups": 2,
           "partial_rope_factor": 0.25, "rope_base": 10_000,
           "linear_num_qk_heads": 2, "linear_num_value_heads": 4, "linear_qk_head_dim": 8,
           "linear_value_head_dim": 8, "linear_conv_kernel_size": 4,
           "moe_hidden_dim": 64, "shared_expert_hidden_dim": 64, "num_experts": 4,
           "top_k": 2, "aux_loss_coef": 0.001, "tie_embeddings": False, "p_dropout": 0.0}
    torch.manual_seed(0)
    ref = Qwen3NextModel(dict(cfg, dtype=torch.float32, training=False)).eval()
    jcfg = dict(cfg, dtype=jnp.float32)
    params = qwen3_next.init(jax.random.PRNGKey(0), jcfg)
    params = ref_torch.load_ref_qwen3_next(params, jcfg, _sd(ref), log=_silent)

    ids = torch.randint(0, 128, (2, 12))
    with torch.no_grad():
        ref_logits = ref(ids)
    ours, _, _ = qwen3_next.apply(params, jcfg, jnp.asarray(ids.numpy()))
    assert _max_diff(ref_logits, ours) < ATOL


@pytest.mark.slow
def test_qwen3_5_text_parity():
    from llm_quest.qwen.qwen3_5.qwen3_5_text_model import Qwen3_5TextModel

    from llm_quest_tpu.models import qwen3_5

    cfg = {"vocab_size": 512, "emb_dim": 64, "hidden_dim": 128, "n_layers": 4,
           "linear_sdpa_ratio": 2, "n_heads": 4, "num_kv_groups": 2, "head_dim": 16,
           "rope_base": 10_000_000, "partial_rope_factor": 0.25, "context_length": 256,
           "linear_num_qk_heads": 2, "linear_num_value_heads": 4, "linear_qk_head_dim": 8,
           "linear_value_head_dim": 8, "linear_conv_kernel_size": 4,
           "tie_embeddings": False, "mrope_section": [1, 1, 0], "p_dropout": 0.0}
    torch.manual_seed(0)
    ref = Qwen3_5TextModel(dict(cfg, dtype=torch.float32, training=False)).eval()
    jcfg = dict(cfg, dtype=jnp.float32)
    params = qwen3_5.init_text(jax.random.PRNGKey(0), jcfg)
    params = ref_torch.load_ref_qwen3_5_text(params, _sd(ref), log=_silent)

    ids = torch.randint(0, 512, (2, 12))
    with torch.no_grad():
        ref_logits = ref(ids)
    ours, _, _ = qwen3_5.apply_text(params, jcfg, jnp.asarray(ids.numpy()))
    assert _max_diff(ref_logits, ours) < ATOL


@pytest.mark.slow
def test_deepseek_v3_parity():
    from llm_quest.llama3_to_deepseekv3.deepseek_model import DeepSeekV3Model

    from llm_quest_tpu.models import deepseek_v3

    cfg = {"vocab_size": 128, "context_length": 64, "emb_dim": 48, "n_heads": 4,
           "n_layers": 4, "hidden_dim": 96, "num_ffn": 2, "num_experts": 4,
           "num_shared_experts": 1, "top_k": 1, "moe_scaling_factor": 1,
           "moe_bias_update_rate": 1e-3, "mtp_depth": 2, "mtp_loss_coeff": 0.2,
           "rope_base": 10_000, "q_rank": 1536}
    torch.manual_seed(0)
    ref = DeepSeekV3Model(dict(cfg, dtype=torch.float32)).eval()
    jcfg = dict(cfg, dtype=jnp.float32)
    params = deepseek_v3.init(jax.random.PRNGKey(0), jcfg)
    params = ref_torch.load_ref_deepseek_v3(params, jcfg, _sd(ref), log=_silent)

    ids = torch.randint(0, 128, (2, 12))
    with torch.no_grad():
        ref_logits, _ = ref.main_model(ids, ref.mask[:12, :12], ref.cos[:12], ref.sin[:12])
    ours, _, _ = deepseek_v3.apply(params, jcfg, jnp.asarray(ids.numpy()))
    assert _max_diff(ref_logits, ours) < ATOL


@pytest.mark.slow
def test_mimo_parity():
    from llm_quest.xiaomi.mimo_v2_flash_model import MiMoModel

    from llm_quest_tpu.models import mimo_v2_flash

    cfg = {"vocab_size": 128, "context_length": 64, "emb_dim": 32, "n_layers": 3,
           "n_heads": 4, "num_swa_kv_groups": 4, "num_ga_kv_groups": 2, "head_dim": 12,
           "value_head_dim": 8, "hidden_dim": 64, "window_size": 4, "hybrid_ratio": 3,
           "rope_base": 10_000, "rope_base_ga": 640_000, "partial_rope_factor": 0.33,
           "mtp_depth": 1, "mtp_loss_coeff": 0.3, "num_experts": 4, "top_k": 2,
           "num_shared_experts": 0, "moe_scaling_factor": 1, "moe_bias_update_rate": 1e-3}
    torch.manual_seed(0)
    ref = MiMoModel(dict(cfg, dtype=torch.float32)).eval()
    jcfg = dict(cfg, dtype=jnp.float32)
    params = mimo_v2_flash.init(jax.random.PRNGKey(0), jcfg)
    params = ref_torch.load_ref_mimo(params, jcfg, _sd(ref), log=_silent)

    ids = torch.randint(0, 128, (2, 12))
    with torch.no_grad():
        ref_logits = ref(ids)
    ours, _, _ = mimo_v2_flash.apply(params, jcfg, jnp.asarray(ids.numpy()))
    assert _max_diff(ref_logits, ours) < ATOL


@pytest.mark.slow
def test_qwen3_5_vlm_parity():
    from llm_quest.qwen.qwen3_5.qwen3_5_vlm_model import Qwen3_5VLM

    from llm_quest_tpu.models import qwen3_5

    cfg = {"vocab_size": 512, "emb_dim": 64, "hidden_dim": 128, "n_layers": 4,
           "linear_sdpa_ratio": 2, "n_heads": 4, "num_kv_groups": 2, "head_dim": 16,
           "rope_base": 10_000_000, "partial_rope_factor": 0.25, "context_length": 256,
           "linear_num_qk_heads": 2, "linear_num_value_heads": 4, "linear_qk_head_dim": 8,
           "linear_value_head_dim": 8, "linear_conv_kernel_size": 4,
           "tie_embeddings": False, "mrope_section": [1, 1, 0], "p_dropout": 0.0,
           # vision half (64x64 image, 16 spatial patches, 4 merged tokens)
           "vision_n_layers": 2, "vision_emb_dim": 32, "vision_hidden_dim": 64,
           "vision_num_heads": 2, "llm_d_in": 64, "in_channels": 3, "patch_size": 16,
           "spatial_merge_size": 2, "temporal_patch_size": 2, "num_position_embeddings": 16,
           "img_width": 64, "img_height": 64, "vision_rope_base": 10_000,
           "image_token_id": 500}
    torch.manual_seed(0)
    ref = Qwen3_5VLM(dict(cfg, dtype=torch.float32, training=False, device="cpu")).eval()
    jcfg = dict(cfg, dtype=jnp.float32)
    params = qwen3_5.init(jax.random.PRNGKey(0), jcfg)
    params = ref_torch.load_ref_qwen3_5_vlm(params, _sd(ref), log=_silent)

    # prompt with the 4 merged-vision-token placeholders mid-sequence
    ids = torch.tensor([[7, 11, 500, 500, 500, 500, 23, 42, 9, 13]])
    pixels = torch.randn(1, 3, 2, 64, 64)
    with torch.no_grad():
        ref_logits = ref(ids, image_pixels=pixels)
    ours, _, _ = qwen3_5.apply(params, jcfg, jnp.asarray(ids.numpy()),
                               image_pixels=jnp.asarray(pixels.numpy()))
    assert _max_diff(ref_logits, ours) < ATOL


@pytest.mark.slow
def test_llama3_parity():
    from llm_quest.gpt_to_llama3.llama_model import Llama3Model

    from llm_quest_tpu.models import llama3

    cfg = {"vocab_size": 128, "context_length": 64, "emb_dim": 48, "n_heads": 4,
           "n_layers": 2, "num_kv_groups": 2, "hidden_dim": 96, "rope_base": 10_000,
           "rope_freq": {"factor": 32.0, "alpha": 1.0, "beta": 32.0,
                         "og_ctx_len": 4096, "ctx_len": 8192}}
    torch.manual_seed(0)
    ref = Llama3Model(dict(cfg, dtype=torch.float32)).eval()
    jcfg = dict(cfg, dtype=jnp.float32)
    params = llama3.init(jax.random.PRNGKey(0), jcfg)
    params = ref_torch.load_ref_llama3(params, _sd(ref), log=_silent)

    ids = torch.randint(0, 128, (2, 12))
    with torch.no_grad():
        ref_logits = ref(ids)
    ours, _, _ = llama3.apply(params, jcfg, jnp.asarray(ids.numpy()))
    assert _max_diff(ref_logits, ours) < ATOL

    ref_tokens = _greedy_ref(ref, ids[:, :6], 8)
    our_tokens = _greedy_ours(llama3, params, jcfg, ids[:, :6].numpy(), 8)
    assert (ref_tokens == our_tokens).all()


@pytest.mark.slow
def test_gemma3_parity():
    from llm_quest.llama3_to_gemma3.gemma3_model import Gemma3Model

    from llm_quest_tpu.models import gemma3

    cfg = {"vocab_size": 128, "context_length": 64, "emb_dim": 48, "n_heads": 4,
           "n_layers": 4, "num_kv_groups": 2, "hidden_dim": 96, "window_size": 8,
           "local_global_att_ratio": 2, "rope_base": 10_000, "logits_softcap": 30.0}
    torch.manual_seed(0)
    ref = Gemma3Model(dict(cfg, dtype=torch.float32)).eval()
    jcfg = dict(cfg, dtype=jnp.float32)
    params = gemma3.init(jax.random.PRNGKey(0), jcfg)
    params = ref_torch.load_ref_gemma3(params, _sd(ref), log=_silent)

    ids = torch.randint(0, 128, (2, 12))
    with torch.no_grad():
        ref_logits = ref(ids)
    ours, _, _ = gemma3.apply(params, jcfg, jnp.asarray(ids.numpy()))
    assert _max_diff(ref_logits, ours) < ATOL


def test_vit_parity():
    from llm_quest.multimodal.vision_transformer.vit_model import ViTModel

    from llm_quest_tpu.models import vit

    cfg = {"img_width": 32, "img_height": 32, "patch_size": 8, "num_channels": 3,
           "emb_dim": 64, "n_layers": 2, "n_heads": 4, "drop_rate": 0.0,
           "qkv_bias": True, "num_classes": 10}
    torch.manual_seed(0)
    ref = ViTModel(cfg).eval()
    jcfg = dict(cfg, dtype=jnp.float32)
    params = vit.init(jax.random.PRNGKey(0), jcfg)
    params = ref_torch.load_ref_vit(params, _sd(ref), log=_silent)

    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        ref_logits = ref(x)
    ours = vit.apply(params, jcfg, jnp.asarray(x.numpy()))
    assert _max_diff(ref_logits, ours) < ATOL

    with torch.no_grad():
        ref_hidden = ref(x, output_hidden_states=True)
    our_hidden = vit.apply(params, jcfg, jnp.asarray(x.numpy()), output_hidden_states=True)
    assert _max_diff(ref_hidden, our_hidden) < ATOL
