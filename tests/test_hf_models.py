"""Logits-parity tests vs HF transformers for the extended model zoo:
phi3 / starcoder2 / nemotron / deepseek-v3 (MLA + sigmoid MoE).

Reference parity: the HF importer connectors in
nemo/collections/llm/gpt/model/{phi3,starcoder2,nemotron,deepseek}.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp
import torch

from nemo_tpu.interop.hf_models import import_hf_model
from nemo_tpu.models.llm.gpt import GPTModel

TINY = dict(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, vocab_size=100,
            max_position_embeddings=64)


def _parity(hf_model, atol=2e-3):
    cfg, params = import_hf_model(hf_model)
    tok = np.random.RandomState(0).randint(0, 99, (2, 16)).astype(np.int32)
    with torch.no_grad():
        ref = hf_model(torch.tensor(tok, dtype=torch.long)).logits.float().numpy()
    ours = np.asarray(GPTModel(cfg).apply({"params": params}, jnp.asarray(tok)))
    np.testing.assert_allclose(ours, ref, atol=atol, rtol=1e-3)
    return cfg


def test_phi3_parity():
    from transformers import Phi3Config, Phi3ForCausalLM

    torch.manual_seed(0)
    m = Phi3ForCausalLM(Phi3Config(pad_token_id=0, **TINY)).eval()
    _parity(m)


def test_starcoder2_parity():
    from transformers import Starcoder2Config, Starcoder2ForCausalLM

    torch.manual_seed(0)
    m = Starcoder2ForCausalLM(Starcoder2Config(**TINY)).eval()
    cfg = _parity(m)
    assert cfg.normalization == "LayerNorm" and not cfg.gated_linear_unit


def test_nemotron_parity():
    from transformers import NemotronConfig, NemotronForCausalLM

    torch.manual_seed(0)
    m = NemotronForCausalLM(NemotronConfig(**TINY)).eval()
    cfg = _parity(m)
    assert cfg.activation == "squared_relu"
    assert cfg.layernorm_zero_centered_gamma
    assert cfg.rotary_percent == 0.5


def test_deepseek_v3_parity():
    from transformers import DeepseekV3Config
    from transformers.models.deepseek_v3.modeling_deepseek_v3 import (
        DeepseekV3ForCausalLM,
    )

    torch.manual_seed(0)
    c = DeepseekV3Config(
        hidden_size=64, intermediate_size=128, moe_intermediate_size=32,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=4,
        vocab_size=100, q_lora_rank=24, kv_lora_rank=16, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16, n_routed_experts=4,
        num_experts_per_tok=2, n_shared_experts=1, first_k_dense_replace=1,
        n_group=2, topk_group=1, max_position_embeddings=64)
    m = DeepseekV3ForCausalLM(c).eval()
    cfg = _parity(m, atol=3e-3)
    assert cfg.kv_lora_rank == 16 and cfg.moe_first_k_dense == 1


def test_mla_decode_matches_full():
    """MLA KV-cache decode == full forward (deepseek generate path)."""
    import jax

    from nemo_tpu.models.llm.config import tiny_test
    from nemo_tpu.models.llm.gpt import init_kv_caches

    cfg = tiny_test(kv_lora_rank=16, q_lora_rank=24, qk_head_dim=16,
                    qk_pos_emb_head_dim=8, v_head_dim=16)
    model = GPTModel(cfg)
    rng = np.random.RandomState(0)
    S = 10
    tokens = jnp.asarray(rng.randint(0, 100, (1, S)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), tokens)
    full = model.apply(variables, tokens)
    caches = init_kv_caches(cfg, 1, S, dtype=jnp.float32)
    outs = []
    for t in range(S):
        logits, caches = model.apply(
            variables, tokens[:, t:t + 1], jnp.array([[t]]),
            kv_caches=caches, decode_index=t)
        outs.append(logits[:, 0])
    step = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(step), np.asarray(full), atol=2e-4, rtol=1e-3)


def test_new_presets_instantiate():
    from nemo_tpu.models.llm.config import PRESETS

    for name in ["phi3_mini_4k", "starcoder2_7b", "nemotron4_15b", "qwen25_7b",
                 "deepseek_v3", "nemotron4_340b"]:
        cfg = PRESETS[name]()
        assert cfg.num_layers > 0


def test_mixtral_parity():
    from transformers import MixtralConfig, MixtralForCausalLM

    torch.manual_seed(0)
    m = MixtralForCausalLM(MixtralConfig(
        num_local_experts=4, num_experts_per_tok=2, **TINY)).eval()
    cfg = _parity(m)
    assert cfg.num_moe_experts == 4 and cfg.moe_router_topk == 2


def test_qwen3_moe_parity():
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    torch.manual_seed(0)
    m = Qwen3MoeForCausalLM(Qwen3MoeConfig(
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=48,
        norm_topk_prob=True, head_dim=16, decoder_sparse_step=1,
        **TINY)).eval()
    cfg = _parity(m)
    assert cfg.qk_layernorm and cfg.moe_ffn_hidden_size == 48


def test_gemma2_parity():
    from transformers import Gemma2Config, Gemma2ForCausalLM

    torch.manual_seed(0)
    m = Gemma2ForCausalLM(Gemma2Config(
        head_dim=16, query_pre_attn_scalar=16,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        sliding_window=8, **TINY)).eval()
    cfg = _parity(m)
    assert cfg.attn_logit_softcapping == 50.0
    assert cfg.sandwich_norms and cfg.layernorm_zero_centered_gamma


def test_mla_latent_cache_engine_and_int8():
    """MLA latent cache through GenerationEngine: cache stores (r + dr)
    floats/token (not H·(dn+dr+dv)), greedy decode runs, and the int8
    cache variant composes."""
    import jax

    from nemo_tpu.models.llm.config import tiny_test
    from nemo_tpu.models.llm.generate import GenerationEngine, SamplingParams
    from nemo_tpu.models.llm.gpt import init_kv_caches

    cfg = tiny_test(kv_lora_rank=16, q_lora_rank=24, qk_head_dim=16,
                    qk_pos_emb_head_dim=8, v_head_dim=16)
    k, v = init_kv_caches(cfg, 1, 8, dtype=jnp.float32)
    assert k.shape == (cfg.num_layers, 1, 8, 1, 16)   # latents
    assert v.shape == (cfg.num_layers, 1, 8, 1, 8)    # shared roped k_pe

    import flax.linen as nn
    model = GPTModel(cfg)
    params = nn.meta.unbox(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))["params"])
    p = SamplingParams(greedy=True, max_new_tokens=4, eos_id=-1)
    ref = GenerationEngine(cfg, params, cache_dtype=jnp.float32).generate_tokens(
        [[5, 6, 7]], p)
    q8 = GenerationEngine(cfg, params, cache_dtype=jnp.int8).generate_tokens(
        [[5, 6, 7]], p)
    assert len(ref[0]) == len(q8[0]) == 4
