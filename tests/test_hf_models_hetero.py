"""Logits-parity vs HF transformers for heterogeneous-stack families:
gemma3 (dual rope bases, 5:1 sliding/full, qk-norm, sandwich norms) and
gpt-oss (alternating SWA/full, attention sinks, yarn rope, clamped
(up+1)·quick-gelu MoE with per-expert biases).

Reference parity: nemo/collections/llm/gpt/model/{gemma3,gpt_oss}.py HF
importer connectors."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from nemo_tpu.interop.hf_models import import_hf_model
from nemo_tpu.models.llm.gpt import GPTModel, hetero_period


def _parity(hf_model, atol=2e-3, vocab=100):
    cfg, params = import_hf_model(hf_model)
    tok = np.random.RandomState(0).randint(0, vocab - 1, (2, 16)).astype(np.int32)
    with torch.no_grad():
        ref = hf_model(torch.tensor(tok, dtype=torch.long)).logits.float().numpy()
    ours = np.asarray(GPTModel(cfg).apply({"params": params}, jnp.asarray(tok)))
    np.testing.assert_allclose(ours, ref, atol=atol, rtol=1e-3)
    return cfg


def test_gemma3_parity():
    from transformers import Gemma3TextConfig, Gemma3ForCausalLM

    torch.manual_seed(0)
    hf_cfg = Gemma3TextConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=6,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=100, max_position_embeddings=64,
        sliding_window=8, query_pre_attn_scalar=16,
        rope_theta=1_000_000.0, rope_local_base_freq=10_000.0)
    m = Gemma3ForCausalLM(hf_cfg).eval()
    cfg = _parity(m)
    # 5 sliding + 1 full, window 8, sandwich norms, dual bases
    assert cfg.window_pattern == (8, 8, 8, 8, 8, None)
    assert hetero_period(cfg) == 6
    assert cfg.sandwich_norms and cfg.qk_layernorm
    assert cfg.rope_local_base == 10_000.0 and cfg.rotary_base == 1_000_000.0


def test_gemma3_parity_linear_scaling():
    from transformers import Gemma3TextConfig, Gemma3ForCausalLM

    torch.manual_seed(1)
    hf_cfg = Gemma3TextConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=100, max_position_embeddings=64,
        sliding_window=8, query_pre_attn_scalar=16,
        layer_types=["sliding_attention", "full_attention"],
        rope_scaling={"rope_type": "linear", "factor": 8.0})
    m = Gemma3ForCausalLM(hf_cfg).eval()
    cfg = _parity(m)
    assert cfg.rope_scaling == "linear" and cfg.rope_scaling_factor == 8.0
    assert cfg.window_pattern == (8, None)


def test_gpt_oss_parity():
    from transformers import GptOssConfig, GptOssForCausalLM

    torch.manual_seed(0)
    hf_cfg = GptOssConfig(
        hidden_size=64, intermediate_size=96, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=100, max_position_embeddings=128,
        sliding_window=8, num_local_experts=4, num_experts_per_tok=2,
        rope_theta=150_000.0,
        rope_scaling={"rope_type": "yarn", "factor": 8.0,
                      "original_max_position_embeddings": 32,
                      "beta_fast": 32.0, "beta_slow": 1.0})
    m = GptOssForCausalLM(hf_cfg).eval()
    cfg = _parity(m, atol=3e-3)
    assert cfg.window_pattern == (8, None)
    assert cfg.attention_sinks and cfg.glu_linear_offset == 1.0
    assert cfg.rope_scaling == "yarn" and cfg.num_moe_experts == 4


def test_gpt_oss_topk_dispatch_close_to_dense():
    """The capacity-dispatch path (production) routes the same tokens as the
    exact dense path when capacity is ample."""
    import dataclasses

    from transformers import GptOssConfig, GptOssForCausalLM

    torch.manual_seed(2)
    hf_cfg = GptOssConfig(
        hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=100, max_position_embeddings=128, sliding_window=8,
        num_local_experts=4, num_experts_per_tok=2)
    m = GptOssForCausalLM(hf_cfg).eval()
    cfg, params = import_hf_model(m)
    tok = jnp.asarray(np.random.RandomState(3).randint(0, 99, (2, 16)))
    dense = GPTModel(cfg).apply({"params": params}, tok)
    cfg_topk = dataclasses.replace(cfg, moe_dispatch="topk",
                                   moe_capacity_factor=4.0)
    topk = GPTModel(cfg_topk).apply({"params": params}, tok)
    np.testing.assert_allclose(np.asarray(topk), np.asarray(dense),
                               atol=2e-4)
