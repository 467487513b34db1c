"""Closed-form training FLOPs formulas per model family.

Reference parity: `nemo/utils/flops_formulas.py:67-514` (gpt3/llama2/llama3/
mixtral/bert/... formulas feeding FLOPsMeasurementCallback). Derived from
first principles here: fwd+bwd ≈ 3× forward; forward per token =
2·(params in matmuls) + attention 2·2·s·h·layers (score + value matmuls).
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class FLOPsConfig:
    gbs: int  # global batch size (sequences)
    enc_seq_len: int
    hs: int  # hidden size
    layers: int
    ffn_hs: int
    attention_heads: int = 0
    query_groups: Optional[int] = None
    vocab_size: int = 0
    moe_router_expert_count: int = 0
    moe_topk: int = 2


def _dense_layer_flops(cfg: FLOPsConfig) -> float:
    """Per-token forward matmul FLOPs of one transformer layer."""
    h, f = cfg.hs, cfg.ffn_hs
    heads = cfg.attention_heads or 1
    groups = cfg.query_groups or heads
    kv_mult = groups / heads
    qkv = 2 * h * h * (1 + 2 * kv_mult)  # q + k + v projections
    out = 2 * h * h
    attn = 2 * 2 * cfg.enc_seq_len * h  # scores + values, causal avg ≈ s/2·2 → s
    mlp = 2 * h * f * 3  # SwiGLU: gate+up+down
    return qkv + out + attn + mlp


def gpt3(cfg: FLOPsConfig) -> float:
    """Total train FLOPs for one global batch (fwd+bwd = 3× fwd)."""
    h, f = cfg.hs, cfg.ffn_hs
    per_tok_layer = 2 * h * h * 4 + 2 * 2 * cfg.enc_seq_len * h + 2 * h * f * 2
    per_tok = cfg.layers * per_tok_layer + 2 * h * cfg.vocab_size
    return 3.0 * per_tok * cfg.gbs * cfg.enc_seq_len


def llama2(cfg: FLOPsConfig) -> float:
    per_tok = cfg.layers * _dense_layer_flops(cfg) + 2 * cfg.hs * cfg.vocab_size
    return 3.0 * per_tok * cfg.gbs * cfg.enc_seq_len


llama3 = llama2
qwen3 = llama2
nemotron = llama2


def mixtral(cfg: FLOPsConfig) -> float:
    h, f = cfg.hs, cfg.ffn_hs
    base = _dense_layer_flops(cfg) - 2 * h * f * 3
    moe = 2 * h * f * 3 * cfg.moe_topk + 2 * h * cfg.moe_router_expert_count
    per_tok = cfg.layers * (base + moe) + 2 * h * cfg.vocab_size
    return 3.0 * per_tok * cfg.gbs * cfg.enc_seq_len


def bert(cfg: FLOPsConfig) -> float:
    per_tok = cfg.layers * _dense_layer_flops(cfg) + 2 * cfg.hs * cfg.vocab_size
    return 3.0 * per_tok * cfg.gbs * cfg.enc_seq_len


FLOPS_FORMULAS = {
    "gpt3": gpt3, "llama2": llama2, "llama3": llama3, "qwen3": qwen3,
    "nemotron": nemotron, "mixtral": mixtral, "bert": bert,
}
