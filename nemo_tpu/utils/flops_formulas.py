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
    moe_ffn_hs: Optional[int] = None
    moe_shared_ffn_hs: Optional[int] = None
    kv_lora_rank: Optional[int] = None  # deepseek MLA
    q_lora_rank: Optional[int] = None
    qk_head_dim: int = 128
    qk_pos_emb_head_dim: int = 64
    v_head_dim: int = 128
    mamba_state_dim: int = 128  # mamba2 SSD
    mamba_head_dim: int = 64
    dec_seq_len: Optional[int] = None  # t5 decoder


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


def qwen2(cfg: FLOPsConfig) -> float:
    return llama2(cfg)


def starcoder2(cfg: FLOPsConfig) -> float:
    """non-gated gelu MLP: 2 matmuls instead of SwiGLU's 3."""
    h, f = cfg.hs, cfg.ffn_hs
    per_layer = _dense_layer_flops(cfg) - 2 * h * f * 3 + 2 * h * f * 2
    per_tok = cfg.layers * per_layer + 2 * h * cfg.vocab_size
    return 3.0 * per_tok * cfg.gbs * cfg.enc_seq_len


gemma = llama2
gemma2 = llama2
phi3 = llama2


def deepseekv3(cfg: FLOPsConfig) -> float:
    """MLA projections + sigmoid-routed MoE (reference flops_formulas.py
    deepseekv3): per-head dims decouple from hidden size."""
    h = cfg.hs
    heads = cfg.attention_heads or 1
    dqk = cfg.qk_head_dim + cfg.qk_pos_emb_head_dim
    # q path: (optionally) lora down+up, else direct
    if cfg.q_lora_rank:
        q = 2 * h * cfg.q_lora_rank + 2 * cfg.q_lora_rank * heads * dqk
    else:
        q = 2 * h * heads * dqk
    kv = 2 * h * (cfg.kv_lora_rank + cfg.qk_pos_emb_head_dim) \
        + 2 * cfg.kv_lora_rank * heads * (cfg.qk_head_dim + cfg.v_head_dim)
    out = 2 * heads * cfg.v_head_dim * h
    attn = 2 * cfg.enc_seq_len * heads * (dqk + cfg.v_head_dim)
    fm = cfg.moe_ffn_hs or cfg.ffn_hs
    shared = cfg.moe_shared_ffn_hs or 0
    moe = 2 * h * fm * 3 * cfg.moe_topk + 2 * h * shared * 3 \
        + 2 * h * cfg.moe_router_expert_count
    per_layer = q + kv + out + attn + moe
    per_tok = cfg.layers * per_layer + 2 * h * cfg.vocab_size
    return 3.0 * per_tok * cfg.gbs * cfg.enc_seq_len


def mamba2(cfg: FLOPsConfig) -> float:
    """Chunked SSD: in/out projections + state update ≈ linear in seq
    (reference hyena/mamba formulas)."""
    h = cfg.hs
    d_inner = 2 * h
    proj = 2 * h * (2 * d_inner) + 2 * d_inner * h  # in_proj (x,z) + out
    ssd = 2 * d_inner * cfg.mamba_state_dim * 2  # B/C state contractions
    per_layer = proj + ssd
    per_tok = cfg.layers * per_layer + 2 * h * cfg.vocab_size
    return 3.0 * per_tok * cfg.gbs * cfg.enc_seq_len


def t5(cfg: FLOPsConfig) -> float:
    """encoder + decoder (with cross-attention) stacks."""
    dec_len = cfg.dec_seq_len or cfg.enc_seq_len
    enc_per_tok = cfg.layers * _dense_layer_flops(cfg)
    # decoder: self-attn + cross-attn + mlp
    cross = 2 * cfg.hs * cfg.hs * 2 + 2 * 2 * cfg.enc_seq_len * cfg.hs
    dec_per_tok = cfg.layers * (_dense_layer_flops(cfg) + cross) \
        + 2 * cfg.hs * cfg.vocab_size
    return 3.0 * (enc_per_tok * cfg.gbs * cfg.enc_seq_len
                  + dec_per_tok * cfg.gbs * dec_len)


def transformer(cfg: FLOPsConfig) -> float:
    """generic dense decoder fallback (reference 'transformer' entry)."""
    return llama2(cfg)


FLOPS_FORMULAS = {
    "gpt3": gpt3, "llama2": llama2, "llama3": llama3, "qwen2": qwen2,
    "qwen3": qwen3, "nemotron": nemotron, "mixtral": mixtral, "bert": bert,
    "starcoder2": starcoder2, "gemma": gemma, "gemma2": gemma2,
    "phi3": phi3, "deepseekv3": deepseekv3, "mamba2": mamba2, "t5": t5,
    "transformer": transformer,
}
