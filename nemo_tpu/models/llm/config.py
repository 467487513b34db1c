"""GPT model configs + family presets.

Reference parity: GPTConfig (`nemo/collections/llm/gpt/model/base.py:284`,
a Megatron TransformerConfig + IOMixin) and the per-family config dataclasses
in `gpt/model/{llama,mistral,qwen2,gemma,...}.py`. Here a single frozen
dataclass carries the architecture; presets mirror the reference model zoo.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class GPTConfig:
    num_layers: int = 12
    hidden_size: int = 768
    ffn_hidden_size: int = 3072
    num_attention_heads: int = 12
    num_query_groups: Optional[int] = None  # None → MHA; <heads → GQA
    kv_channels: Optional[int] = None  # None → hidden/heads
    vocab_size: int = 32000
    seq_length: int = 2048
    max_position_embeddings: Optional[int] = None

    # structure
    normalization: str = "RMSNorm"  # RMSNorm | LayerNorm
    layernorm_epsilon: float = 1e-5
    gated_linear_unit: bool = True  # SwiGLU
    activation: str = "silu"  # silu | gelu | squared_relu
    add_bias_linear: bool = False
    add_qkv_bias: bool = False
    position_embedding_type: str = "rope"  # rope | learned_absolute | none
    rotary_base: float = 10000.0
    rotary_percent: float = 1.0
    # None | "llama3" (wavelength-banded) | "linear" (gemma3 global) |
    # "yarn" (gpt-oss: NTK-by-parts interpolation + concentration mscale)
    rope_scaling: Optional[str] = None
    rope_scaling_factor: float = 8.0
    old_context_len: int = 8192  # llama3/yarn scaling original context
    # qwen2-VL multimodal RoPE: per-frequency-section position axes
    # (temporal, height, width); sum must be head_dim//2. Positions become
    # [B, S, 3] (reference vlm/qwen2vl multimodal rotary embedding).
    mrope_sections: Optional[Tuple[int, ...]] = None
    share_embeddings_and_output_weights: bool = False
    attention_softmax_in_fp32: bool = True
    qk_layernorm: bool = False  # qwen3-style per-head q/k norm
    # gemma2/3: extra norms on the attention and MLP OUTPUTS before the
    # residual adds (HF post_attention_layernorm applied to attn output +
    # pre/post_feedforward_layernorm sandwich)
    sandwich_norms: bool = False
    layernorm_zero_centered_gamma: bool = False  # gemma-style (1+g) scale
    attention_multiplier: Optional[float] = None  # custom softmax scale
    embedding_multiplier: Optional[float] = None  # gemma: sqrt(hidden)
    logit_softcapping: Optional[float] = None  # gemma2
    attn_logit_softcapping: Optional[float] = None  # gemma2 attn scores
    window_size: Optional[int] = None  # sliding-window attention (mistral)
    # False → bidirectional attention (NV-Embed-style encoders built on a
    # decoder stack; reference llama_embedding.py get_nv_embedding_layer_spec)
    causal: bool = True
    # per-layer heterogeneity (cyclic patterns over layer index; reference
    # gemma3 interleaved_attn_pattern, gpt_oss window_attn_skip_freq,
    # llama4 moe_layer_freq/nope_layer_interval). When the cycle period
    # divides num_layers, layers are scanned in pattern-period groups;
    # otherwise the stack unrolls.
    # window per layer i = window_pattern[i % len]; None entry = global.
    # gemma3: (512,)*5 + (None,); gemma2/gpt_oss: (4096|128, None).
    window_pattern: Optional[Tuple[Optional[int], ...]] = None
    # rotary base used by windowed (local) layers when set (gemma3:
    # 10k local / 1M global; rope scaling applies to global layers only)
    rope_local_base: Optional[float] = None
    # llama4: every k-th layer (i+1 % k == 0) skips rope entirely (NoPE)
    nope_layer_interval: Optional[int] = None
    # llama4: local (rope) layers attend only within chunks of this size
    attention_chunk_size: Optional[int] = None
    # llama4: L2-normalize q/k after rope on rope layers (no learnable scale)
    qk_l2_norm: bool = False
    # gpt-oss: learnable per-head sink logit added to the softmax
    # denominator (HF `sinks` / MCore softmax_offset)
    attention_sinks: bool = False
    # chatglm/llama4: rotate (x0,x1),(x2,x3) pairs instead of halves
    rotary_interleaved: bool = False
    # gpt-oss: clamp GLU gate to (-inf, c] and up-projection to [-c, c]
    activation_clamp: Optional[float] = None
    # gpt-oss: GLU linear term is (up + offset) — HF GptOssExperts (up+1)*glu
    glu_linear_offset: float = 0.0

    # multi-token prediction (deepseek-V3 MTP, reference gpt/model/base.py
    # mtp_block_spec): an extra transformer block predicts token t+2 from
    # [norm(h_t); norm(emb(x_{t+1}))]; trained with coeff-weighted CE
    mtp_num_layers: int = 0
    mtp_loss_coeff: float = 0.1

    # MoE (0 experts = dense)
    num_moe_experts: int = 0
    moe_router_topk: int = 2
    moe_ffn_hidden_size: Optional[int] = None
    moe_shared_expert_intermediate_size: Optional[int] = None
    moe_router_pre_softmax: bool = False
    moe_aux_loss_coeff: float = 0.0
    # deepseek-v3 routing (reference: gpt/model/deepseek.py): sigmoid scores,
    # aux-loss-free e-score correction bias, node/group-limited topk,
    # normalized weights × scaling factor
    moe_router_score_function: str = "softmax"  # softmax | sigmoid
    moe_router_enable_expert_bias: bool = False
    # aux-loss-free balancing (deepseek-v3): after each optimizer step the
    # e-score correction bias moves by ±rate against the per-step expert
    # load sign (underloaded experts gain bias). Applied by GPTTrainModule,
    # not by the gradient path (the bias is behind stop_gradient).
    moe_router_bias_update_rate: float = 1e-3
    moe_router_num_groups: Optional[int] = None
    moe_router_group_topk: Optional[int] = None
    moe_router_topk_scaling_factor: Optional[float] = None
    moe_router_norm_topk_prob: bool = False
    # layers [0, moe_first_k_dense) use a dense MLP instead of MoE
    # (deepseek first_k_dense_replace). Requires scan_layers=False.
    moe_first_k_dense: int = 0
    # cyclic 0/1 pattern: layer i is MoE iff moe_layer_freq[i % len]
    # (llama4 maverick (0, 1): MoE every other layer)
    moe_layer_freq: Optional[Tuple[int, ...]] = None

    # Multi-head Latent Attention (deepseek v2/v3; reference
    # gpt/model/deepseek.py MLATransformerConfig). kv_lora_rank != None
    # switches Attention → MLAAttention.
    kv_lora_rank: Optional[int] = None
    q_lora_rank: Optional[int] = None
    qk_head_dim: int = 128  # nope (non-rotary) part per head
    qk_pos_emb_head_dim: int = 64  # rotary part per head
    v_head_dim: int = 128
    # dispatch: "topk" = sort-based capacity dispatch (per-token FLOPs ∝ topk,
    # expert-sharded over the ep mesh axis — MCore a2a token-dispatcher
    # equivalent); "dense" = all-experts einsum (exact, no drops; debug/parity)
    moe_dispatch: str = "topk"
    # capacity per expert = ceil(tokens·topk/E · capacity_factor); overflow
    # tokens are dropped (reference: MCore capacity_factor + token drop)
    moe_capacity_factor: float = 1.25

    # attention backend: "xla" (einsum) | "flash" (Pallas kernel)
    attention_backend: str = "xla"
    # context parallelism (ring attention over the 'cp' mesh axis).
    # >1 → Attention runs shard_map'd Pallas ring-flash with zig-zag
    # causal load balancing (reference: TE CP p2p ring, parallelisms.rst:365).
    cp_size: int = 1

    # quantized GEMMs: None (bf16) | "fp8" (e4m3 fwd / e5m2 bwd grads,
    # current scaling — TE Float8CurrentScaling 'hybrid' recipe equivalent,
    # mixed_precision.py:55) | "fp8_e4m3" | "int8" (v5e MXU int8 fwd,
    # bf16 bwd). Applies to the attention q/k/v/o and MLP fc1/fc2 GEMMs.
    quantization: Optional[str] = None

    # fused linear+CE training loss: never materializes [B,S,V] logits
    # (chunked remat scan over the sequence; Megatron vocab-parallel-CE
    # equivalent). Identical math to the plain path.
    fused_ce: bool = True
    fused_ce_chunk: int = 512

    # numerics / training
    init_method_std: float = 0.02
    hidden_dropout: float = 0.0
    attention_dropout: float = 0.0
    params_dtype: str = "float32"
    compute_dtype: str = "bfloat16"
    # remat: "none" | "full" | "dots" (checkpoint matmul outputs only)
    remat: str = "full"
    scan_layers: bool = True  # stack layers with nn.scan (fast compiles)

    @property
    def head_dim(self) -> int:
        return self.kv_channels or self.hidden_size // self.num_attention_heads

    @property
    def n_kv_heads(self) -> int:
        return self.num_query_groups or self.num_attention_heads


def _cfg(**kw) -> GPTConfig:
    return GPTConfig(**kw)


def _preset(defaults: dict, kw: dict) -> GPTConfig:
    merged = dict(defaults)
    merged.update(kw)  # user overrides win
    return GPTConfig(**merged)


# --------------------------------------------------------------------------
# Family presets (reference: nemo/collections/llm/gpt/model/*.py)
# --------------------------------------------------------------------------

def llama2_7b(**kw) -> GPTConfig:
    return _preset(dict(num_layers=32, hidden_size=4096, ffn_hidden_size=11008, num_attention_heads=32, vocab_size=32000, seq_length=4096, rotary_base=10000.0), kw)


def llama3_8b(**kw) -> GPTConfig:
    return _preset(dict(num_layers=32, hidden_size=4096, ffn_hidden_size=14336, num_attention_heads=32, num_query_groups=8, vocab_size=128256, seq_length=8192, rotary_base=500000.0, rope_scaling='llama3'), kw)


def llama3_70b(**kw) -> GPTConfig:
    return _preset(dict(num_layers=80, hidden_size=8192, ffn_hidden_size=28672, num_attention_heads=64, num_query_groups=8, vocab_size=128256, seq_length=8192, rotary_base=500000.0, rope_scaling='llama3'), kw)


def llama31_405b(**kw) -> GPTConfig:
    return _preset(dict(num_layers=126, hidden_size=16384, ffn_hidden_size=53248, num_attention_heads=128, num_query_groups=8, vocab_size=128256, seq_length=8192, rotary_base=500000.0, rope_scaling='llama3'), kw)


def mistral_7b(**kw) -> GPTConfig:
    return _preset(dict(num_layers=32, hidden_size=4096, ffn_hidden_size=14336, num_attention_heads=32, num_query_groups=8, vocab_size=32000, seq_length=8192, window_size=4096), kw)


def mixtral_8x7b(**kw) -> GPTConfig:
    return _preset(dict(num_layers=32, hidden_size=4096, ffn_hidden_size=14336, num_attention_heads=32, num_query_groups=8, vocab_size=32000, seq_length=8192, num_moe_experts=8, moe_router_topk=2, moe_aux_loss_coeff=0.02), kw)


def gemma_7b(**kw) -> GPTConfig:
    return _preset(dict(num_layers=28, hidden_size=3072, ffn_hidden_size=24576, num_attention_heads=16, kv_channels=256, vocab_size=256000, seq_length=8192, activation='gelu', share_embeddings_and_output_weights=True, layernorm_zero_centered_gamma=True, embedding_multiplier=3072**0.5), kw)


def qwen2_7b(**kw) -> GPTConfig:
    return _preset(dict(num_layers=28, hidden_size=3584, ffn_hidden_size=18944, num_attention_heads=28, num_query_groups=4, vocab_size=152064, seq_length=32768, add_qkv_bias=True, rotary_base=1000000.0), kw)


def qwen3_8b(**kw) -> GPTConfig:
    return _preset(dict(num_layers=36, hidden_size=4096, ffn_hidden_size=12288, num_attention_heads=32, num_query_groups=8, kv_channels=128, vocab_size=151936, seq_length=40960, qk_layernorm=True, rotary_base=1000000.0), kw)


def phi3_mini_4k(**kw) -> GPTConfig:
    """reference: gpt/model/phi3.py Phi3ConfigMini."""
    return _preset(dict(num_layers=32, hidden_size=3072, ffn_hidden_size=8192, num_attention_heads=32, vocab_size=32064, seq_length=4096, rotary_base=10000.0), kw)


def starcoder2_7b(**kw) -> GPTConfig:
    """reference: gpt/model/starcoder2.py (GQA-4, gelu MLP with biases,
    LayerNorm, rope theta 1e6)."""
    return _preset(dict(num_layers=32, hidden_size=4608, ffn_hidden_size=18432, num_attention_heads=36, num_query_groups=4, vocab_size=49152, seq_length=16384, normalization='LayerNorm', gated_linear_unit=False, activation='gelu', add_bias_linear=True, rotary_base=1000000.0, share_embeddings_and_output_weights=True), kw)


def nemotron4_15b(**kw) -> GPTConfig:
    """reference: gpt/model/nemotron.py (squared-relu, LayerNorm1p,
    rotary_percent 0.5, no biases)."""
    return _preset(dict(num_layers=32, hidden_size=6144, ffn_hidden_size=24576, num_attention_heads=48, num_query_groups=8, vocab_size=256000, seq_length=4096, normalization='LayerNorm', layernorm_zero_centered_gamma=True, gated_linear_unit=False, activation='squared_relu', rotary_percent=0.5), kw)


def nemotron4_340b(**kw) -> GPTConfig:
    return nemotron4_15b(num_layers=96, hidden_size=18432, ffn_hidden_size=73728, num_attention_heads=96, num_query_groups=8, **kw)


def qwen25_7b(**kw) -> GPTConfig:
    return _preset(dict(num_layers=28, hidden_size=3584, ffn_hidden_size=18944, num_attention_heads=28, num_query_groups=4, vocab_size=152064, seq_length=32768, add_qkv_bias=True, rotary_base=1000000.0), kw)


def deepseek_v3(**kw) -> GPTConfig:
    """reference: gpt/model/deepseek.py DeepSeekV3Config (MLA + 256-expert
    sigmoid-routed MoE with e-score bias and group-limited topk)."""
    return _preset(dict(
        num_layers=61, hidden_size=7168, ffn_hidden_size=18432,
        num_attention_heads=128, vocab_size=129280, seq_length=4096,
        kv_lora_rank=512, q_lora_rank=1536, qk_head_dim=128,
        qk_pos_emb_head_dim=64, v_head_dim=128,
        num_moe_experts=256, moe_router_topk=8, moe_ffn_hidden_size=2048,
        moe_shared_expert_intermediate_size=2048, moe_first_k_dense=3,
        moe_router_score_function='sigmoid', moe_router_enable_expert_bias=True,
        moe_router_num_groups=8, moe_router_group_topk=4,
        moe_router_topk_scaling_factor=2.5, moe_router_norm_topk_prob=True,
        mtp_num_layers=1,
        scan_layers=False,  # first_k_dense layers are heterogeneous
    ), kw)


def gpt3_175b(**kw) -> GPTConfig:
    return _preset(dict(num_layers=96, hidden_size=12288, ffn_hidden_size=49152, num_attention_heads=96, vocab_size=51200, seq_length=2048, normalization='LayerNorm', gated_linear_unit=False, activation='gelu', add_bias_linear=True, position_embedding_type='learned_absolute', share_embeddings_and_output_weights=True), kw)


def gpt_2b(**kw) -> GPTConfig:
    """The BASELINE.json 'Megatron GPT 2B fine-tune' config shape."""
    return _preset(dict(num_layers=24, hidden_size=2048, ffn_hidden_size=5440, num_attention_heads=16, vocab_size=256000, seq_length=4096), kw)


def tiny_test(**kw) -> GPTConfig:
    kw.setdefault("num_layers", 2)
    kw.setdefault("hidden_size", 64)
    kw.setdefault("ffn_hidden_size", 128)
    kw.setdefault("num_attention_heads", 4)
    kw.setdefault("num_query_groups", 2)
    kw.setdefault("vocab_size", 128)
    kw.setdefault("seq_length", 64)
    kw.setdefault("compute_dtype", "float32")
    return _cfg(**kw)




def llama31_8b(**kw) -> GPTConfig:
    """llama3.1: same arch as llama3_8b, 128k context window."""
    return llama3_8b(seq_length=kw.pop("seq_length", 131072), **kw)


def llama31_70b(**kw) -> GPTConfig:
    return llama3_70b(seq_length=kw.pop("seq_length", 131072), **kw)


def llama32_1b(**kw) -> GPTConfig:
    return _preset(dict(num_layers=16, hidden_size=2048, ffn_hidden_size=8192, num_attention_heads=32, num_query_groups=8, vocab_size=128256, seq_length=131072, rotary_base=500000.0, rope_scaling='llama3', rope_scaling_factor=32.0, share_embeddings_and_output_weights=True), kw)


def llama32_3b(**kw) -> GPTConfig:
    return _preset(dict(num_layers=28, hidden_size=3072, ffn_hidden_size=8192, num_attention_heads=24, num_query_groups=8, vocab_size=128256, seq_length=131072, rotary_base=500000.0, rope_scaling='llama3', rope_scaling_factor=32.0, share_embeddings_and_output_weights=True), kw)


def qwen25_500m(**kw) -> GPTConfig:
    return _preset(dict(num_layers=24, hidden_size=896, ffn_hidden_size=4864, num_attention_heads=14, num_query_groups=2, vocab_size=151936, seq_length=32768, add_qkv_bias=True, rotary_base=1000000.0, share_embeddings_and_output_weights=True), kw)


def qwen25_1p5b(**kw) -> GPTConfig:
    return _preset(dict(num_layers=28, hidden_size=1536, ffn_hidden_size=8960, num_attention_heads=12, num_query_groups=2, vocab_size=151936, seq_length=32768, add_qkv_bias=True, rotary_base=1000000.0, share_embeddings_and_output_weights=True), kw)


def qwen25_14b(**kw) -> GPTConfig:
    return _preset(dict(num_layers=48, hidden_size=5120, ffn_hidden_size=13824, num_attention_heads=40, num_query_groups=8, vocab_size=152064, seq_length=32768, add_qkv_bias=True, rotary_base=1000000.0), kw)


def qwen25_32b(**kw) -> GPTConfig:
    return _preset(dict(num_layers=64, hidden_size=5120, ffn_hidden_size=27648, num_attention_heads=40, num_query_groups=8, vocab_size=152064, seq_length=32768, add_qkv_bias=True, rotary_base=1000000.0), kw)


def qwen25_72b(**kw) -> GPTConfig:
    return _preset(dict(num_layers=80, hidden_size=8192, ffn_hidden_size=29568, num_attention_heads=64, num_query_groups=8, vocab_size=152064, seq_length=32768, add_qkv_bias=True, rotary_base=1000000.0), kw)


def qwen3_1p7b(**kw) -> GPTConfig:
    return _preset(dict(num_layers=28, hidden_size=2048, ffn_hidden_size=6144, num_attention_heads=16, num_query_groups=8, kv_channels=128, vocab_size=151936, seq_length=40960, qk_layernorm=True, rotary_base=1000000.0, share_embeddings_and_output_weights=True), kw)


def qwen3_4b(**kw) -> GPTConfig:
    return _preset(dict(num_layers=36, hidden_size=2560, ffn_hidden_size=9728, num_attention_heads=32, num_query_groups=8, kv_channels=128, vocab_size=151936, seq_length=40960, qk_layernorm=True, rotary_base=1000000.0, share_embeddings_and_output_weights=True), kw)


def qwen3_14b(**kw) -> GPTConfig:
    return _preset(dict(num_layers=40, hidden_size=5120, ffn_hidden_size=17408, num_attention_heads=40, num_query_groups=8, kv_channels=128, vocab_size=151936, seq_length=40960, qk_layernorm=True, rotary_base=1000000.0), kw)


def qwen3_32b(**kw) -> GPTConfig:
    return _preset(dict(num_layers=64, hidden_size=5120, ffn_hidden_size=25600, num_attention_heads=64, num_query_groups=8, kv_channels=128, vocab_size=151936, seq_length=40960, qk_layernorm=True, rotary_base=1000000.0), kw)


def qwen3_30b_a3b(**kw) -> GPTConfig:
    """reference recipes/qwen3_30b_a3b: 128-expert top-8 MoE."""
    return _preset(dict(num_layers=48, hidden_size=2048, ffn_hidden_size=6144, num_attention_heads=32, num_query_groups=4, kv_channels=128, vocab_size=151936, seq_length=40960, qk_layernorm=True, rotary_base=1000000.0, num_moe_experts=128, moe_router_topk=8, moe_ffn_hidden_size=768, moe_router_norm_topk_prob=True, moe_aux_loss_coeff=0.001), kw)


def qwen3_235b_a22b(**kw) -> GPTConfig:
    return _preset(dict(num_layers=94, hidden_size=4096, ffn_hidden_size=12288, num_attention_heads=64, num_query_groups=4, kv_channels=128, vocab_size=151936, seq_length=40960, qk_layernorm=True, rotary_base=1000000.0, num_moe_experts=128, moe_router_topk=8, moe_ffn_hidden_size=1536, moe_router_norm_topk_prob=True, moe_aux_loss_coeff=0.001), kw)


def gemma_2b(**kw) -> GPTConfig:
    return _preset(dict(num_layers=18, hidden_size=2048, ffn_hidden_size=16384, num_attention_heads=8, num_query_groups=1, kv_channels=256, vocab_size=256000, seq_length=8192, activation='gelu', share_embeddings_and_output_weights=True, layernorm_zero_centered_gamma=True, embedding_multiplier=2048**0.5), kw)


def gemma2_9b(**kw) -> GPTConfig:
    """reference gpt/model/gemma2.py: logit softcap + interleaved window."""
    return _preset(dict(num_layers=42, hidden_size=3584, ffn_hidden_size=14336, num_attention_heads=16, num_query_groups=8, kv_channels=256, vocab_size=256000, seq_length=8192, activation='gelu', share_embeddings_and_output_weights=True, layernorm_zero_centered_gamma=True, embedding_multiplier=3584**0.5, logit_softcapping=30.0, attn_logit_softcapping=50.0, sandwich_norms=True, window_pattern=(4096, None)), kw)


def gemma2_27b(**kw) -> GPTConfig:
    return _preset(dict(num_layers=46, hidden_size=4608, ffn_hidden_size=36864, num_attention_heads=32, num_query_groups=16, kv_channels=128, vocab_size=256000, seq_length=8192, activation='gelu', share_embeddings_and_output_weights=True, layernorm_zero_centered_gamma=True, embedding_multiplier=4608**0.5, logit_softcapping=30.0, attn_logit_softcapping=50.0, attention_multiplier=(4608 // 32) ** -0.5, sandwich_norms=True, window_pattern=(4096, None)), kw)


def starcoder2_3b(**kw) -> GPTConfig:
    return starcoder2_7b(num_layers=30, hidden_size=3072, ffn_hidden_size=12288, num_attention_heads=24, num_query_groups=2, **kw)


def starcoder2_15b(**kw) -> GPTConfig:
    return starcoder2_7b(num_layers=40, hidden_size=6144, ffn_hidden_size=24576, num_attention_heads=48, num_query_groups=4, **kw)


def nemotron3_8b(**kw) -> GPTConfig:
    return nemotron4_15b(num_layers=32, hidden_size=4096, ffn_hidden_size=16384, num_attention_heads=32, num_query_groups=None, rotary_percent=0.5, **kw)


def mixtral_8x22b(**kw) -> GPTConfig:
    return _preset(dict(num_layers=56, hidden_size=6144, ffn_hidden_size=16384, num_attention_heads=48, num_query_groups=8, vocab_size=32768, seq_length=65536, num_moe_experts=8, moe_router_topk=2, moe_aux_loss_coeff=0.02), kw)


def deepseek_v2_lite(**kw) -> GPTConfig:
    """reference gpt/model/deepseek.py DeepSeekV2LiteConfig (MLA without
    q-lora, 64-expert top-6 softmax routing, 2 shared experts)."""
    return _preset(dict(
        num_layers=27, hidden_size=2048, ffn_hidden_size=10944,
        num_attention_heads=16, vocab_size=102400, seq_length=4096,
        kv_lora_rank=512, q_lora_rank=None, qk_head_dim=128,
        qk_pos_emb_head_dim=64, v_head_dim=128,
        num_moe_experts=64, moe_router_topk=6, moe_ffn_hidden_size=1408,
        moe_shared_expert_intermediate_size=2816, moe_first_k_dense=1,
        moe_aux_loss_coeff=0.003, scan_layers=False,
    ), kw)


def deepseek_v2(**kw) -> GPTConfig:
    """reference gpt/model/deepseek.py:136 DeepSeekV2Config (full V2: MLA
    with q-lora 1536, 160-expert top-6, 2 shared experts, first layer
    dense)."""
    return _preset(dict(
        num_layers=60, hidden_size=5120, ffn_hidden_size=12288,
        num_attention_heads=128, vocab_size=102400, seq_length=4096,
        kv_lora_rank=512, q_lora_rank=1536, qk_head_dim=128,
        qk_pos_emb_head_dim=64, v_head_dim=128,
        num_moe_experts=160, moe_router_topk=6, moe_ffn_hidden_size=1536,
        moe_shared_expert_intermediate_size=3072, moe_first_k_dense=1,
        moe_aux_loss_coeff=0.003, scan_layers=False,
    ), kw)


def qwen2_500m(**kw) -> GPTConfig:
    """reference gpt/model/qwen2.py:60 Qwen2Config500M."""
    return _preset(dict(num_layers=24, hidden_size=896, ffn_hidden_size=4864, num_attention_heads=14, num_query_groups=2, vocab_size=151936, seq_length=4096, add_qkv_bias=True, rotary_base=1000000.0, share_embeddings_and_output_weights=True), kw)


def qwen2_1p5b(**kw) -> GPTConfig:
    """reference gpt/model/qwen2.py:82 Qwen2Config1P5B."""
    return _preset(dict(num_layers=28, hidden_size=1536, ffn_hidden_size=8960, num_attention_heads=12, num_query_groups=2, vocab_size=151936, seq_length=4096, add_qkv_bias=True, rotary_base=1000000.0, share_embeddings_and_output_weights=True), kw)


def qwen2_72b(**kw) -> GPTConfig:
    """reference gpt/model/qwen2.py:174 Qwen2Config72B."""
    return _preset(dict(num_layers=80, hidden_size=8192, ffn_hidden_size=29568, num_attention_heads=64, num_query_groups=8, vocab_size=152064, seq_length=4096, add_qkv_bias=True, rotary_base=1000000.0), kw)


def qwen3_600m(**kw) -> GPTConfig:
    """reference gpt/model/qwen3.py:69 Qwen3Config600M."""
    return _preset(dict(num_layers=28, hidden_size=1024, ffn_hidden_size=3072, num_attention_heads=16, num_query_groups=8, kv_channels=128, vocab_size=151936, seq_length=40960, qk_layernorm=True, rotary_base=1000000.0, share_embeddings_and_output_weights=True), kw)


def gemma2_2b(**kw) -> GPTConfig:
    """reference gpt/model/gemma2.py:124 Gemma2Config2B
    (query_pre_attn_scalar 256 → attention_multiplier 1/16)."""
    return _preset(dict(num_layers=26, hidden_size=2304, ffn_hidden_size=9216, num_attention_heads=8, num_query_groups=4, kv_channels=256, vocab_size=256000, seq_length=8192, activation='gelu', share_embeddings_and_output_weights=True, layernorm_zero_centered_gamma=True, embedding_multiplier=2304**0.5, logit_softcapping=30.0, attn_logit_softcapping=50.0, attention_multiplier=256 ** -0.5, sandwich_norms=True, window_pattern=(4096, None)), kw)


def mistral_nemo_12b(**kw) -> GPTConfig:
    """reference gpt/model/mistral.py:68 MistralNeMoConfig12B (no sliding
    window, kv_channels 128, theta 1e6)."""
    return _preset(dict(num_layers=40, hidden_size=5120, ffn_hidden_size=14336, num_attention_heads=32, num_query_groups=8, kv_channels=128, vocab_size=131072, seq_length=4096, rotary_base=1000000.0), kw)


def nemotron3_4b(**kw) -> GPTConfig:
    """reference gpt/model/nemotron.py:72 Nemotron3Config4B."""
    return nemotron4_15b(num_layers=32, hidden_size=3072, ffn_hidden_size=9216, num_attention_heads=24, num_query_groups=8, kv_channels=128, init_method_std=0.0134, **kw)


def nemotron3_22b(**kw) -> GPTConfig:
    """reference gpt/model/nemotron.py:104 Nemotron3Config22B (MHA)."""
    return nemotron4_15b(num_layers=40, hidden_size=6144, ffn_hidden_size=24576, num_attention_heads=48, num_query_groups=None, init_method_std=0.008, **kw)


def starcoder_15b(**kw) -> GPTConfig:
    """reference gpt/model/starcoder.py:62 StarcoderConfig15B (starcoder-1:
    MQA, learned absolute positions, gelu+bias MLP, dropout 0.2)."""
    return _preset(dict(num_layers=40, hidden_size=6144, ffn_hidden_size=24576, num_attention_heads=48, num_query_groups=1, vocab_size=49152, seq_length=8192, normalization='LayerNorm', gated_linear_unit=False, activation='gelu', add_bias_linear=True, position_embedding_type='learned_absolute', hidden_dropout=0.2, attention_dropout=0.2, init_method_std=0.01), kw)


def llama31_nemotron_nano_8b(**kw) -> GPTConfig:
    """reference gpt/model/llama_nemotron.py:60 (llama31_8b + kv_channels
    128)."""
    return llama31_8b(kv_channels=128, **kw)


def llama31_nemotron_70b(**kw) -> GPTConfig:
    """reference gpt/model/llama_nemotron.py:66 (llama31_70b + kv_channels
    128)."""
    return llama31_70b(kv_channels=128, **kw)


def llama33_nemotron_super_49b(**kw) -> GPTConfig:
    """reference llama_nemotron.py:88 Llama33NemotronSuper49BConfig.

    UNIFORM-LAYER APPROXIMATION: the reference is a NAS-pruned hetero
    stack (per-layer ffn/attention from
    LLAMA_33_NEMOTRON_SUPER_49B_HETEROGENEOUS_CONFIG JSON); this preset
    keeps the headline dims (80 layers, hidden 8192, 64 heads) with
    uniform llama-70b-style layers, so it is NOT checkpoint-compatible
    with the pruned release."""
    return llama31_70b(num_layers=80, hidden_size=8192,
                       num_attention_heads=64, **kw)


def llama31_nemotron_ultra_253b(**kw) -> GPTConfig:
    """reference llama_nemotron.py:100 Llama31NemotronUltra253BConfig.
    UNIFORM-LAYER APPROXIMATION (see llama33_nemotron_super_49b)."""
    return llama31_405b(num_layers=162, hidden_size=16384,
                        num_attention_heads=128, **kw)


# ---- gemma3 (reference gpt/model/gemma3.py: 5-local+1-global interleaved
# window pattern, dual rope bases 10k local / 1M global, linear rope
# scaling on global layers, per-head qk-norm) ------------------------------

_GEMMA3_BASE = dict(
    vocab_size=262144, seq_length=131072, rotary_base=1000000.0,
    rope_local_base=10000.0, qk_layernorm=True,
    layernorm_zero_centered_gamma=True, layernorm_epsilon=1e-6,
    share_embeddings_and_output_weights=True, activation='gelu',
    sandwich_norms=True)


def gemma3_1b(**kw) -> GPTConfig:
    return _preset(dict(_GEMMA3_BASE, num_layers=26, hidden_size=1152,
                        num_attention_heads=4, num_query_groups=1,
                        kv_channels=256, ffn_hidden_size=6912,
                        seq_length=32768,
                        window_pattern=(512, 512, 512, 512, 512, None),
                        embedding_multiplier=1152 ** 0.5), kw)


def gemma3_4b(**kw) -> GPTConfig:
    return _preset(dict(_GEMMA3_BASE, num_layers=34, hidden_size=2560,
                        num_attention_heads=8, num_query_groups=4,
                        kv_channels=256, ffn_hidden_size=10240,
                        vocab_size=262208,
                        window_pattern=(1024, 1024, 1024, 1024, 1024, None),
                        rope_scaling='linear', rope_scaling_factor=8.0,
                        embedding_multiplier=2560 ** 0.5), kw)


def gemma3_12b(**kw) -> GPTConfig:
    return _preset(dict(_GEMMA3_BASE, num_layers=48, hidden_size=3840,
                        num_attention_heads=16, num_query_groups=8,
                        kv_channels=256, ffn_hidden_size=15360,
                        vocab_size=262208,
                        window_pattern=(1024, 1024, 1024, 1024, 1024, None),
                        rope_scaling='linear', rope_scaling_factor=8.0,
                        embedding_multiplier=3840 ** 0.5), kw)


def gemma3_27b(**kw) -> GPTConfig:
    return _preset(dict(_GEMMA3_BASE, num_layers=62, hidden_size=5376,
                        num_attention_heads=32, num_query_groups=16,
                        kv_channels=128, ffn_hidden_size=21504,
                        vocab_size=262208,
                        window_pattern=(1024, 1024, 1024, 1024, 1024, None),
                        rope_scaling='linear', rope_scaling_factor=8.0,
                        attention_multiplier=168 ** -0.5,
                        embedding_multiplier=5376 ** 0.5), kw)


# ---- llama4 (reference gpt/model/llama.py Llama4Config: NoPE every 4th
# layer, chunked local attention, interleaved rotary, qk L2 norm, top-1
# sigmoid MoE with a large shared expert) ----------------------------------

_LLAMA4_BASE = dict(
    num_layers=48, hidden_size=5120, ffn_hidden_size=16384,
    num_attention_heads=40, num_query_groups=8, vocab_size=202048,
    seq_length=8192, rotary_base=500000.0, rotary_interleaved=True,
    nope_layer_interval=4, attention_chunk_size=8192,
    moe_router_topk=1, moe_router_score_function='sigmoid',
    moe_ffn_hidden_size=8192, moe_shared_expert_intermediate_size=8192,
    moe_aux_loss_coeff=0.001)


def llama4_scout(**kw) -> GPTConfig:
    """Llama-4-Scout (16 experts, every layer MoE, llama3 rope scaling)."""
    return _preset(dict(_LLAMA4_BASE, num_moe_experts=16,
                        rope_scaling='llama3', rope_scaling_factor=8.0,
                        qk_l2_norm=True), kw)


def llama4_maverick(**kw) -> GPTConfig:
    """Llama-4-Maverick (128 experts, MoE every other layer)."""
    return _preset(dict(_LLAMA4_BASE, num_moe_experts=128,
                        moe_layer_freq=(0, 1)), kw)


# ---- gpt-oss (reference gpt/model/gpt_oss.py: alternating SWA(128)/full
# attention, learnable sinks, yarn rope ×32, clamped quick-gelu GLU MoE) ---

_GPT_OSS_BASE = dict(
    hidden_size=2880, num_attention_heads=64, num_query_groups=8,
    kv_channels=64, ffn_hidden_size=2880, moe_ffn_hidden_size=2880,
    vocab_size=201088, seq_length=131072, rotary_base=150000.0,
    rope_scaling='yarn', rope_scaling_factor=32.0, old_context_len=4096,
    window_pattern=(128, None), attention_sinks=True, add_qkv_bias=True,
    add_bias_linear=True, activation='quick_gelu', activation_clamp=7.0,
    glu_linear_offset=1.0, moe_router_topk=4, moe_aux_loss_coeff=0.01)


def gpt_oss_20b(**kw) -> GPTConfig:
    return _preset(dict(_GPT_OSS_BASE, num_layers=24, num_moe_experts=32), kw)


def gpt_oss_120b(**kw) -> GPTConfig:
    return _preset(dict(_GPT_OSS_BASE, num_layers=36, num_moe_experts=128), kw)


def chatglm3_6b(**kw) -> GPTConfig:
    """reference gpt/model/chatglm.py: half-rotary interleaved rope, qkv
    bias, 2-group GQA, 65024 vocab."""
    return _preset(dict(num_layers=28, hidden_size=4096,
                        ffn_hidden_size=13696, num_attention_heads=32,
                        num_query_groups=2, vocab_size=65024,
                        seq_length=8192, rotary_percent=0.5,
                        rotary_interleaved=True, add_qkv_bias=True), kw)


def baichuan2_7b(**kw) -> GPTConfig:
    """reference gpt/model/baichuan.py Baichuan2Config7B."""
    return _preset(dict(num_layers=32, hidden_size=4096,
                        ffn_hidden_size=11008, num_attention_heads=32,
                        vocab_size=125696, seq_length=4096,
                        layernorm_epsilon=1e-6), kw)


PRESETS = {
    "deepseek_v2": deepseek_v2,
    "qwen2_500m": qwen2_500m,
    "qwen2_1p5b": qwen2_1p5b,
    "qwen2_72b": qwen2_72b,
    "qwen3_600m": qwen3_600m,
    "gemma2_2b": gemma2_2b,
    "mistral_nemo_12b": mistral_nemo_12b,
    "nemotron3_4b": nemotron3_4b,
    "nemotron3_22b": nemotron3_22b,
    "starcoder_15b": starcoder_15b,
    "llama31_nemotron_nano_8b": llama31_nemotron_nano_8b,
    "llama31_nemotron_70b": llama31_nemotron_70b,
    "llama33_nemotron_super_49b": llama33_nemotron_super_49b,
    "llama31_nemotron_ultra_253b": llama31_nemotron_ultra_253b,
    "llama2_7b": llama2_7b,
    "llama3_8b": llama3_8b,
    "llama3_70b": llama3_70b,
    "llama31_405b": llama31_405b,
    "mistral_7b": mistral_7b,
    "mixtral_8x7b": mixtral_8x7b,
    "gemma_7b": gemma_7b,
    "qwen2_7b": qwen2_7b,
    "qwen3_8b": qwen3_8b,
    "phi3_mini_4k": phi3_mini_4k,
    "starcoder2_7b": starcoder2_7b,
    "nemotron4_15b": nemotron4_15b,
    "nemotron4_340b": nemotron4_340b,
    "qwen25_7b": qwen25_7b,
    "deepseek_v3": deepseek_v3,
    "gpt3_175b": gpt3_175b,
    "gpt_2b": gpt_2b,
    "llama31_8b": llama31_8b,
    "llama31_70b": llama31_70b,
    "llama32_1b": llama32_1b,
    "llama32_3b": llama32_3b,
    "qwen25_500m": qwen25_500m,
    "qwen25_1p5b": qwen25_1p5b,
    "qwen25_14b": qwen25_14b,
    "qwen25_32b": qwen25_32b,
    "qwen25_72b": qwen25_72b,
    "qwen3_1p7b": qwen3_1p7b,
    "qwen3_4b": qwen3_4b,
    "qwen3_14b": qwen3_14b,
    "qwen3_32b": qwen3_32b,
    "qwen3_30b_a3b": qwen3_30b_a3b,
    "qwen3_235b_a22b": qwen3_235b_a22b,
    "gemma_2b": gemma_2b,
    "gemma2_9b": gemma2_9b,
    "gemma2_27b": gemma2_27b,
    "starcoder2_3b": starcoder2_3b,
    "starcoder2_15b": starcoder2_15b,
    "nemotron3_8b": nemotron3_8b,
    "mixtral_8x22b": mixtral_8x22b,
    "deepseek_v2_lite": deepseek_v2_lite,
    "gemma3_1b": gemma3_1b,
    "gemma3_4b": gemma3_4b,
    "gemma3_12b": gemma3_12b,
    "gemma3_27b": gemma3_27b,
    "llama4_scout": llama4_scout,
    "llama4_maverick": llama4_maverick,
    "gpt_oss_20b": gpt_oss_20b,
    "gpt_oss_120b": gpt_oss_120b,
    "chatglm3_6b": chatglm3_6b,
    "baichuan2_7b": baichuan2_7b,
    "tiny_test": tiny_test,
}
