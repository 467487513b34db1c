"""AutoConfigurator: search parallelism configs for a model + chip budget.

Reference parity: `nemo/collections/llm/tools/auto_configurator/` (the
runner generates candidate tp/pp/mbs/gbs configs from model size +
hardware, launches short runs, picks the best). TPU-native version:
an *analytic* first pass — per-candidate HBM-footprint and modeled
step-throughput — returning ranked, feasible (tp, fsdp, cp, mbs)
settings; the measured pass plugs each candidate into GPTTrainModule and
times a few steps (`measure_candidates`).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np

from nemo_tpu.models.llm.config import GPTConfig
from nemo_tpu.parallel.mesh import MeshConfig


@dataclasses.dataclass
class Candidate:
    tp: int
    fsdp: int
    dp: int
    cp: int
    micro_batch: int
    est_hbm_gb: float
    est_step_tflops_per_chip: float  # useful model TFLOPs per chip per step
    feasible: bool

    @property
    def mesh(self) -> MeshConfig:
        return MeshConfig(dp=self.dp, fsdp=self.fsdp, tp=self.tp, cp=self.cp)


def _param_count(cfg: GPTConfig) -> float:
    """Transformer parameter count (dense; MoE counts all experts)."""
    D, F, L, V = cfg.hidden_size, cfg.ffn_hidden_size, cfg.num_layers, cfg.vocab_size
    H, G, dh = cfg.num_attention_heads, cfg.n_kv_heads, cfg.head_dim
    attn = D * H * dh + 2 * D * G * dh + H * dh * D
    mult = 2 if cfg.gated_linear_unit else 1
    if cfg.num_moe_experts:
        Fm = cfg.moe_ffn_hidden_size or F
        mlp = cfg.num_moe_experts * (mult * D * Fm + Fm * D) + D * cfg.num_moe_experts
        if cfg.moe_shared_expert_intermediate_size:
            S = cfg.moe_shared_expert_intermediate_size
            mlp += mult * D * S + S * D
    else:
        mlp = mult * D * F + F * D
    emb = V * D * (1 if cfg.share_embeddings_and_output_weights else 2)
    return float(L * (attn + mlp + 2 * D) + emb + D)


def model_flops_per_token(cfg: GPTConfig) -> float:
    """Fwd+bwd useful FLOPs per token (6·N_active + attention term)."""
    n = _param_count(cfg)
    if cfg.num_moe_experts:
        # only topk experts are active per token
        Fm = cfg.moe_ffn_hidden_size or cfg.ffn_hidden_size
        mult = 2 if cfg.gated_linear_unit else 1
        all_e = cfg.num_moe_experts * (mult * cfg.hidden_size * Fm + Fm * cfg.hidden_size)
        act_e = cfg.moe_router_topk * (mult * cfg.hidden_size * Fm + Fm * cfg.hidden_size)
        n = n - cfg.num_layers * (all_e - act_e)
    attn = 12 * cfg.num_layers * cfg.hidden_size * cfg.seq_length / 2  # causal
    return 6.0 * n + attn


def estimate_hbm_gb(cfg: GPTConfig, tp: int, fsdp: int, cp: int,
                    micro_batch: int) -> float:
    """Per-chip HBM: fp32 params + Adam (2×fp32) sharded over tp·fsdp,
    bf16 activations per microbatch under remat='dots' (GEMM outputs of
    one layer stack survive), logits chunk, workspace."""
    n = _param_count(cfg)
    shards = tp * fsdp
    state = n * (4 + 8) / shards  # master params + adam m,v
    S = cfg.seq_length // max(cp, 1)
    D, F, L = cfg.hidden_size, cfg.ffn_hidden_size, cfg.num_layers
    mult = 2 if cfg.gated_linear_unit else 1
    if cfg.remat == "full":
        # only the scan carry survives per layer, sequence-sharded over tp
        # (Megatron-SP: act_seq_sp axis) and cp
        per_layer = micro_batch * S * D * 2 / tp
    else:
        # 'dots': GEMM outputs persist — q/k/v/attn-out + mlp hidden are
        # head/mlp-sharded over tp, the carry is SP-sharded
        per_layer = micro_batch * S * (D / tp + (4 * D + mult * F + D) / tp) * 2
    acts = L * per_layer
    logits = micro_batch * min(S, 512) * cfg.vocab_size * 4 / tp  # fused-CE chunk
    grads = n * 4 / shards  # fp32 grad accumulation buffer
    return (state + grads + acts + logits) / 1e9 + 0.8  # + runtime overhead


def serving_memory_plan(cfg: GPTConfig, *, max_slots: int, max_len: int,
                        quantize_weights: bool = False,
                        quantize_kv_cache: bool = False,
                        hbm_gb: float = 15.75) -> dict:
    """Analytic HBM plan for the continuous-batching serving engine
    (reference: the TRT-LLM engine-build memory estimator role).

    Accounts for the round-3 serving memory features: int8 weight-resident
    PTQ (1 byte + per-channel scales vs 2 bf16), int8 KV cache (1 byte +
    per-(token,head) scale vs 2), and the MLA latent cache (r+dr per token
    instead of H·(dn+dr+dv), picked automatically for kv_lora_rank
    configs). Returns component GiB, the max slots that fit, and fits."""
    n = _param_count(cfg)
    if quantize_weights:
        weights = n * 1.0  # int8 (+ scales: ~1/contract_dim, negligible)
    else:
        weights = n * 2.0  # bf16
    if cfg.kv_lora_rank:
        per_tok = cfg.kv_lora_rank + cfg.qk_pos_emb_head_dim  # latent cache
        heads = 1
    else:
        per_tok = 2 * cfg.n_kv_heads * cfg.head_dim
        heads = cfg.n_kv_heads
    bytes_per = 1 + 4.0 * heads / max(per_tok, 1) if quantize_kv_cache else 2
    kv = cfg.num_layers * max_slots * max_len * per_tok * bytes_per
    # decode working set: one token per slot of activations + logits rows
    work = max_slots * (cfg.hidden_size * cfg.num_layers * 2
                        + cfg.vocab_size * 4)
    total = (weights + kv + work) / 1e9 + 0.8
    work_per_slot = (cfg.hidden_size * cfg.num_layers * 2
                     + cfg.vocab_size * 4) / 1e9
    per_slot = cfg.num_layers * max_len * per_tok * bytes_per / 1e9 + work_per_slot
    budget = hbm_gb - weights / 1e9 - 0.8
    return {
        "weights_gb": round(weights / 1e9, 3),
        "kv_cache_gb": round(kv / 1e9, 3),
        "total_gb": round(total, 3),
        "fits": total <= hbm_gb,
        "max_slots_at_len": int(max(0, budget // max(per_slot, 1e-12))),
    }


def generate_configs(
    cfg: GPTConfig,
    num_chips: int,
    global_batch_size: int,
    *,
    hbm_gb_per_chip: float = 16.0,  # v5e
    peak_tflops: float = 197.0,     # v5e bf16
    max_micro_batch: int = 8,
    long_context_cp: bool = True,
) -> List[Candidate]:
    """Enumerate + rank candidates. Returns feasible-first, ranked by
    modeled per-chip throughput (reference: auto_configurator runner's
    candidate grid, analytically pre-filtered)."""
    flops_tok = model_flops_per_token(cfg)
    out: List[Candidate] = []
    tps = [t for t in (1, 2, 4, 8, 16) if t <= num_chips
           and cfg.num_attention_heads % t == 0]
    for tp in tps:
        rest = num_chips // tp
        cps = [1]
        if long_context_cp and cfg.seq_length >= 32768:
            cps += [c for c in (2, 4, 8) if c <= rest and cfg.seq_length % (2 * c) == 0]
        for cp in cps:
            rest2 = rest // cp
            if rest2 < 1:
                continue
            for fsdp in [f for f in (1, 2, 4, 8, 16, 32, 64, 128, 256) if f <= rest2]:
                dp = rest2 // fsdp
                if dp * fsdp * tp * cp != num_chips:
                    continue
                if global_batch_size % (dp * fsdp):
                    continue
                for mbs in (1, 2, 4, 8):
                    if mbs > max_micro_batch:
                        break
                    if (global_batch_size // (dp * fsdp)) % mbs:
                        continue
                    hbm = estimate_hbm_gb(cfg, tp, fsdp, cp, mbs)
                    feas = hbm <= hbm_gb_per_chip * 0.92
                    # comm penalty: tp collectives per layer grow with tp;
                    # fsdp all-gathers amortize over layers (rough model)
                    eff = 0.55 / (1 + 0.03 * (tp - 1) + 0.01 * (fsdp > 1) + 0.05 * (cp - 1))
                    tflops = peak_tflops * eff
                    out.append(Candidate(tp=tp, fsdp=fsdp, dp=dp, cp=cp,
                                         micro_batch=mbs, est_hbm_gb=round(hbm, 2),
                                         est_step_tflops_per_chip=round(tflops, 1),
                                         feasible=feas))
    out.sort(key=lambda c: (not c.feasible, -c.est_step_tflops_per_chip, c.est_hbm_gb))
    return out


def recommend(cfg: GPTConfig, num_chips: int, global_batch_size: int, **kw
              ) -> Optional[Candidate]:
    for c in generate_configs(cfg, num_chips, global_batch_size, **kw):
        if c.feasible:
            return c
    return None


def measure_candidates(cfg: GPTConfig, candidates: Sequence[Candidate],
                       steps: int = 3, seq_len: Optional[int] = None):
    """Second pass: run a few real train steps per candidate and return
    [(candidate, sec_per_step)] sorted fastest-first (the reference's
    launched-run measurement, in-process)."""
    import time

    import jax
    import jax.numpy as jnp

    from nemo_tpu.models.llm.train import GPTTrainModule

    results = []
    for c in candidates:
        mod = GPTTrainModule(cfg, mesh_cfg=c.mesh)
        state = mod.init_state()
        S = seq_len or cfg.seq_length
        B = c.dp * c.fsdp * c.micro_batch
        rng = np.random.RandomState(0)
        batch = {
            "tokens": jnp.asarray(rng.randint(0, cfg.vocab_size, (B, S)), jnp.int32),
            "labels": jnp.asarray(rng.randint(0, cfg.vocab_size, (B, S)), jnp.int32),
            "loss_mask": jnp.ones((B, S), jnp.float32),
        }
        state, _ = mod.train_step(state, batch, jax.random.PRNGKey(0))  # compile
        t0 = time.perf_counter()
        for i in range(steps):
            state, m = mod.train_step(state, batch, jax.random.PRNGKey(i))
        float(m["loss"])  # sync
        results.append((c, (time.perf_counter() - t0) / steps))
    results.sort(key=lambda x: x[1])
    return results
