"""Recommended model-parallel configuration database (TPU tuning DB).

Reference parity: `scripts/performance/recommended_model_configs/
model_configs_{h100,b200,gb200}.csv` — NVIDIA's published tuning database
mapping (task, model, dtype, #GPUs, seq_len) → TP/PP/CP/EP/VP/MBS/GBS, the
numbers behind every perf-tuned recipe.

TPU translation: the knobs are mesh axis sizes (fsdp as the workhorse axis
on ICI — the reference's TP+PP split mostly maps to fsdp+tp here per the
scaling-book recipe), cp for long context, ep for MoE, pp only where a
model's per-layer working set plus fsdp-sharded state still overflows HBM
(175B/340B/405B class). Rows are validated against the OOM-calibrated HBM
model in `llm/auto_configurator.py` (scripts/hbm_validate.py measured the
calibration on a real v5e chip).

Query surface:
    recommended_config("llama3_8b", n_chips=16)      → TunedConfig
    recommended_config("llama3_8b", 16, seq_len=65536)
    tuned_recipe("llama3_8b", 16)                    → Recipe (ready to fit)
    dump_csv()                                       → reference CSV format
"""

from __future__ import annotations

import dataclasses
import io
from typing import List, Optional

from nemo_tpu.parallel.mesh import MeshConfig

_SYSTEMS = {
    # name: (HBM GB/chip, bf16 peak TFLOP/s)
    "v5e": (16.0, 197.0),
    "v5p": (95.0, 459.0),
}


@dataclasses.dataclass(frozen=True)
class TunedConfig:
    """One tuning-DB row (reference CSV columns: task,model,size,system,
    dtype,num_gpus,seq_len,tp/pp/cp/ep/vp,mbs,gbs)."""

    task: str           # pre_train | sft | lora
    model: str          # preset name in models/llm/config.PRESETS
    system: str         # v5e | v5p
    dtype: str          # bf16 | fp8
    n_chips: int
    seq_len: int
    tp: int = 1
    pp: int = 1
    cp: int = 1
    ep: int = 1
    fsdp: int = 1
    mbs: int = 1
    gbs: int = 128

    @property
    def dp(self) -> int:
        denom = self.tp * self.pp * self.cp * self.ep * self.fsdp
        assert self.n_chips % denom == 0, (self.model, self.n_chips, denom)
        return self.n_chips // denom

    def mesh(self) -> MeshConfig:
        return MeshConfig(dp=self.dp, fsdp=self.fsdp, cp=self.cp,
                          ep=self.ep, tp=self.tp, pp=self.pp)

    @property
    def num_microbatches(self) -> int:
        data_shards = self.dp * self.fsdp
        assert self.gbs % (data_shards * self.mbs) == 0, self
        return self.gbs // (data_shards * self.mbs)


# Rows follow the reference DB's shape: one row per (model, chip-count)
# operating point. fsdp replaces most of the reference's PP (TPU slices
# favor ZeRO-3-style weight sharding over ICI); pp appears only for the
# 175B+ class where fsdp alone can't fit fp32 state + a full layer stack.
DB: List[TunedConfig] = [
    # -- llama3 family (ref model_configs: llama3-8b bf16 8 GPU TP1 PP1 CP2).
    # v5e (16 GB) needs ≥16 chips for 7-8B-class fp32 Adam state — the
    # HBM-validated floor; the reference's 8×H100-80GB row has no v5e analog.
    TunedConfig("pre_train", "llama3_8b", "v5e", "bf16", 16, 8192,
                fsdp=16, mbs=1, gbs=256),
    TunedConfig("pre_train", "llama3_8b", "v5p", "bf16", 8, 8192,
                fsdp=8, mbs=2, gbs=128),
    TunedConfig("pre_train", "llama3_8b", "v5e", "bf16", 32, 16384,
                fsdp=16, cp=2, mbs=1, gbs=128),
    TunedConfig("pre_train", "llama3_8b", "v5e", "bf16", 64, 65536,
                fsdp=16, cp=4, mbs=1, gbs=64),
    TunedConfig("pre_train", "llama3_8b", "v5e", "bf16", 128, 131072,
                tp=2, fsdp=16, cp=4, mbs=1, gbs=32),
    TunedConfig("pre_train", "llama3_70b", "v5e", "bf16", 128, 8192,
                tp=4, fsdp=32, mbs=1, gbs=128),
    TunedConfig("pre_train", "llama3_70b", "v5p", "bf16", 64, 8192,
                tp=4, fsdp=16, mbs=1, gbs=128),
    # 126 layers: pp=6 → 21 layers/stage (even stages; reference uses
    # asymmetric pp=8 — flexible layout has no even-divisor analog here)
    TunedConfig("pre_train", "llama31_405b", "v5p", "bf16", 768, 8192,
                tp=8, pp=6, fsdp=16, mbs=1, gbs=256),
    TunedConfig("pre_train", "llama31_405b", "v5e", "bf16", 1536, 8192,
                tp=8, pp=6, fsdp=32, mbs=1, gbs=512),
    # -- gpt3 (ref: gpt3-175b fp8 512 GPU TP4 PP8 VP6 MBS2 GBS2048) --
    TunedConfig("pre_train", "gpt3_175b", "v5e", "bf16", 512, 2048,
                tp=4, pp=8, fsdp=16, mbs=2, gbs=2048),
    TunedConfig("pre_train", "gpt3_175b", "v5p", "bf16", 256, 2048,
                tp=4, pp=4, fsdp=16, mbs=2, gbs=1024),
    # -- mistral / mixtral (ref: mixtral-8x7b bf16 64 GPU EP8) --
    TunedConfig("pre_train", "mistral_7b", "v5e", "bf16", 16, 4096,
                fsdp=16, mbs=1, gbs=128),
    TunedConfig("pre_train", "mixtral_8x7b", "v5e", "bf16", 64, 4096,
                ep=8, fsdp=8, mbs=1, gbs=256),
    TunedConfig("pre_train", "mixtral_8x22b", "v5p", "bf16", 256, 65536,
                tp=4, ep=8, cp=8, mbs=1, gbs=64),
    # -- qwen --
    TunedConfig("pre_train", "qwen25_7b", "v5e", "bf16", 16, 4096,
                fsdp=16, mbs=1, gbs=128),
    TunedConfig("pre_train", "qwen25_72b", "v5p", "bf16", 64, 4096,
                tp=4, fsdp=16, mbs=1, gbs=128),
    TunedConfig("pre_train", "qwen3_30b_a3b", "v5e", "bf16", 64, 4096,
                ep=8, fsdp=8, mbs=1, gbs=128),
    TunedConfig("pre_train", "qwen3_235b_a22b", "v5p", "bf16", 256, 4096,
                tp=4, ep=8, fsdp=8, mbs=1, gbs=256),
    # -- deepseek --
    TunedConfig("pre_train", "deepseek_v2_lite", "v5e", "bf16", 32, 4096,
                ep=8, fsdp=4, mbs=1, gbs=128),
    TunedConfig("pre_train", "deepseek_v3", "v5p", "bf16", 1024, 4096,
                tp=8, ep=8, fsdp=16, mbs=1, gbs=512),
    # -- gemma --
    TunedConfig("pre_train", "gemma2_9b", "v5e", "bf16", 16, 8192,
                fsdp=16, mbs=1, gbs=128),
    TunedConfig("pre_train", "gemma2_27b", "v5p", "bf16", 32, 8192,
                tp=2, fsdp=16, mbs=1, gbs=128),
    TunedConfig("pre_train", "gemma3_27b", "v5p", "bf16", 32, 8192,
                tp=2, fsdp=16, mbs=1, gbs=128),
    # -- nemotron --
    TunedConfig("pre_train", "nemotron4_15b", "v5e", "bf16", 32, 4096,
                fsdp=32, mbs=1, gbs=256),
    TunedConfig("pre_train", "nemotron4_340b", "v5p", "bf16", 512, 4096,
                tp=8, pp=8, fsdp=8, mbs=1, gbs=512),
    # -- llama4 / gpt-oss MoE --
    TunedConfig("pre_train", "llama4_scout", "v5p", "bf16", 128, 8192,
                tp=2, ep=8, fsdp=8, mbs=1, gbs=256),
    TunedConfig("pre_train", "gpt_oss_20b", "v5e", "bf16", 32, 4096,
                ep=8, fsdp=4, mbs=1, gbs=128),
    TunedConfig("pre_train", "gpt_oss_120b", "v5p", "bf16", 128, 4096,
                tp=2, ep=8, fsdp=8, mbs=1, gbs=256),
    # -- small models: pure-DP sweet spots --
    TunedConfig("pre_train", "llama32_1b", "v5e", "bf16", 8, 8192,
                fsdp=2, mbs=2, gbs=256),
    TunedConfig("pre_train", "gpt_2b", "v5e", "bf16", 8, 4096,
                fsdp=4, mbs=2, gbs=256),
    # -- finetune rows (ref: lora llama3-70b bf16 8 GPU TP2 PP4) --
    TunedConfig("sft", "llama3_8b", "v5e", "bf16", 16, 4096,
                fsdp=16, mbs=1, gbs=32),
    TunedConfig("lora", "llama3_8b", "v5e", "bf16", 4, 4096,
                fsdp=4, mbs=1, gbs=32),
    TunedConfig("lora", "llama3_70b", "v5p", "bf16", 8, 4096,
                tp=2, fsdp=4, mbs=1, gbs=32),
]


def recommended_config(
    model: str,
    n_chips: int,
    *,
    task: str = "pre_train",
    seq_len: Optional[int] = None,
    system: Optional[str] = None,
    dtype: str = "bf16",
) -> Optional[TunedConfig]:
    """Best-matching row: exact (model, task, n_chips[, seq_len, system])
    first, else the nearest chip-count row rescaled along dp — the reference
    DB answers only exact rows; rescaling keeps the per-chip working set of
    the tuned row so the answer stays feasible."""
    rows = [r for r in DB if r.model == model and r.task == task
            and r.dtype == dtype]
    if system:
        rows = [r for r in rows if r.system == system]
    if seq_len:
        exact_seq = [r for r in rows if r.seq_len == seq_len]
        rows = exact_seq or rows
    if not rows:
        return None
    exact = [r for r in rows if r.n_chips == n_chips]
    if exact:
        return exact[0]
    # rescale nearest row: model-parallel denom must divide n_chips
    best = None
    for r in sorted(rows, key=lambda r: abs(r.n_chips - n_chips)):
        denom = r.tp * r.pp * r.cp * r.ep * r.fsdp
        if n_chips % denom == 0:
            dp = n_chips // denom
            gbs = max(r.gbs * n_chips // r.n_chips, dp * r.fsdp * r.mbs)
            # keep gbs divisible by the data shards × mbs
            shards = dp * r.fsdp * r.mbs
            gbs = max(shards, (gbs // shards) * shards)
            best = dataclasses.replace(r, n_chips=n_chips, gbs=gbs)
            break
    return best


def tuned_recipe(model: str, n_chips: int, **query_kw):
    """TunedConfig → ready-to-fit Recipe (recipes registry's builder)."""
    from nemo_tpu.llm.recipes import RECIPES

    row = recommended_config(model, n_chips, **query_kw)
    if row is None:
        raise KeyError(f"no tuned config for {model} @ {n_chips} chips")
    if model not in RECIPES:
        raise KeyError(f"{model} has no recipe factory")
    rec = RECIPES[model]()
    return dataclasses.replace(
        rec, mesh=row.mesh(), global_batch_size=row.gbs,
        micro_batch_size=row.mbs)


def validate_row(row: TunedConfig) -> dict:
    """Feasibility check against the OOM-calibrated HBM model. Returns
    {'hbm_gb', 'ceiling_gb', 'fits'} (pp stages hold L/pp layers)."""
    from nemo_tpu.llm.auto_configurator import estimate_hbm_gb
    from nemo_tpu.models.llm.config import PRESETS

    cfg = PRESETS[row.model]()
    if row.seq_len != cfg.seq_length:
        cfg = dataclasses.replace(cfg, seq_length=row.seq_len)
    if row.pp > 1:
        n_layers = max(1, -(-cfg.num_layers // row.pp))  # widest stage
        cfg = dataclasses.replace(cfg, num_layers=n_layers)
    # experts shard over ep exactly like fsdp shards dense params
    hbm = estimate_hbm_gb(cfg, row.tp, row.fsdp * row.ep, row.cp, row.mbs)
    if row.task == "lora":
        # frozen bf16 base: no Adam state, no fp32 grads/master params —
        # subtract the full-training state the estimator assumed (16 B/param)
        # and add back the bf16 weights (2 B/param), all sharded identically.
        from nemo_tpu.llm.auto_configurator import _param_count

        n = _param_count(cfg)
        shards = row.tp * row.fsdp * row.ep
        hbm -= n * (16 - 2) / shards / 1e9
    ceiling = _SYSTEMS[row.system][0]
    return {"hbm_gb": round(hbm, 2), "ceiling_gb": ceiling,
            "fits": hbm <= ceiling * 0.95}


def dump_csv() -> str:
    """Reference CSV schema (model_configs_h100.csv columns)."""
    buf = io.StringIO()
    buf.write("task,model,system,dtype,num_chips,seq_len,"
              "tp_size,pp_size,cp_size,ep_size,fsdp_size,mbs,gbs\n")
    for r in DB:
        buf.write(f"{r.task},{r.model},{r.system},{r.dtype},{r.n_chips},"
                  f"{r.seq_len},{r.tp},{r.pp},{r.cp},{r.ep},{r.fsdp},"
                  f"{r.mbs},{r.gbs}\n")
    return buf.getvalue()
