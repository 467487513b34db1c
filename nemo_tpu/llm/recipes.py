"""Pretrain/finetune recipes: per-model tuned defaults as factory functions.

Reference parity: `nemo/collections/llm/recipes/` (109 `@run.cli.factory`
modules returning run.Partial(pretrain, model, trainer, data, optim, ...)
with per-model parallelism defaults) and the recommended-config tuning DB
(`scripts/performance/recommended_model_configs/*.csv`). Here a Recipe is a
plain dataclass of configs; `.build()` assembles module/data/trainer.

TPU parallelism defaults follow the scaling-book recipe: FSDP as the main
axis on ICI, TP for models whose per-chip weights exceed HBM, CP for
long-context variants (the reference's TP/PP/VPP table maps to
fsdp/tp/cp here — PP is deliberately absent, TPU slices favor FSDP+TP).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

from nemo_tpu.core.lr_schedulers import get_scheduler
from nemo_tpu.models.llm import config as C
from nemo_tpu.parallel.mesh import MeshConfig


@dataclasses.dataclass
class Recipe:
    name: str
    model: Any  # GPTConfig | SSMConfig | T5Config | BertConfig | HyenaLM
    mesh: MeshConfig
    global_batch_size: int
    micro_batch_size: Optional[int]
    lr: float = 3e-4
    min_lr: float = 3e-5
    warmup_steps: int = 2000
    max_steps: int = 300000
    seq_length: Optional[int] = None
    # model family selects the train module in build(): gpt (default) |
    # ssm | hyena | t5 | bert (reference recipes cover all five stacks)
    family: str = "gpt"

    def lr_schedule(self):
        return get_scheduler(
            "CosineAnnealing", max_steps=self.max_steps, lr=self.lr,
            warmup_steps=self.warmup_steps, min_lr=self.min_lr,
        )

    def build(self, data=None, max_steps: Optional[int] = None, log_dir=None):
        """→ (module, data, trainer) ready for trainer.fit."""
        from nemo_tpu.core.checkpoint import AutoResume, CheckpointIO
        from nemo_tpu.core.trainer import Trainer
        from nemo_tpu.data.gpt_dataset import MockDataModule

        steps = max_steps or self.max_steps
        module = self._build_module()
        if data is None:
            m = self.model
            if self.family in ("embedding", "reranker"):
                from nemo_tpu.models.llm.embedding import (
                    MockContrastiveDataModule)

                data = MockContrastiveDataModule(
                    seq_length=m.llm.seq_length,
                    global_batch_size=self.global_batch_size,
                    vocab_size=m.llm.vocab_size,
                    num_hard_negatives=m.num_hard_negatives,
                    reranker=self.family == "reranker")
            elif self.family == "vlm":
                from nemo_tpu.data.vlm_dataset import MockVLMDataModule

                # pooled/shuffled towers emit fewer tokens than patches
                P = getattr(m, "tokens_per_image", m.vision.num_patches)
                data = MockVLMDataModule(
                    seq_length=self.seq_length or (P + 64),
                    global_batch_size=self.global_batch_size,
                    vocab_size=m.llm.vocab_size,
                    image_size=m.vision.image_size,
                    image_token_id=m.image_token_id,
                    num_image_tokens=P)
            elif self.family == "clip":
                from nemo_tpu.models.vlm.clip import MockImageTextDataModule

                data = MockImageTextDataModule(
                    image_size=m.vision.image_size,
                    seq_length=self.seq_length or m.text.seq_length,
                    global_batch_size=self.global_batch_size,
                    vocab_size=m.text.vocab_size)
            elif self.family == "speechlm":
                from nemo_tpu.models.speechlm.train import (
                    MockSpeechLMDataModule)

                data = MockSpeechLMDataModule(
                    seq_length=self.seq_length or 64,
                    global_batch_size=self.global_batch_size,
                    vocab_size=m.llm.vocab_size)
            elif self.family == "diffusion":
                from nemo_tpu.models.diffusion.train import (
                    MockLatentDataModule)

                data = MockLatentDataModule(
                    input_size=m.input_size, in_channels=m.in_channels,
                    global_batch_size=self.global_batch_size,
                    num_classes=m.num_classes)
            else:
                seq = self.seq_length or int(getattr(m, "seq_length", 2048))
                data = MockDataModule(
                    seq_length=seq,
                    global_batch_size=self.global_batch_size,
                    vocab_size=int(m.vocab_size),
                )
        ckpt = CheckpointIO(f"{log_dir}/checkpoints") if log_dir else None
        trainer = Trainer(max_steps=steps, ckpt_io=ckpt,
                          resume=AutoResume() if ckpt else None)
        return module, data, trainer

    def _build_module(self):
        sched = self.lr_schedule()
        if self.family == "gpt":
            from nemo_tpu.models.llm.train import GPTTrainModule

            return GPTTrainModule(self.model, mesh_cfg=self.mesh,
                                  lr_schedule=sched)
        from nemo_tpu.models.llm.train import LMTrainModule

        if self.family == "ssm":
            from nemo_tpu.models.llm.ssm import SSMModel

            return LMTrainModule(SSMModel(self.model), self.model,
                                 mesh_cfg=self.mesh, lr_schedule=sched)
        if self.family == "hyena":
            # self.model IS the HyenaLM flax module (hyena presets return
            # modules); seq_length comes from the recipe
            cfg = type("HyenaCfg", (), {
                "seq_length": self.seq_length or 8192,
                "vocab_size": self.model.vocab_size,
                "num_layers": self.model.n_layers})()
            return LMTrainModule(self.model, cfg, mesh_cfg=self.mesh,
                                 lr_schedule=sched)
        if self.family == "bert":
            from nemo_tpu.models.llm.bert import BertModel

            return LMTrainModule(BertModel(self.model), self.model,
                                 mesh_cfg=self.mesh, lr_schedule=sched,
                                 loss="mlm")
        if self.family == "t5":
            from nemo_tpu.models.llm.t5_parallel import T5TrainModule

            return T5TrainModule(self.model, mesh_cfg=self.mesh)
        if self.family in ("embedding", "reranker"):
            from nemo_tpu.models.llm.embedding import EmbeddingTrainModule

            return EmbeddingTrainModule(self.model, mesh_cfg=self.mesh,
                                        lr_schedule=sched,
                                        reranker=self.family == "reranker")
        if self.family == "hf":
            from nemo_tpu.llm.hf_automodel import HFAutoModelForCausalLM

            return HFAutoModelForCausalLM(config=self.model,
                                          learning_rate=self.lr)
        if self.family == "vlm":
            from nemo_tpu.models.vlm.train import VLMTrainModule

            # stage-2 finetune defaults (stage-1 projector-only pretrain:
            # pass freeze=("vision","language") through a custom build)
            return VLMTrainModule(self.model, lr_schedule=sched,
                                  image_size=self.model.vision.image_size)
        if self.family == "clip":
            from nemo_tpu.models.vlm.clip import CLIPTrainModule

            return CLIPTrainModule(self.model, lr_schedule=sched)
        if self.family == "speechlm":
            from nemo_tpu.models.speechlm.train import SALMTrainModule

            return SALMTrainModule(self.model, lr_schedule=sched)
        if self.family == "diffusion":
            from nemo_tpu.models.diffusion.train import DiffusionTrainModule

            return DiffusionTrainModule(self.model, lr_schedule=sched)
        raise ValueError(f"unknown recipe family {self.family}")


RECIPES: Dict[str, Callable[..., Recipe]] = {}


def register(fn):
    RECIPES[fn.__name__] = fn
    return fn


@register
def llama3_8b(**kw) -> Recipe:
    """(reference recipes/llama3_8b.py: GBS 512, cosine 3e-4)"""
    return Recipe("llama3_8b", C.llama3_8b(attention_backend="flash"),
                  MeshConfig(fsdp=-1).resolved_or_default(), 512, 1, **kw)


@register
def llama3_8b_64k(**kw) -> Recipe:
    """long-context variant (reference recipes/llama3_8b_64k.py): CP for seq."""
    return Recipe("llama3_8b_64k",
                  C.llama3_8b(seq_length=65536, attention_backend="flash"),
                  MeshConfig(dp=1, fsdp=-1, cp=4).resolved_or_default(), 64, 1, **kw)


@register
def llama3_70b(**kw) -> Recipe:
    return Recipe("llama3_70b", C.llama3_70b(attention_backend="flash"),
                  MeshConfig(dp=1, fsdp=-1, tp=4).resolved_or_default(), 128, 1,
                  lr=1.5e-4, **kw)


@register
def mixtral_8x7b(**kw) -> Recipe:
    """(reference recipes/mixtral_8x7b.py: TP1 EP8) — experts over the ep axis."""
    return Recipe("mixtral_8x7b", C.mixtral_8x7b(),
                  MeshConfig(fsdp=-1, ep=8).resolved_or_default(), 256, 1, **kw)


@register
def gpt_2b(**kw) -> Recipe:
    """BASELINE.json config 5: GPT 2B fine-tune, TP=4 over ICI."""
    return Recipe("gpt_2b", C.gpt_2b(),
                  MeshConfig(dp=-1, tp=4).resolved_or_default(), 32, 1, lr=1e-4, **kw)


@register
def llama2_7b(**kw) -> Recipe:
    return Recipe("llama2_7b", C.llama2_7b(attention_backend="flash"),
                  MeshConfig(fsdp=-1).resolved_or_default(), 512, 1, **kw)


@register
def llama31_405b(**kw) -> Recipe:
    """(reference tuning DB h100 row: 1024 gpus TP8 PP8 CP2 → TPU:
    pp7×fsdp×tp8 — 126 layers / 7 stages; parallel/pipeline.py GPipe
    schedule composed with GSPMD tp/fsdp; memory plan per
    llm.auto_configurator.estimate_hbm_gb)"""
    return Recipe("llama31_405b", C.llama31_405b(attention_backend="flash"),
                  MeshConfig(dp=1, fsdp=-1, tp=8, pp=7).resolved_or_default(), 512, 1,
                  lr=8e-5, **kw)


@register
def mistral_7b(**kw) -> Recipe:
    return Recipe("mistral_7b", C.mistral_7b(attention_backend="flash"),
                  MeshConfig(fsdp=-1).resolved_or_default(), 512, 1, **kw)


@register
def qwen2_7b(**kw) -> Recipe:
    return Recipe("qwen2_7b", C.qwen2_7b(),
                  MeshConfig(fsdp=-1).resolved_or_default(), 512, 1, **kw)


@register
def gemma_7b(**kw) -> Recipe:
    return Recipe("gemma_7b", C.gemma_7b(),
                  MeshConfig(fsdp=-1).resolved_or_default(), 512, 1, **kw)


@register
def gpt3_175b(**kw) -> Recipe:
    """(reference tuning DB: 512 gpus TP4 PP8 VP6 → TPU pp8×fsdp×tp4)"""
    return Recipe("gpt3_175b", C.gpt3_175b(),
                  MeshConfig(dp=1, fsdp=-1, tp=4, pp=8).resolved_or_default(), 2048, 2,
                  lr=9e-5, **kw)


@register
def tiny_test(**kw) -> Recipe:
    return Recipe("tiny_test", C.tiny_test(seq_length=32),
                  MeshConfig().resolved_or_default(), 8, None,
                  warmup_steps=2, max_steps=10, **kw)




# ---------------------------------------------------------------------------
# size-class helpers: mesh defaults by parameter scale (scaling-book recipe:
# FSDP on ICI for <30B, add TP when per-chip weights exceed HBM, CP for
# long context). Mirrors the reference recipes' per-model TP/PP tables.
# ---------------------------------------------------------------------------

def _small(name, cfg, gbs=512, **kw):
    return Recipe(name, cfg, MeshConfig(fsdp=-1).resolved_or_default(),
                  gbs, 1, **kw)


def _large(name, cfg, tp=4, gbs=128, lr=1.5e-4, **kw):
    return Recipe(name, cfg,
                  MeshConfig(dp=1, fsdp=-1, tp=tp).resolved_or_default(),
                  gbs, 1, lr=lr, **kw)


def _longctx(name, cfg, cp=4, gbs=64, **kw):
    return Recipe(name, cfg,
                  MeshConfig(dp=1, fsdp=-1, cp=cp).resolved_or_default(),
                  gbs, 1, **kw)


@register
def llama31_8b(**kw) -> Recipe:
    return _small("llama31_8b", C.llama31_8b(seq_length=8192, attention_backend="flash"), **kw)


@register
def llama31_70b(**kw) -> Recipe:
    return _large("llama31_70b", C.llama31_70b(seq_length=8192, attention_backend="flash"), **kw)


@register
def llama32_1b(**kw) -> Recipe:
    return _small("llama32_1b", C.llama32_1b(seq_length=8192, attention_backend="flash"), lr=4e-4, **kw)


@register
def llama32_3b(**kw) -> Recipe:
    return _small("llama32_3b", C.llama32_3b(seq_length=8192, attention_backend="flash"), **kw)


@register
def llama32_1b_fp8(**kw) -> Recipe:
    """fp8 ('hybrid' e4m3/e5m2) variant — chip-measured protocol in
    scripts/train_mfu.py: 500-step loss overlay within 0.3% of bf16;
    on v5e the fp8 GEMMs are XLA-emulated (no fp8 MXU pipe, 0.90x
    bf16 throughput) so this flag buys numerics-validation headroom
    today and speed on fp8-capable chips."""
    return _small("llama32_1b_fp8",
                  C.llama32_1b(seq_length=8192, attention_backend="flash",
                               quantization="fp8"), lr=4e-4, **kw)


@register
def llama3_8b_16k(**kw) -> Recipe:
    return _longctx("llama3_8b_16k", C.llama3_8b(seq_length=16384, attention_backend="flash"), cp=2, gbs=128, **kw)


@register
def llama3_8b_128k(**kw) -> Recipe:
    return _longctx("llama3_8b_128k", C.llama3_8b(seq_length=131072, attention_backend="flash"), cp=8, gbs=16, **kw)


@register
def llama3_70b_16k(**kw) -> Recipe:
    return Recipe("llama3_70b_16k", C.llama3_70b(seq_length=16384, attention_backend="flash"),
                  MeshConfig(dp=1, fsdp=-1, tp=4, cp=2).resolved_or_default(), 64, 1, lr=1.5e-4, **kw)


@register
def llama3_70b_64k(**kw) -> Recipe:
    return Recipe("llama3_70b_64k", C.llama3_70b(seq_length=65536, attention_backend="flash"),
                  MeshConfig(dp=1, fsdp=-1, tp=4, cp=4).resolved_or_default(), 32, 1, lr=1.5e-4, **kw)


@register
def qwen25_500m(**kw) -> Recipe:
    return _small("qwen25_500m", C.qwen25_500m(seq_length=4096), gbs=256, lr=6e-4, **kw)


@register
def qwen25_1p5b(**kw) -> Recipe:
    return _small("qwen25_1p5b", C.qwen25_1p5b(seq_length=4096), gbs=256, lr=4e-4, **kw)


@register
def qwen25_7b(**kw) -> Recipe:
    return _small("qwen25_7b", C.qwen25_7b(attention_backend="flash"), **kw)


@register
def qwen25_14b(**kw) -> Recipe:
    return _large("qwen25_14b", C.qwen25_14b(attention_backend="flash"), tp=2, gbs=256, **kw)


@register
def qwen25_32b(**kw) -> Recipe:
    return _large("qwen25_32b", C.qwen25_32b(attention_backend="flash"), **kw)


@register
def qwen25_72b(**kw) -> Recipe:
    return _large("qwen25_72b", C.qwen25_72b(attention_backend="flash"), tp=8, lr=1e-4, **kw)


@register
def qwen3_1p7b(**kw) -> Recipe:
    return _small("qwen3_1p7b", C.qwen3_1p7b(seq_length=4096), gbs=256, lr=4e-4, **kw)


@register
def qwen3_4b(**kw) -> Recipe:
    return _small("qwen3_4b", C.qwen3_4b(seq_length=4096), **kw)


@register
def qwen3_8b(**kw) -> Recipe:
    return _small("qwen3_8b", C.qwen3_8b(attention_backend="flash"), **kw)


@register
def qwen3_14b(**kw) -> Recipe:
    return _large("qwen3_14b", C.qwen3_14b(attention_backend="flash"), tp=2, gbs=256, **kw)


@register
def qwen3_32b(**kw) -> Recipe:
    return _large("qwen3_32b", C.qwen3_32b(attention_backend="flash"), **kw)


@register
def qwen3_30b_a3b(**kw) -> Recipe:
    return Recipe("qwen3_30b_a3b", C.qwen3_30b_a3b(),
                  MeshConfig(fsdp=-1, ep=8).resolved_or_default(), 256, 1, **kw)


@register
def qwen3_235b_a22b(**kw) -> Recipe:
    return Recipe("qwen3_235b_a22b", C.qwen3_235b_a22b(),
                  MeshConfig(dp=1, fsdp=-1, tp=4, ep=16).resolved_or_default(), 512, 1,
                  lr=1e-4, **kw)


@register
def gemma_2b(**kw) -> Recipe:
    return _small("gemma_2b", C.gemma_2b(), gbs=256, **kw)


@register
def gemma2_9b(**kw) -> Recipe:
    return _small("gemma2_9b", C.gemma2_9b(), **kw)


@register
def gemma2_27b(**kw) -> Recipe:
    return _large("gemma2_27b", C.gemma2_27b(), **kw)


@register
def phi3_mini_4k(**kw) -> Recipe:
    return _small("phi3_mini_4k", C.phi3_mini_4k(attention_backend="flash"), gbs=256, **kw)


@register
def starcoder2_3b(**kw) -> Recipe:
    return _small("starcoder2_3b", C.starcoder2_3b(), gbs=256, **kw)


@register
def starcoder2_7b(**kw) -> Recipe:
    return _small("starcoder2_7b", C.starcoder2_7b(), **kw)


@register
def starcoder2_15b(**kw) -> Recipe:
    return _large("starcoder2_15b", C.starcoder2_15b(), tp=2, gbs=256, **kw)


@register
def nemotron3_8b(**kw) -> Recipe:
    return _small("nemotron3_8b", C.nemotron3_8b(), **kw)


@register
def nemotron4_15b(**kw) -> Recipe:
    return _large("nemotron4_15b", C.nemotron4_15b(), tp=2, gbs=256, **kw)


@register
def nemotron4_15b_16k(**kw) -> Recipe:
    return Recipe("nemotron4_15b_16k", C.nemotron4_15b(seq_length=16384, attention_backend="flash"),
                  MeshConfig(dp=1, fsdp=-1, tp=2, cp=2).resolved_or_default(), 64, 1, **kw)


@register
def nemotron4_340b(**kw) -> Recipe:
    return Recipe("nemotron4_340b", C.nemotron4_340b(attention_backend="flash"),
                  MeshConfig(dp=1, fsdp=-1, tp=8, pp=6).resolved_or_default(), 2304, 1,
                  lr=1e-4, **kw)


@register
def mixtral_8x22b(**kw) -> Recipe:
    return Recipe("mixtral_8x22b", C.mixtral_8x22b(attention_backend="flash"),
                  MeshConfig(dp=1, fsdp=-1, tp=2, ep=8).resolved_or_default(), 256, 1,
                  lr=1e-4, **kw)


@register
def mixtral_8x7b_16k(**kw) -> Recipe:
    return Recipe("mixtral_8x7b_16k", C.mixtral_8x7b(seq_length=16384, attention_backend="flash"),
                  MeshConfig(dp=1, fsdp=-1, cp=2, ep=8).resolved_or_default(), 64, 1, **kw)


@register
def deepseek_v2_lite(**kw) -> Recipe:
    return Recipe("deepseek_v2_lite", C.deepseek_v2_lite(),
                  MeshConfig(fsdp=-1, ep=8).resolved_or_default(), 512, 1, **kw)


@register
def deepseek_v3(**kw) -> Recipe:
    """(reference recipes/deepseek_v3.py: large EP; TPU: fsdp×tp×ep)"""
    return Recipe("deepseek_v3", C.deepseek_v3(),
                  MeshConfig(dp=1, fsdp=-1, tp=4, ep=16).resolved_or_default(), 4096, 1,
                  lr=7.3e-6, **kw)


@register
def gemma3_1b(**kw) -> Recipe:
    """(reference recipes/gemma3_1b.py)"""
    return Recipe("gemma3_1b", C.gemma3_1b(seq_length=8192),
                  MeshConfig(fsdp=-1).resolved_or_default(), 512, 2, **kw)


@register
def gemma3_4b(**kw) -> Recipe:
    return Recipe("gemma3_4b", C.gemma3_4b(seq_length=8192),
                  MeshConfig(fsdp=-1).resolved_or_default(), 512, 1, **kw)


@register
def gemma3_12b(**kw) -> Recipe:
    return Recipe("gemma3_12b", C.gemma3_12b(seq_length=8192),
                  MeshConfig(fsdp=-1, tp=2).resolved_or_default(), 512, 1, **kw)


@register
def gemma3_27b(**kw) -> Recipe:
    return Recipe("gemma3_27b", C.gemma3_27b(seq_length=8192),
                  MeshConfig(fsdp=-1, tp=4).resolved_or_default(), 512, 1, **kw)


@register
def llama4_scout(**kw) -> Recipe:
    """(reference recipes/llama4_e16.py: 16-expert top-1 MoE)"""
    return Recipe("llama4_scout", C.llama4_scout(),
                  MeshConfig(fsdp=-1, tp=2, ep=8).resolved_or_default(),
                  1024, 1, **kw)


@register
def llama4_maverick(**kw) -> Recipe:
    """(reference recipes/llama4_e128.py: 128-expert alternating MoE)"""
    return Recipe("llama4_maverick", C.llama4_maverick(),
                  MeshConfig(fsdp=-1, tp=2, ep=16).resolved_or_default(),
                  1024, 1, **kw)


@register
def gpt_oss_20b(**kw) -> Recipe:
    return Recipe("gpt_oss_20b", C.gpt_oss_20b(seq_length=8192),
                  MeshConfig(fsdp=-1, ep=8).resolved_or_default(), 512, 1, **kw)


@register
def gpt_oss_120b(**kw) -> Recipe:
    return Recipe("gpt_oss_120b", C.gpt_oss_120b(seq_length=8192),
                  MeshConfig(fsdp=-1, tp=2, ep=16).resolved_or_default(),
                  1024, 1, **kw)


@register
def chatglm3_6b(**kw) -> Recipe:
    return Recipe("chatglm3_6b", C.chatglm3_6b(attention_backend="flash"),
                  MeshConfig(fsdp=-1).resolved_or_default(), 512, 1, **kw)


@register
def baichuan2_7b(**kw) -> Recipe:
    return Recipe("baichuan2_7b", C.baichuan2_7b(attention_backend="flash"),
                  MeshConfig(fsdp=-1).resolved_or_default(), 512, 1, **kw)


# ---- qwen2/qwen3/gemma2/mistral/nemotron/starcoder/deepseek sizes
# (reference recipes/<name>.py; per-family GBS/lr follow the reference's
# size tiers) ---------------------------------------------------------------


@register
def qwen2_500m(**kw) -> Recipe:
    return _small("qwen2_500m", C.qwen2_500m(attention_backend="flash"), lr=4e-4, **kw)


@register
def qwen2_1p5b(**kw) -> Recipe:
    return _small("qwen2_1p5b", C.qwen2_1p5b(attention_backend="flash"), lr=4e-4, **kw)


@register
def qwen2_72b(**kw) -> Recipe:
    return _large("qwen2_72b", C.qwen2_72b(attention_backend="flash"), **kw)


@register
def qwen3_600m(**kw) -> Recipe:
    return _small("qwen3_600m", C.qwen3_600m(seq_length=4096, attention_backend="flash"), lr=4e-4, **kw)


@register
def gemma2_2b(**kw) -> Recipe:
    return _small("gemma2_2b", C.gemma2_2b(), **kw)


@register
def mistral_nemo_12b(**kw) -> Recipe:
    return _small("mistral_nemo_12b", C.mistral_nemo_12b(attention_backend="flash"), gbs=256, **kw)


@register
def nemotron3_4b(**kw) -> Recipe:
    return _small("nemotron3_4b", C.nemotron3_4b(), gbs=256, **kw)


@register
def nemotron3_22b(**kw) -> Recipe:
    return _large("nemotron3_22b", C.nemotron3_22b(), tp=2, **kw)


@register
def nemotron3_22b_16k(**kw) -> Recipe:
    return _longctx("nemotron3_22b_16k", C.nemotron3_22b(seq_length=16384), cp=2, **kw)


@register
def nemotron3_22b_64k(**kw) -> Recipe:
    return _longctx("nemotron3_22b_64k", C.nemotron3_22b(seq_length=65536), **kw)


@register
def nemotron4_15b_64k(**kw) -> Recipe:
    return _longctx("nemotron4_15b_64k", C.nemotron4_15b(seq_length=65536), **kw)


@register
def deepseek_v2(**kw) -> Recipe:
    return Recipe("deepseek_v2", C.deepseek_v2(),
                  MeshConfig(fsdp=-1, ep=8).resolved_or_default(), 1024, 1,
                  **kw)


@register
def starcoder_15b(**kw) -> Recipe:
    return _large("starcoder_15b", C.starcoder_15b(), tp=2, **kw)


@register
def llama31_nemotron_nano_8b(**kw) -> Recipe:
    return _small("llama31_nemotron_nano_8b",
                  C.llama31_nemotron_nano_8b(seq_length=8192, attention_backend="flash"), **kw)


@register
def llama31_nemotron_70b(**kw) -> Recipe:
    return _large("llama31_nemotron_70b",
                  C.llama31_nemotron_70b(seq_length=8192, attention_backend="flash"), **kw)


@register
def llama33_nemotron_super_49b(**kw) -> Recipe:
    return _large("llama33_nemotron_super_49b",
                  C.llama33_nemotron_super_49b(seq_length=8192, attention_backend="flash"), **kw)


@register
def llama31_nemotron_ultra_253b(**kw) -> Recipe:
    return _large("llama31_nemotron_ultra_253b",
                  C.llama31_nemotron_ultra_253b(seq_length=8192, attention_backend="flash"),
                  tp=8, gbs=256, **kw)


@register
def llama4_e16(**kw) -> Recipe:
    """reference recipes/llama4_e16.py (= Llama-4 Scout geometry)."""
    r = RECIPES["llama4_scout"](**kw)
    return dataclasses.replace(r, name="llama4_e16")


@register
def llama4_e128(**kw) -> Recipe:
    """reference recipes/llama4_e128.py (= Llama-4 Maverick geometry)."""
    r = RECIPES["llama4_maverick"](**kw)
    return dataclasses.replace(r, name="llama4_e128")


@register
def phi3_mini_4k_instruct(**kw) -> Recipe:
    r = RECIPES["phi3_mini_4k"](**kw)
    return dataclasses.replace(r, name="phi3_mini_4k_instruct")


@register
def mixtral_8x7b_64k(**kw) -> Recipe:
    return Recipe("mixtral_8x7b_64k",
                  C.mixtral_8x7b(seq_length=65536, attention_backend="flash"),
                  MeshConfig(dp=1, fsdp=-1, cp=2, ep=2).resolved_or_default(),
                  64, 1, **kw)


@register
def mixtral_8x22b_64k(**kw) -> Recipe:
    return Recipe("mixtral_8x22b_64k",
                  C.mixtral_8x22b(seq_length=65536, attention_backend="flash"),
                  MeshConfig(dp=1, fsdp=-1, cp=2, ep=2).resolved_or_default(),
                  64, 1, **kw)


@register
def hf_auto_model_for_causal_lm(hf_config=None, **kw) -> Recipe:
    """reference recipes/hf_auto_model_for_causal_lm.py — train any HF
    causal LM via the AutoModel path (nemo_tpu.llm.hf_automodel,
    transformers Flax classes). `hf_config` is a transformers config (or
    None for a small GPT-2 geometry, offline-safe); family='hf' routes
    build() to HFAutoModelForCausalLM."""
    if hf_config is None:
        from transformers import GPT2Config

        hf_config = GPT2Config(n_layer=2, n_embd=128, n_head=4,
                               n_positions=512, vocab_size=50257)
    return Recipe("hf_auto_model_for_causal_lm", hf_config,
                  MeshConfig(fsdp=-1).resolved_or_default(), 64, 1,
                  family="hf", lr=2e-5, **kw)


# ---- SSM / mamba family (reference recipes/mamba2_*.py, nemotronh_*.py;
# family='ssm' routes build() to LMTrainModule over SSMModel) ---------------


def _ssm(name, cfg, gbs=256, **kw):
    return Recipe(name, cfg, MeshConfig(fsdp=-1).resolved_or_default(),
                  gbs, 1, family="ssm", **kw)


@register
def mamba2_130m(**kw) -> Recipe:
    from nemo_tpu.models.llm import ssm as S

    return _ssm("mamba2_130m", S.mamba2_130m(), **kw)


@register
def mamba2_370m(**kw) -> Recipe:
    from nemo_tpu.models.llm import ssm as S

    return _ssm("mamba2_370m", S.mamba2_370m(), **kw)


@register
def mamba2_780m(**kw) -> Recipe:
    from nemo_tpu.models.llm import ssm as S

    return _ssm("mamba2_780m", S.mamba2_780m(), **kw)


@register
def mamba2_1_3b(**kw) -> Recipe:
    from nemo_tpu.models.llm import ssm as S

    return _ssm("mamba2_1_3b", S.mamba2_1_3b(), **kw)


@register
def mamba2_2_7b(**kw) -> Recipe:
    from nemo_tpu.models.llm import ssm as S

    return _ssm("mamba2_2_7b", S.mamba2_2_7b(), **kw)


@register
def mamba2_8b(**kw) -> Recipe:
    from nemo_tpu.models.llm import ssm as S

    return _ssm("mamba2_8b", S.mamba2_8b(), **kw)


@register
def mamba2_hybrid_8b(**kw) -> Recipe:
    from nemo_tpu.models.llm import ssm as S

    return _ssm("mamba2_hybrid_8b", S.mamba2_hybrid_8b(), **kw)


@register
def nemotronh_4b(**kw) -> Recipe:
    from nemo_tpu.models.llm import ssm as S

    return _ssm("nemotronh_4b", S.nemotron_h_4b(), **kw)


@register
def nemotronh_8b(**kw) -> Recipe:
    from nemo_tpu.models.llm import ssm as S

    return _ssm("nemotronh_8b", S.nemotron_h_8b(), **kw)


@register
def nemotronh_47b(**kw) -> Recipe:
    from nemo_tpu.models.llm import ssm as S

    return _ssm("nemotronh_47b", S.nemotron_h_47b(), gbs=128, **kw)


@register
def nemotronh_56b(**kw) -> Recipe:
    from nemo_tpu.models.llm import ssm as S

    return _ssm("nemotronh_56b", S.nemotron_h_56b(), gbs=128, **kw)


@register
def nemotron_nano_9b_v2(**kw) -> Recipe:
    from nemo_tpu.models.llm import ssm as S

    return _ssm("nemotron_nano_9b_v2", S.nemotron_nano_9b_v2(), **kw)


@register
def nemotron_nano_12b_v2(**kw) -> Recipe:
    from nemo_tpu.models.llm import ssm as S

    return _ssm("nemotron_nano_12b_v2", S.nemotron_nano_12b_v2(), **kw)


# ---- hyena / Evo2 (reference recipes/hyena_{1b,7b,40b,base}.py) -----------


def _hyena(name, model, seq=8192, gbs=256, **kw):
    return Recipe(name, model, MeshConfig(fsdp=-1).resolved_or_default(),
                  gbs, 1, family="hyena", seq_length=seq, **kw)


@register
def hyena_1b(**kw) -> Recipe:
    from nemo_tpu.ops.hyena import evo2_1b

    return _hyena("hyena_1b", evo2_1b(), **kw)


@register
def hyena_7b(**kw) -> Recipe:
    from nemo_tpu.ops.hyena import evo2_7b

    return _hyena("hyena_7b", evo2_7b(), **kw)


@register
def hyena_40b(**kw) -> Recipe:
    from nemo_tpu.ops.hyena import evo2_40b

    return _hyena("hyena_40b", evo2_40b(), gbs=64, **kw)


@register
def hyena_base(**kw) -> Recipe:
    from nemo_tpu.ops.hyena import HyenaLM

    return _hyena("hyena_base", HyenaLM(vocab_size=512, d_model=512,
                                        n_layers=8, pattern="SDH*"),
                  seq=2048, **kw)


# ---- T5 / BERT (reference recipes/t5_*.py, bert_*.py) ---------------------


@register
def t5_220m(**kw) -> Recipe:
    from nemo_tpu.models.llm.t5 import t5_220m as cfg

    return Recipe("t5_220m", cfg(), MeshConfig(fsdp=-1).resolved_or_default(),
                  512, 1, family="t5", lr=1e-4, **kw)


@register
def t5_3b(**kw) -> Recipe:
    from nemo_tpu.models.llm.t5 import t5_3b as cfg

    return Recipe("t5_3b", cfg(),
                  MeshConfig(dp=1, fsdp=-1, tp=2).resolved_or_default(),
                  256, 1, family="t5", lr=1e-4, **kw)


@register
def t5_11b(**kw) -> Recipe:
    from nemo_tpu.models.llm.t5 import t5_11b as cfg

    return Recipe("t5_11b", cfg(),
                  MeshConfig(dp=1, fsdp=-1, tp=4).resolved_or_default(),
                  256, 1, family="t5", lr=1e-4, **kw)


@register
def bert_110m(**kw) -> Recipe:
    from nemo_tpu.models.llm.bert import bert_base

    return Recipe("bert_110m", bert_base(),
                  MeshConfig(fsdp=-1).resolved_or_default(), 256, 1,
                  family="bert", lr=1e-4, **kw)


@register
def bert_340m(**kw) -> Recipe:
    from nemo_tpu.models.llm.bert import bert_large

    return Recipe("bert_340m", bert_large(),
                  MeshConfig(fsdp=-1).resolved_or_default(), 256, 1,
                  family="bert", lr=1e-4, **kw)


# ---- embedding / reranker (reference recipes/llama_embedding_{1b,3b}.py,
# llama_reranker_1b.py, bert_embedding.py, e5_340m.py) ----------------------


def _embed(name, cfg, family="embedding", gbs=128, **kw):
    return Recipe(name, cfg, MeshConfig(fsdp=-1).resolved_or_default(),
                  gbs, 1, family=family, lr=1e-5, warmup_steps=100,
                  max_steps=1000, **kw)


@register
def llama_embedding_1b(**kw) -> Recipe:
    from nemo_tpu.models.llm.embedding import llama32_1b_embedding

    return _embed("llama_embedding_1b", llama32_1b_embedding(), **kw)


@register
def llama_embedding_3b(**kw) -> Recipe:
    from nemo_tpu.models.llm.embedding import llama32_3b_embedding

    return _embed("llama_embedding_3b", llama32_3b_embedding(), **kw)


@register
def llama_reranker_1b(**kw) -> Recipe:
    from nemo_tpu.models.llm.embedding import llama32_1b_reranker

    return _embed("llama_reranker_1b", llama32_1b_reranker(),
                  family="reranker", **kw)


@register
def bert_embedding(**kw) -> Recipe:
    from nemo_tpu.models.llm.embedding import bert_embedding_340m

    return _embed("bert_embedding", bert_embedding_340m(), **kw)


@register
def e5_340m(**kw) -> Recipe:
    from nemo_tpu.models.llm.embedding import bert_embedding_340m

    return _embed("e5_340m", bert_embedding_340m(), **kw)


@register
def clip_b32(**kw) -> Recipe:
    """reference vlm/recipes/clip_b32.py (ViT-B/32 + text tower,
    symmetric InfoNCE)."""
    from nemo_tpu.models.vlm.clip import clip_b32 as cfg

    return Recipe("clip_b32", cfg(),
                  MeshConfig(fsdp=-1).resolved_or_default(), 256, 1,
                  family="clip", lr=1e-3, warmup_steps=2000,
                  max_steps=400000, **kw)


@register
def salm_llama3_8b(**kw) -> Recipe:
    """reference speechlm recipes (speech_to_text_llm over llama3-8b:
    conformer-large audio encoder → frame-stacking adapter → LLM)."""
    from nemo_tpu.models.asr.configs import conformer_ctc
    from nemo_tpu.models.speechlm.salm import SALMConfig

    enc = dict(conformer_ctc("large").encoder.to_dict())
    cfg = SALMConfig(llm=C.llama3_8b(), encoder=enc, mel_features=80,
                     frame_stacking=2)
    return Recipe("salm_llama3_8b", cfg,
                  MeshConfig(fsdp=-1).resolved_or_default(), 64, 1,
                  family="speechlm", lr=1e-4, warmup_steps=200,
                  max_steps=10000, **kw)


@register
def dit_xl(**kw) -> Recipe:
    """reference diffusion training recipes (DiT-XL/2 geometry: 28 layers,
    hidden 1152, patch 2, class-conditioned; EDM objective).

    Chip-validated (scripts/multimodal_chip_validate.py, v5e-1): 0.082
    s/step at micro-batch 8 on 32x32x4 latents, full Adam — see
    scripts/hbm_validate_results.jsonl."""
    from nemo_tpu.models.diffusion.dit import DiTConfig

    cfg = DiTConfig(input_size=32, patch_size=2, in_channels=4,
                    hidden_size=1152, num_layers=28, num_heads=16,
                    num_classes=1000)
    return Recipe("dit_xl", cfg, MeshConfig(fsdp=-1).resolved_or_default(),
                  256, 1, family="diffusion", lr=1e-4, warmup_steps=1000,
                  max_steps=400000, **kw)


@register
def neva_llama3_8b(**kw) -> Recipe:
    """reference vlm/recipes/neva_llama3_8b.py (llama3-8B + CLIP-ViT-L/14
    -336; stage-2 finetune defaults — GBS 128, cosine 2e-5). The dynamic
    image_token_id placeholder splicing needs a nonnegative token id."""
    from nemo_tpu.models.vlm.neva import neva_8b

    cfg = neva_8b(image_token_id=128002)  # llama3 reserved_special_token_0
    return Recipe("neva_llama3_8b", cfg,
                  MeshConfig(fsdp=-1).resolved_or_default(), 128, 1,
                  family="vlm", lr=2e-5, warmup_steps=150,
                  max_steps=5000, **kw)


@register
def gemma3vl_4b(**kw) -> Recipe:
    """reference vlm gemma3vl recipes (gemma3-4B + SigLIP so400m, pooled
    256-token projector, bidirectional image-span attention).

    Chip-validated (scripts/multimodal_chip_validate.py, v5e-1): stage-1
    projector training under frozen towers runs 0.272 s/step at
    (B=1, S=512) bf16 — see scripts/hbm_validate_results.jsonl."""
    from nemo_tpu.models.vlm.gemma3vl import gemma3vl_4b as cfg

    return Recipe("gemma3vl_4b", cfg(),
                  MeshConfig(fsdp=-1).resolved_or_default(), 128, 1,
                  family="vlm", lr=2e-5, warmup_steps=150,
                  max_steps=5000, **kw)


@register
def llama4vl_scout(**kw) -> Recipe:
    """reference vlm llama4 omni recipes (Scout MoE LLM + pixel-shuffle
    vision adapter; EP over the expert axis)."""
    from nemo_tpu.models.vlm.llama4vl import llama4vl_scout as cfg

    return Recipe("llama4vl_scout", cfg(),
                  MeshConfig(fsdp=-1, ep=1).resolved_or_default(), 128, 1,
                  family="vlm", lr=2e-5, warmup_steps=150,
                  max_steps=5000, **kw)


# ---------------------------------------------------------------------------
# Finetune recipes (reference: every recipes/<model>.py also exports
# `finetune_recipe(peft_scheme='lora'|'dora'|'none')` — packed-squad SFT
# defaults, LoRA lr 1e-4 / full-FT lr 5e-6, GBS 128 MBS 1,
# recipes/finetune_default.py default_finetune_recipe).
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class FinetuneRecipe:
    """Tuned finetuning config derived from a pretrain recipe.

    `.run(params, data)` executes llm.finetune with these defaults; with
    `peft` set, only adapter weights train (llm/peft.py)."""

    name: str
    model: C.GPTConfig
    mesh: MeshConfig
    global_batch_size: int
    micro_batch_size: Optional[int]
    peft: Optional[Any] = None
    lr: float = 1e-4
    min_lr: float = 0.0
    warmup_steps: int = 50
    max_steps: int = 1000
    packed: bool = True

    def lr_schedule(self):
        return get_scheduler(
            "CosineAnnealing", max_steps=self.max_steps, lr=self.lr,
            warmup_steps=self.warmup_steps, min_lr=self.min_lr,
        )

    def run(self, params, data, *, max_steps: Optional[int] = None,
            log_dir=None, trainer=None):
        from nemo_tpu.llm.api import finetune

        if data.global_batch_size != self.global_batch_size:
            raise ValueError(
                f"data module global_batch_size {data.global_batch_size} != "
                f"recipe's {self.global_batch_size} — pass a matching data "
                f"module or override the recipe field")
        return finetune(
            self.model, params, data, mesh=self.mesh, peft=self.peft,
            max_steps=max_steps or self.max_steps, trainer=trainer,
            log_dir=log_dir,
            lr_schedule=self.lr_schedule(),
        )


def _peft_for(scheme: Optional[str]):
    from nemo_tpu.llm.peft import CanonicalLoRA, LoRA

    if scheme in (None, "none"):
        return None
    if scheme == "lora":
        return LoRA()
    if scheme == "dora":
        return LoRA(dora=True)
    if scheme == "canonical_lora":
        return CanonicalLoRA()
    raise ValueError(
        f"unknown peft_scheme {scheme!r} (lora|dora|canonical_lora|none)")


def finetune_recipe(name: str, peft_scheme: Optional[str] = "lora",
                    seq_length: int = 2048, **kw) -> FinetuneRecipe:
    """Derive the finetune recipe from the registered pretrain recipe
    `name` (reference: default_finetune_recipe + per-model overrides).

    SFT sequences are short (squad/dolly ~2k); the pretrain mesh is kept
    (weights dominate HBM, activations shrink) but GBS drops to the
    reference's SFT default and the LR follows the peft scheme."""
    base = RECIPES[name]()
    model = dataclasses.replace(
        base.model, seq_length=min(seq_length, base.model.seq_length))
    peft = _peft_for(peft_scheme)
    # reference finetune_default.py: lora lr 1e-4; full SFT lr 5e-6
    lr = 1e-4 if peft is not None else 5e-6
    defaults = dict(
        name=f"{name}_finetune",
        model=model,
        mesh=base.mesh,
        global_batch_size=min(128, base.global_batch_size),
        micro_batch_size=base.micro_batch_size,
        peft=peft,
        lr=lr,
    )
    defaults.update(kw)
    return FinetuneRecipe(**defaults)


def _resolved_or_default(self: MeshConfig) -> MeshConfig:
    """Resolve against the actual device count, collapsing axes that don't
    fit (so recipes remain runnable on any mesh, incl. 1 chip)."""
    import jax

    n = jax.device_count()
    tp = self.tp if n % self.tp == 0 and self.tp <= n else 1
    rest = n // tp
    cp = self.cp if rest % self.cp == 0 and self.cp <= rest else 1
    rest //= cp
    ep = self.ep if rest % self.ep == 0 and self.ep <= rest else 1
    rest //= ep
    fsdp = rest if self.fsdp == -1 else (self.fsdp if rest % self.fsdp == 0 else 1)
    dp = n // (tp * cp * ep * fsdp)
    return MeshConfig(dp=dp, fsdp=fsdp, cp=cp, ep=ep, tp=tp)


MeshConfig.resolved_or_default = _resolved_or_default
