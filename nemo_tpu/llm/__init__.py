"""User-facing LLM namespace (reference: nemo.collections.llm)."""

from nemo_tpu.llm.api import (  # noqa: F401
    deploy,
    distill,
    evaluate,
    export_ckpt,
    train,
    finetune,
    generate,
    import_ckpt,
    pretrain,
    prune,
    ptq,
    qat,
    validate,
    validate_config,
)
from nemo_tpu.llm.evaluation import LMEvaluator, evaluate_multiple_choice  # noqa: F401
from nemo_tpu.llm.hf_automodel import HFAutoModelForCausalLM  # noqa: F401
from nemo_tpu.llm.peft import CanonicalLoRA, LoRA  # noqa: F401
from nemo_tpu.llm.recipes import RECIPES as recipes  # noqa: F401
from nemo_tpu.llm.recipes import FinetuneRecipe, finetune_recipe  # noqa: F401
from nemo_tpu.llm.tuning_db import recommended_config, tuned_recipe  # noqa: F401
from nemo_tpu.models.llm.config import PRESETS, GPTConfig  # noqa: F401
from nemo_tpu.models.llm.generate import SamplingParams  # noqa: F401
from nemo_tpu.models.llm.train import GPTTrainModule  # noqa: F401
