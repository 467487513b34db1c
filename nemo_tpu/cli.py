"""Command-line interface.

Reference parity: the `nemo llm ...` CLI (entry point `nemo_run.cli`,
reference setup.py:304-308) — `nemo-tpu llm pretrain model=llama3_8b
data.seq_length=2048 trainer.max_steps=100`. Dotted overrides use the same
key=value syntax (hydra_runner style) via core.config.parse_overrides.
"""

from __future__ import annotations

import sys
from typing import List

from nemo_tpu.core.config import ConfigDict, parse_overrides
from nemo_tpu.utils.logging import logging


def _llm_pretrain(cfg: ConfigDict) -> int:
    from nemo_tpu.data.gpt_dataset import MockDataModule, PreTrainingDataModule
    from nemo_tpu.llm.recipes import RECIPES

    model = str(cfg.get("model", "tiny_test"))
    if model not in RECIPES:
        logging.error(f"unknown recipe {model!r}; available: {sorted(RECIPES)}")
        return 2
    recipe = RECIPES[model]()
    trainer_cfg = cfg.get("trainer", ConfigDict())
    data_cfg = cfg.get("data", ConfigDict())
    max_steps = int(trainer_cfg.get("max_steps", 100))

    data = None
    if "paths" in data_cfg:
        data = PreTrainingDataModule(
            data_cfg.paths,
            seq_length=int(data_cfg.get("seq_length", recipe.model.seq_length)),
            global_batch_size=int(data_cfg.get("global_batch_size", recipe.global_batch_size)),
            max_steps=max_steps,
        )
    module, data, trainer = recipe.build(
        data=data, max_steps=max_steps, log_dir=cfg.get("log_dir")
    )
    metrics = trainer.fit(module, data)
    logging.info(f"done: {metrics}")
    return 0


def _llm_generate(cfg: ConfigDict) -> int:
    from nemo_tpu import llm
    from nemo_tpu.data.text_tokenizers import HFTokenizer

    src = cfg.get("checkpoint")
    if not src:
        logging.error("llm generate requires checkpoint=hf://<path>")
        return 2
    model_cfg, params = llm.import_ckpt(str(src))
    tok = HFTokenizer(str(src)[len("hf://"):])
    prompts = [str(cfg.get("prompt", "Hello"))]
    out = llm.generate(model_cfg, params, prompts, tok,
                       sampling=llm.SamplingParams(
                           max_new_tokens=int(cfg.get("max_tokens", 32))))
    print(out[0])
    return 0


def _asr_transcribe(cfg: ConfigDict) -> int:
    from nemo_tpu.interop.nemo_import import import_ctc_model
    from nemo_tpu.models.asr.ctc_models import EncDecCTCModel

    ckpt = str(cfg.get("model", ""))
    if ckpt.endswith(".nemo"):
        model = import_ctc_model(ckpt)
    elif ckpt.endswith(".ntpu"):
        model = EncDecCTCModel.restore_from(ckpt)
    else:
        logging.error("asr transcribe requires model=<path>.nemo|.ntpu")
        return 2
    audio = str(cfg.get("audio", "")).split(",")
    for path, text in zip(audio, model.transcribe(audio)):
        print(f"{path}\t{text}")
    return 0


def _serve(cfg: ConfigDict) -> int:
    from nemo_tpu import llm
    from nemo_tpu.data.text_tokenizers import HFTokenizer
    from nemo_tpu.serve import LLMServer

    src = str(cfg.get("checkpoint", ""))
    model_cfg, params = llm.import_ckpt(src)
    tok = HFTokenizer(src[len("hf://"):])
    LLMServer(model_cfg, params, tok).serve(port=int(cfg.get("port", 8000)))
    return 0


_COMMANDS = {
    ("llm", "pretrain"): _llm_pretrain,
    ("llm", "generate"): _llm_generate,
    ("llm", "serve"): _serve,
    ("asr", "transcribe"): _asr_transcribe,
}


def main(argv: List[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) < 2 or (argv[0], argv[1]) not in _COMMANDS:
        cmds = " | ".join(f"{a} {b}" for a, b in _COMMANDS)
        print(f"usage: nemo-tpu <{cmds}> key=value ...")
        return 2
    cfg = parse_overrides(argv[2:])
    return _COMMANDS[(argv[0], argv[1])](cfg)


if __name__ == "__main__":
    raise SystemExit(main())
