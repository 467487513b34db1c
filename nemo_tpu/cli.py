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


def _tts_synthesize(cfg: ConfigDict) -> int:
    from nemo_tpu.data.audio_io import write_wav
    from nemo_tpu.models.tts import FastPitchModel, HifiGanModel, VitsModel

    text = str(cfg.get("text", "hello world"))
    out = str(cfg.get("out", "out.wav"))
    vits = cfg.get("vits")
    if vits:
        m = VitsModel.restore_from(str(vits))
        wav = m.convert_text_to_waveform(m.parse(text))
        write_wav(out, wav[0], m.sample_rate)
    else:
        spec_path = str(cfg.get("spec_model", ""))
        voc_path = str(cfg.get("vocoder", ""))
        if not spec_path or not voc_path:
            logging.error("tts synthesize requires vits=<.ntpu> or "
                          "spec_model=<.ntpu> vocoder=<.ntpu>")
            return 2
        spec = FastPitchModel.restore_from(spec_path)
        voc = HifiGanModel.restore_from(voc_path)
        mel = spec.generate_spectrogram(spec.parse(text))
        import jax.numpy as jnp
        import numpy as np

        wav = np.asarray(voc.convert_spectrogram_to_audio(jnp.asarray(mel)))
        write_wav(out, wav[0], spec.sample_rate)
    logging.info(f"wrote {out}")
    return 0


def _asr_diarize(cfg: ConfigDict) -> int:
    from nemo_tpu.data.audio_io import read_wav
    from nemo_tpu.models.asr.sortformer import SortformerDiarizer
    from nemo_tpu.tools.speech_simulator import segments_to_rttm

    ckpt = str(cfg.get("model", ""))
    m = (SortformerDiarizer.restore_from(ckpt) if ckpt
         else SortformerDiarizer(ConfigDict()))
    audio, sr = read_wav(str(cfg.get("audio")), target_sr=m.sample_rate)
    segs = m.diarize(audio)
    # frames → seconds via the model frame rate
    _, F = m.forward_activities(audio)
    spf = (len(audio) / m.sample_rate) / max(F, 1)
    out = [{"speaker": s["speaker"], "start": s["start_frame"] * spf,
            "end": s["end_frame"] * spf} for s in segs]
    print(segments_to_rttm(out, uri=str(cfg.get("uri", "audio"))))
    return 0


def _asr_align(cfg: ConfigDict) -> int:
    from nemo_tpu.interop.nemo_import import import_ctc_model
    from nemo_tpu.models.asr.ctc_models import EncDecCTCModel
    from nemo_tpu.tools.forced_align import align_transcript

    ckpt = str(cfg.get("model", ""))
    model = (import_ctc_model(ckpt) if ckpt.endswith(".nemo")
             else EncDecCTCModel.restore_from(ckpt))
    words = align_transcript(model, str(cfg.get("audio")),
                             str(cfg.get("text", "")))
    for w in words:
        print(f"{w['start']:.2f}\t{w['end']:.2f}\t{w['word']}")
    return 0


def _asr_eval(cfg: ConfigDict) -> int:
    """WER/CER over a manifest (reference: speech_to_text_eval.py —
    transcribe the manifest's audio, score against its `text` fields)."""
    import json as _json

    from nemo_tpu.interop.nemo_import import import_ctc_model
    from nemo_tpu.models.asr.ctc_models import EncDecCTCModel
    from nemo_tpu.models.asr.metrics import word_error_rate

    ckpt = str(cfg.get("model", ""))
    model = (import_ctc_model(ckpt) if ckpt.endswith(".nemo")
             else EncDecCTCModel.restore_from(ckpt))
    manifest = str(cfg.get("manifest", ""))
    if not manifest:
        logging.error("asr eval requires manifest=<path.jsonl>")
        return 2
    paths, refs = [], []
    with open(manifest) as f:
        for line in f:
            if line.strip():
                e = _json.loads(line)
                paths.append(e["audio_filepath"])
                refs.append(e.get("text", ""))
    hyps = model.transcribe(paths, batch_size=int(cfg.get("batch_size", 4)))
    use_cer = bool(cfg.get("use_cer", False))
    score = word_error_rate(hyps, refs, use_cer=use_cer)
    if cfg.get("output"):
        with open(str(cfg.output), "w") as f:
            for p, h, r in zip(paths, hyps, refs):
                f.write(_json.dumps(
                    {"audio_filepath": p, "pred_text": h, "text": r}) + "\n")
    out = {("cer" if use_cer else "wer"): round(score, 4),
           "utterances": len(paths)}
    if bool(cfg.get("bleu", False)):
        # translation-task scoring (reference: Canary AED validation BLEU)
        from nemo_tpu.models.asr.metrics import corpus_bleu

        out["bleu"] = round(corpus_bleu(hyps, refs), 4)
    print(_json.dumps(out))
    return 0


def _llm_finetune(cfg: ConfigDict) -> int:
    """Fine-tune a recipe on a jsonl dataset (reference api.py finetune)."""
    from nemo_tpu.data.fine_tuning import FineTuningDataModule
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
    if "path" in data_cfg:
        from nemo_tpu.data.text_tokenizers import HFTokenizer

        data = FineTuningDataModule(
            str(data_cfg.path),
            tokenizer=HFTokenizer(str(data_cfg.get("tokenizer", "gpt2"))),
            seq_length=int(data_cfg.get("seq_length", recipe.model.seq_length)),
            global_batch_size=int(
                data_cfg.get("global_batch_size", recipe.global_batch_size)),
        )
    peft = str(cfg.get("peft", "")) or None
    module, data, trainer = recipe.build(
        data=data, max_steps=max_steps, log_dir=cfg.get("log_dir"))
    if peft:
        # adapter-only finetune from the recipe's (fresh or restored) base
        from nemo_tpu import llm as llm_api
        from nemo_tpu.llm.peft import CanonicalLoRA, LoRA

        transform = {"lora": LoRA(), "dora": LoRA(dora=True),
                     "canonical_lora": CanonicalLoRA()}[peft]
        import flax.linen as nn

        base = nn.meta.unbox(module.init_state(seed=0).params)
        _, _, metrics = llm_api.finetune(
            recipe.model, base, data, trainer=trainer, peft=transform)
    else:
        metrics = trainer.fit(module, data)
    logging.info(f"done: {metrics}")
    return 0


def _audio_serve(cfg: ConfigDict) -> int:
    """Serve ASR/TTS behind the OpenAI audio API (audio_server.py)."""
    from nemo_tpu.serve.audio_server import AudioServer

    asr = tts = None
    if cfg.get("asr"):
        from nemo_tpu.interop.nemo_import import import_ctc_model
        from nemo_tpu.models.asr.ctc_models import EncDecCTCModel

        p = str(cfg.asr)
        asr = (import_ctc_model(p) if p.endswith(".nemo")
               else EncDecCTCModel.restore_from(p))
    if cfg.get("vits"):
        from nemo_tpu.models.tts import VitsModel

        tts = VitsModel.restore_from(str(cfg.vits))
    elif cfg.get("spec_model"):
        from nemo_tpu.models.tts import FastPitchModel, HifiGanModel

        tts = (FastPitchModel.restore_from(str(cfg.spec_model)),
               HifiGanModel.restore_from(str(cfg.vocoder)))
    if asr is None and tts is None:
        logging.error("audio serve requires asr=<ckpt> and/or "
                      "vits=<ckpt> | spec_model=<ckpt> vocoder=<ckpt>")
        return 2
    AudioServer(asr=asr, tts=tts).serve(port=int(cfg.get("port", 8001)))
    return 0


def _llm_ptq(cfg: ConfigDict) -> int:
    """Quantize a checkpoint for serving (reference api.py ptq)."""
    import dataclasses

    from nemo_tpu import llm
    from nemo_tpu.core.checkpoint import CheckpointIO

    src = str(cfg.get("checkpoint", ""))
    out = str(cfg.get("out", ""))
    if not src or not out:
        logging.error("llm ptq requires checkpoint=hf://<id>|<dir> out=<dir>")
        return 2
    model_cfg, params = llm.import_ckpt(src)
    algo = str(cfg.get("algorithm", "int8_serve"))
    cfg_q, params_q = llm.ptq(model_cfg, params, algorithm=algo)
    io = CheckpointIO(out)
    io.save({"params": params_q}, 0,
            context={"config": dataclasses.asdict(cfg_q), "algorithm": algo})
    io.wait()
    logging.info(f"wrote quantized checkpoint to {out}")
    return 0


def _llm_preprocess(cfg: ConfigDict) -> int:
    """jsonl → .bin/.idx token dataset (reference:
    scripts/nlp_language_modeling/preprocess_data_for_megatron.py)."""
    from nemo_tpu.data.preprocess import (
        preprocess_jsonl, tokenizer_factory_from_spec)

    inputs = cfg.get("input")
    out = cfg.get("output_prefix")
    if not inputs or not out:
        logging.error(
            "llm preprocess requires input=<a.jsonl[,b.jsonl]> "
            "output_prefix=<path> [tokenizer=hf://...|char|byte] "
            "[json_keys=text] [workers=N] [append_eod=true]")
        return 2
    stats = preprocess_jsonl(
        str(inputs).split(","), str(out),
        tokenizer_factory_from_spec(str(cfg.get("tokenizer", "byte"))),
        json_keys=str(cfg.get("json_keys", "text")).split(","),
        append_eod=bool(cfg.get("append_eod", True)),
        workers=int(cfg.get("workers", 1)),
    )
    print(stats)
    return 0


_COMMANDS = {
    ("llm", "pretrain"): _llm_pretrain,
    ("llm", "finetune"): _llm_finetune,
    ("llm", "generate"): _llm_generate,
    ("llm", "serve"): _serve,
    ("llm", "ptq"): _llm_ptq,
    ("llm", "preprocess"): _llm_preprocess,
    ("asr", "transcribe"): _asr_transcribe,
    ("asr", "eval"): _asr_eval,
    ("asr", "diarize"): _asr_diarize,
    ("asr", "align"): _asr_align,
    ("asr", "serve"): _audio_serve,
    ("tts", "synthesize"): _tts_synthesize,
    ("tts", "serve"): _audio_serve,
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
