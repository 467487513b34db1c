"""LLM task API: pretrain / finetune / validate / generate / import / export.

Reference parity: `nemo/collections/llm/api.py` entrypoints (train:74,
pretrain:142, finetune:193, validate:250, generate:1061, import_ckpt:894,
export_ckpt:986) and `_validate_config:1299` (GBS/MBS/DP divisibility
asserts).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from nemo_tpu.core.checkpoint import AutoResume, CheckpointIO
from nemo_tpu.core.trainer import Trainer
from nemo_tpu.models.llm.config import GPTConfig, PRESETS
from nemo_tpu.models.llm.generate import GenerationEngine, SamplingParams
from nemo_tpu.models.llm.train import GPTTrainModule
from nemo_tpu.parallel.mesh import MeshConfig
from nemo_tpu.utils.logging import logging


def validate_config(
    cfg: GPTConfig, mesh: MeshConfig, global_batch_size: int, micro_batch_size: int
) -> None:
    """Divisibility checks (reference api.py:1299,1328-1400)."""
    import jax

    n_dev = jax.device_count()
    mesh = mesh.resolved(n_dev)
    dp = mesh.dp * mesh.fsdp
    if global_batch_size % dp:
        raise ValueError(f"GBS {global_batch_size} must be divisible by DP {dp}")
    # micro_batch_size is PER-DP-RANK (None → no grad accumulation axis)
    if micro_batch_size and global_batch_size % (micro_batch_size * dp):
        raise ValueError(
            f"GBS {global_batch_size} must be divisible by MBS {micro_batch_size} × DP {dp}"
        )
    if cfg.num_attention_heads % mesh.tp:
        raise ValueError(f"heads {cfg.num_attention_heads} % tp {mesh.tp} != 0")
    if cfg.n_kv_heads % mesh.tp and mesh.tp % cfg.n_kv_heads:
        raise ValueError(f"kv heads {cfg.n_kv_heads} incompatible with tp {mesh.tp}")
    if cfg.seq_length % mesh.cp:
        raise ValueError(f"seq_length {cfg.seq_length} % cp {mesh.cp} != 0")


def train(*args, **kwargs):
    """Alias of pretrain with resume enabled (reference api.py:74 train vs
    :142 pretrain distinction: train resumes, pretrain starts fresh)."""
    kwargs.setdefault("resume", True)
    return pretrain(*args, **kwargs)


def pretrain(
    model: GPTConfig | str,
    data,
    trainer: Optional[Trainer] = None,
    *,
    mesh: Optional[MeshConfig] = None,
    max_steps: int = 100,
    log_dir: Optional[str] = None,
    resume: bool = True,
    optimizer=None,
    lr_schedule=None,
):
    """Pretrain from scratch (reference api.py:142). Returns (module, state, metrics)."""
    cfg = PRESETS[model]() if isinstance(model, str) else model
    mesh = mesh or MeshConfig()
    validate_config(cfg, mesh, data.global_batch_size, data.micro_batch_size)
    module = GPTTrainModule(cfg, mesh_cfg=mesh, optimizer=optimizer, lr_schedule=lr_schedule)
    module.context = lambda: {"model_config": dataclasses.asdict(cfg)}
    if trainer is None:
        ckpt_io = CheckpointIO(f"{log_dir}/checkpoints") if log_dir else None
        trainer = Trainer(
            max_steps=max_steps,
            ckpt_io=ckpt_io,
            resume=AutoResume() if (resume and ckpt_io) else None,
        )
    metrics = trainer.fit(module, data)
    return module, trainer.state, metrics


def finetune(
    model: GPTConfig,
    params,
    data,
    *,
    mesh: Optional[MeshConfig] = None,
    max_steps: int = 100,
    peft=None,
    trainer: Optional[Trainer] = None,
    log_dir: Optional[str] = None,
    optimizer=None,
    lr_schedule=None,
):
    """Finetune from existing params (reference api.py:193); `peft` applies a
    parameter-efficient transform (see nemo_tpu.llm.peft). `lr_schedule`
    (a step→lr callable, e.g. FinetuneRecipe.lr_schedule()) or a full optax
    `optimizer` sets the finetuning LR — without one the modules fall back
    to their pretrain defaults (3e-4 full / 1e-4 LoRA), NOT the reference's
    SFT lr 5e-6."""
    mesh = mesh or MeshConfig()
    validate_config(model, mesh, data.global_batch_size, data.micro_batch_size)
    if peft is not None:
        module = peft.build_module(model, params, mesh, optimizer=optimizer,
                                   lr_schedule=lr_schedule)
    else:
        module = GPTTrainModule(model, mesh_cfg=mesh, optimizer=optimizer,
                                lr_schedule=lr_schedule)
    state = module.init_state()
    if peft is None:
        state = state.replace(params=_cast_like(params, state.params, module))
    if trainer is None:
        ckpt_io = CheckpointIO(f"{log_dir}/checkpoints") if log_dir else None
        trainer = Trainer(
            max_steps=max_steps, ckpt_io=ckpt_io,
            resume=AutoResume() if ckpt_io else None,
        )
    # full Trainer loop: callbacks, validation, checkpointing, auto-resume
    metrics = trainer.fit(module, data, initial_state=state)
    return module, trainer.state, metrics


def _cast_like(src, ref, module):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    shardings = module.state_shardings().params

    def put(s, r, sh):
        # never alias the caller's arrays into the train state: the jitted
        # step donates its state, which would delete them out from under
        # the caller (device_put can return a view over the same buffers)
        arr = jnp.array(s, dtype=r.dtype, copy=True)
        return jax.device_put(arr, sh)

    return jax.tree.map(put, src, ref, shardings)


def validate(module, state, data, num_batches: int = 10) -> Dict[str, float]:
    """Eval loss over the validation set (reference api.py:250)."""
    import jax
    import jax.numpy as jnp

    from nemo_tpu.models.llm.loss import masked_token_loss

    model = module.model

    @jax.jit
    def eval_step(params, batch):
        logits = model.apply({"params": params}, batch["tokens"])
        loss, n = masked_token_loss(logits, batch["labels"], batch.get("loss_mask"))
        return loss

    losses = []
    for i, batch in enumerate(data.val_batches()):
        if i >= num_batches:
            break
        losses.append(float(eval_step(state.params, batch)))
    return {"val_loss": float(np.mean(losses))}


def generate(
    model: GPTConfig,
    params,
    prompts: Sequence[str],
    tokenizer,
    *,
    sampling: SamplingParams = SamplingParams(),
    seed: int = 0,
) -> List[str]:
    """Batch text generation (reference api.py:1061)."""
    from nemo_tpu.models.llm.generate import generate as _gen

    return _gen(model, params, tokenizer, prompts, sampling, seed)


def generate_vlm(model, params, images, prompts: Sequence[str], tokenizer,
                 *, n_image_tokens: int,
                 sampling: SamplingParams = SamplingParams(),
                 seed: int = 0, grids=None) -> List[str]:
    """Image-conditioned generation (reference:
    `nemo/collections/vlm/inference/vlm_engine.py` generate). `model` is a
    NevaModel / Gemma3VLModel / Qwen2VLModel; each prompt's '<image>'
    marker expands to `n_image_tokens` placeholder ids at that position."""
    from nemo_tpu.models.vlm.inference import generate_vlm as _gen

    return _gen(model, params, tokenizer, images, prompts, n_image_tokens,
                sampling, seed, grids=grids)


def ptq(cfg: GPTConfig, params, *, algorithm: str = "int8_weight_only",
        min_size: int = 1 << 16):
    """Post-training quantization (reference api.py:305 `ptq`).

    "int8_weight_only": every large kernel → (int8, per-channel scale);
    halves checkpoint/HBM-at-rest size. Returns (cfg, quantized_params);
    pass through `nemo_tpu.ops.quant.dequantize_params` before serving.

    "int8_serve" (the TRT-LLM qnemo-engine analog): returns
    (cfg with quantization="int8_ptq", int8-resident params) that the
    generation/serving engines execute directly — weights stay int8 in
    HBM (½ the bf16 decode bandwidth) and GEMMs ride the MXU int8 pipe,
    with dynamic per-token activation quantization."""
    from nemo_tpu.ops.quant import ptq_params_for_serving, quantize_params_int8

    if algorithm == "int8_serve":
        return ptq_params_for_serving(cfg, params)
    if algorithm != "int8_weight_only":
        raise ValueError(f"unknown ptq algorithm: {algorithm}")
    return cfg, quantize_params_int8(params, min_size=min_size)


def qat(
    cfg: GPTConfig,
    params,
    data,
    *,
    algorithm: str = "int8",
    mesh: Optional[MeshConfig] = None,
    max_steps: int = 100,
    trainer: Optional[Trainer] = None,
    log_dir: Optional[str] = None,
):
    """Quantization-aware training (reference: modelopt QAT flow surfaced
    through `ptq(..., quantization_aware_training)` — nemo/collections/llm/
    modelopt/quantization/quantizer.py).

    Finetunes with fake-quantized GEMMs: every large matmul runs through
    `ops.quant.quant_matmul` in the forward (the exact arithmetic the
    int8/fp8 serving engines execute) while the backward is a
    straight-through estimator against the dequantized operands, so the
    weights learn to sit where the quantizer will put them. The param tree
    is unchanged (same `kernel` leaves), so the result drops straight into
    `ptq(algorithm="int8_serve")` for deployment.

    algorithm: "int8" | "fp8" | "fp8_e4m3" (the training fake-quant modes).
    Returns (qat_cfg, module, state, metrics); `state.params` are the
    quantization-aware weights in the original layout.
    """
    if algorithm not in ("int8", "fp8", "fp8_e4m3"):
        raise ValueError(f"unknown qat algorithm: {algorithm}")
    qcfg = dataclasses.replace(cfg, quantization=algorithm)
    module, state, metrics = finetune(
        qcfg, params, data, mesh=mesh, max_steps=max_steps,
        trainer=trainer, log_dir=log_dir,
    )
    return qcfg, module, state, metrics


class _TeacherData:
    """Data proxy: adds on-device teacher logits to every train batch."""

    def __init__(self, data, teacher_fn, teacher_params):
        self._data = data
        self._fn = teacher_fn
        self._params = teacher_params
        self.global_batch_size = data.global_batch_size
        self.micro_batch_size = data.micro_batch_size

    def train_batches(self, start_step=0):
        for batch in self._data.train_batches(start_step):
            batch = dict(batch)
            batch["teacher_logits"] = self._fn(self._params, batch["tokens"])
            yield batch

    def val_batches(self):
        return self._data.val_batches()


def distill(
    teacher: GPTConfig,
    teacher_params,
    student: GPTConfig,
    data,
    *,
    mesh: Optional[MeshConfig] = None,
    max_steps: int = 100,
    temperature: float = 2.0,
    alpha: float = 0.5,
    trainer: Optional[Trainer] = None,
    log_dir: Optional[str] = None,
    student_params=None,
):
    """Logit knowledge distillation (reference api.py:390 `distill`).

    Teacher runs a frozen jitted forward per batch; the student trains with
    (1−α)·CE + α·T²·KL. Typical flow: `prune()` the teacher → distill into
    the pruned student (Minitron recipe). Returns (module, state, metrics)."""
    import jax

    from nemo_tpu.models.llm.gpt import GPTModel

    mesh = mesh or MeshConfig()
    validate_config(student, mesh, data.global_batch_size, data.micro_batch_size)
    if teacher.vocab_size != student.vocab_size:
        raise ValueError("teacher/student vocab_size must match for logit KD")
    t_model = GPTModel(teacher)

    @jax.jit
    def teacher_fn(p, tokens):
        return jax.lax.stop_gradient(t_model.apply({"params": p}, tokens))

    module = GPTTrainModule(student, mesh_cfg=mesh,
                            kd_temperature=temperature, kd_alpha=alpha)
    initial_state = None
    if student_params is not None:
        initial_state = module.init_state()
        initial_state = initial_state.replace(
            params=_cast_like(student_params, initial_state.params, module))
    if trainer is None:
        ckpt_io = CheckpointIO(f"{log_dir}/checkpoints") if log_dir else None
        trainer = Trainer(max_steps=max_steps, ckpt_io=ckpt_io,
                          resume=AutoResume() if ckpt_io else None)
    wrapped = _TeacherData(data, teacher_fn, teacher_params)
    metrics = trainer.fit(module, wrapped, initial_state=initial_state)
    return module, trainer.state, metrics


def prune(cfg: GPTConfig, params, *, target_ffn_hidden_size: Optional[int] = None,
          target_num_layers: Optional[int] = None, probe_tokens=None):
    """Structured width/depth pruning (reference api.py:476 `prune`);
    see nemo_tpu.llm.prune for the importance metrics. Returns (cfg, params)."""
    from nemo_tpu.llm.pruning import prune_depth, prune_width

    if target_ffn_hidden_size is not None:
        cfg, params = prune_width(cfg, params, target_ffn_hidden_size)
    if target_num_layers is not None:
        cfg, params = prune_depth(cfg, params, target_num_layers,
                                  probe_tokens=probe_tokens)
    return cfg, params


def import_ckpt(source: str):
    """'hf://<repo-or-path>' → (GPTConfig, params) (reference api.py:894)."""
    if source.startswith("hf://"):
        from nemo_tpu.interop.hf_models import import_hf_model

        return import_hf_model(source[len("hf://"):])
    raise ValueError(f"Unknown source scheme: {source}")


def export_ckpt(cfg: GPTConfig, params, target: str, output_path: str):
    """Export a checkpoint (reference api.py:986). Targets:
    "hf" (HF state-dict layout), "stablehlo" (serialized jax.export saved
    program + weights — the TPU engine-export analog of export/tensorrt_llm.py)."""
    if target == "stablehlo":
        from nemo_tpu.export import export_gpt_logits

        return export_gpt_logits(cfg, params, output_path)
    if target != "hf":
        raise ValueError("target must be 'hf' or 'stablehlo'")
    import os

    import torch

    from nemo_tpu.interop.hf_llama import export_hf_llama_state

    os.makedirs(output_path, exist_ok=True)
    sd = export_hf_llama_state(params, cfg)
    torch.save({k: torch.tensor(v) for k, v in sd.items()},
               os.path.join(output_path, "pytorch_model.bin"))
    logging.info(f"Exported HF state dict → {output_path}")
    return output_path


def deploy(
    model: GPTConfig | str,
    params=None,
    tokenizer=None,
    *,
    host: str = "127.0.0.1",
    port: int = 8000,
    max_slots: int = 4,
    max_len: int = 2048,
    blocking: bool = True,
):
    """Serve a model behind the OpenAI-compatible API (reference
    api.py:588 `deploy` → PyTriton + FastAPI proxy; here the native
    continuous-batching server). `model` may be a preset name (random
    init — smoke/deploy tests), or pass (cfg, params, tokenizer) from an
    importer. Returns (server, httpd) when blocking=False."""
    from nemo_tpu.serve.openai_server import LLMServer

    if isinstance(model, str):
        if model.startswith("hf://"):
            from nemo_tpu.data.text_tokenizers import HFTokenizer
            from nemo_tpu.interop.hf_models import import_hf_model

            cfg, params = import_hf_model(model[len("hf://"):])
            tokenizer = tokenizer or HFTokenizer(model[len("hf://"):])
        else:
            cfg = PRESETS[model]()
            if params is None:
                import jax
                import jax.numpy as jnp
                import flax.linen as nn

                from nemo_tpu.models.llm.gpt import GPTModel

                variables = GPTModel(cfg).init(
                    jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
                params = nn.meta.unbox(variables["params"])
    else:
        cfg = model
    if tokenizer is None:
        from nemo_tpu.data.text_tokenizers import ByteLevelTokenizer

        tokenizer = ByteLevelTokenizer()
    srv = LLMServer(cfg, params, tokenizer, max_slots=max_slots,
                    max_len=max_len)
    httpd = srv.serve(host=host, port=port, blocking=blocking)
    return srv, httpd


def evaluate(
    cfg: GPTConfig,
    params,
    tokenizer,
    tasks: Sequence[Dict[str, Any]],
    *,
    batch_size: int = 8,
) -> Dict[str, float]:
    """Multiple-choice evaluation over in-memory tasks (reference
    api.py:806 `evaluate` → lm-eval harness against a deployed endpoint;
    here the in-process batched length-normalized MC protocol —
    llm/evaluation.py covers the endpoint flavor). Each task dict:
    {"context": str, "choices": [str], "answer": int}."""
    from nemo_tpu.llm.evaluation import LMEvaluator, evaluate_multiple_choice

    ev = LMEvaluator(cfg, params, tokenizer)
    return evaluate_multiple_choice(ev, list(tasks), batch_size=batch_size)
