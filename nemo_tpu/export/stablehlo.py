"""StableHLO export of jitted model programs.

Reference parity: the export/deploy layer (`nemo/export/tensorrt_llm.py:137`
TensorRTLLM.export, `nemo/core/classes/exportable.py` ONNX/TorchScript).
On TPU the deployable artifact is the compiled XLA program itself:
`jax.export` serializes the traced StableHLO with its calling convention,
versioned for forward compatibility — the direct analog of an engine
build, minus the vendor lock. Weights ride alongside as an orbax-free
npz (they are ordinary arrays; the program closes over shapes only).

Layout written by save_exported:
    <dir>/program.stablehlo   serialized jax.export artifact
    <dir>/weights.npz         flat param arrays
    <dir>/manifest.json       config dataclass + arg tree structure
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export


def _flatten_params(params) -> Dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, leaf in flat:
        key = "/".join(
            p.key if hasattr(p, "key") else str(p.idx) for p in path)
        out[key] = np.asarray(leaf)
    return out


def _unflatten_params(npz) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key in npz.files:
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(npz[key])
    return tree


@dataclasses.dataclass
class ExportedProgram:
    """A deserialized saved program + its weights."""

    exported: Any  # jax.export.Exported
    params: Any
    manifest: Dict[str, Any]

    def __call__(self, *args):
        return self.exported.call(self.params, *args)


def save_exported(fn: Callable, params, example_args: Sequence[Any],
                  output_path: str, manifest: Optional[Dict[str, Any]] = None,
                  platforms: Sequence[str] = ("tpu", "cpu")) -> str:
    """Trace fn(params, *example_args), serialize StableHLO + weights.

    `platforms` embeds lowerings for each target so one artifact serves
    both the TPU fleet and CPU smoke tests."""
    os.makedirs(output_path, exist_ok=True)
    shapes = jax.tree.map(lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
                          (params,) + tuple(example_args))
    exp = jax_export.export(jax.jit(fn), platforms=list(platforms))(*shapes)
    with open(os.path.join(output_path, "program.stablehlo"), "wb") as f:
        f.write(exp.serialize())
    np.savez(os.path.join(output_path, "weights.npz"), **_flatten_params(params))
    man = dict(manifest or {})
    man["num_args"] = len(example_args)
    with open(os.path.join(output_path, "manifest.json"), "w") as f:
        json.dump(man, f, indent=1, default=str)
    return output_path


def load_exported(path: str) -> ExportedProgram:
    with open(os.path.join(path, "program.stablehlo"), "rb") as f:
        exp = jax_export.deserialize(f.read())
    npz = np.load(os.path.join(path, "weights.npz"))
    params = _unflatten_params(npz)
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    return ExportedProgram(exported=exp, params=params, manifest=manifest)


# --------------------------------------------------------------------------
# model-specific exporters
# --------------------------------------------------------------------------


def export_gpt_logits(cfg, params, output_path: str, *, batch: int = 1,
                      seq_len: Optional[int] = None) -> str:
    """Export the full-sequence logits program (scoring / prefill)."""
    from nemo_tpu.models.llm.gpt import GPTModel

    model = GPTModel(cfg)
    S = seq_len or cfg.seq_length

    def fn(p, tokens):
        return model.apply({"params": p}, tokens)

    tokens = jnp.zeros((batch, S), jnp.int32)
    return save_exported(fn, params, (tokens,), output_path,
                         manifest={"kind": "gpt_logits",
                                   "config": dataclasses.asdict(cfg)})


def export_gpt_decode(cfg, params, output_path: str, *, batch: int = 1,
                      max_len: int = 256) -> str:
    """Export one decode step (tokens[B,1] + stacked KV caches → logits +
    updated caches) — the serving inner loop."""
    from nemo_tpu.models.llm.gpt import GPTModel, init_kv_caches

    model = GPTModel(cfg)
    caches = init_kv_caches(cfg, batch, max_len,
                            dtype=jnp.float32 if cfg.compute_dtype == "float32"
                            else jnp.bfloat16)

    def fn(p, tokens, pos, k_cache, v_cache, idx):
        logits, new = model.apply({"params": p}, tokens, pos,
                                  kv_caches=(k_cache, v_cache), decode_index=idx)
        return logits, new[0], new[1]

    args = (jnp.zeros((batch, 1), jnp.int32), jnp.zeros((batch, 1), jnp.int32),
            caches[0], caches[1], jnp.zeros((), jnp.int32))
    return save_exported(fn, params, args, output_path,
                         manifest={"kind": "gpt_decode", "max_len": max_len,
                                   "config": dataclasses.asdict(cfg)})


def export_asr_ctc(model_obj, output_path: str, *, batch: int = 1,
                   num_samples: int = 160000) -> str:
    """Export a CTC ASR model's waveform→log-probs program (mel frontend
    computed in-graph; input is raw samples [B, T] + lengths [B])."""
    wav = jnp.zeros((batch, num_samples), jnp.float32)
    lens = jnp.full((batch,), num_samples, jnp.int32)

    def fn(variables, audio, lengths):
        return model_obj._infer_fn(variables, audio, lengths)

    return save_exported(fn, model_obj.variables, (wav, lens), output_path,
                         manifest={"kind": "asr_ctc", "labels": model_obj.labels})


def export_tts_synthesize(fastpitch_model, hifigan_model, output_path: str,
                          *, batch: int = 1, max_tokens: int = 128) -> str:
    """Export end-to-end TTS synthesis as ONE program: text tokens [B, U] +
    token lengths [B] → (waveform [B, max_mel_len*hop], mel_len [B]).
    Callers trim audio to mel_len*hop. The mel generator and vocoder fuse
    into a single compiled graph — the reference exports these as separate
    TRT engines (export/tensorrt_mm_exporter.py); one XLA program avoids
    the intermediate host round-trip."""
    fp_net = fastpitch_model.net
    fp_vars = fastpitch_model.variables
    gen = hifigan_model.generator
    gen_params = hifigan_model.variables["params"]["generator"]
    params = {"fastpitch": fp_vars["params"], "generator": gen_params}

    def fn(p, tokens, token_len):
        out = fp_net.apply({"params": p["fastpitch"]}, tokens, token_len,
                           train=False)
        audio = gen.apply({"params": p["generator"]}, out["mel"])
        return audio, out["mel_len"]

    args = (jnp.zeros((batch, max_tokens), jnp.int32),
            jnp.full((batch,), max_tokens, jnp.int32))
    return save_exported(fn, params, args, output_path,
                         manifest={"kind": "tts_synthesize",
                                   "sample_rate": fastpitch_model.sample_rate,
                                   "hop_length": hifigan_model.hop_length})


def export_vlm_generate(model, params, output_path: str, *, batch: int = 1,
                        prompt_len: int = 32, max_new_tokens: int = 16,
                        image_shape: Optional[Tuple[int, ...]] = None,
                        eos_id: int = -1,
                        platforms: Sequence[str] = ("tpu", "cpu")) -> str:
    """Export the FULL image→text greedy generation loop as one StableHLO
    program (reference role: `nemo/export/multimodal/build.py` +
    `tensorrt_mm_exporter.py` — vision engine + LLM engine + the decode
    loop; one fused XLA program replaces the three TRT engines and their
    host glue).

    Program signature: (params, images, tokens [B, prompt_len] left-padded
    with placeholder runs, prompt_len [B], positions ([B,S] or [B,S,3]
    M-RoPE), rng) → generated tokens [B, max_new_tokens] (-1 past EOS).
    """
    from nemo_tpu.models.llm.generate import SamplingParams
    from nemo_tpu.models.vlm.inference import VLMGenerationEngine

    engine = VLMGenerationEngine(model, params)
    sampling = SamplingParams(greedy=True, max_new_tokens=max_new_tokens,
                              eos_id=eos_id)
    run = engine._build(batch, prompt_len, sampling)
    if image_shape is None:
        v = model.cfg.vision
        image_shape = (batch, v.image_size, v.image_size, 3)
    if engine.family == "qwen2vl":
        positions = jnp.zeros((batch, prompt_len, 3), jnp.int32)
    else:
        positions = jnp.zeros((batch, prompt_len), jnp.int32)
    args = (jnp.zeros(image_shape, jnp.float32),
            jnp.zeros((batch, prompt_len), jnp.int32),
            jnp.zeros((batch,), jnp.int32),
            positions,
            jax.random.PRNGKey(0))
    return save_exported(run, params, args, output_path, platforms=platforms,
                         manifest={"kind": "vlm_generate",
                                   "family": engine.family,
                                   "prompt_len": prompt_len,
                                   "max_new_tokens": max_new_tokens,
                                   "image_token_id": engine.image_token_id})
