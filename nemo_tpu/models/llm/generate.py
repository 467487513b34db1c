"""Autoregressive generation: batched prefill + jitted decode loop.

Reference parity: llm.generate → MCoreEngine + TextGenerationController
(`nemo/collections/llm/inference/base.py:192,251` — batched autoregressive
decode with TP/PP collectives per token). TPU-native shape: left-padded
prompts share a single cache write index, the whole decode loop is one
`lax.scan` inside jit (no per-token host round-trips — the reference needed
CUDA-graph "flash decode" for this), sampling (greedy/temperature/top-k/
top-p) runs on-device.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nemo_tpu.models.llm.config import GPTConfig
from nemo_tpu.models.llm.gpt import GPTModel, init_kv_caches


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Reference parity: CommonInferenceParams (llm.generate)."""

    temperature: float = 1.0
    top_k: int = 0  # 0 = disabled
    top_p: float = 0.0  # 0 = disabled
    greedy: bool = True
    max_new_tokens: int = 64
    eos_id: int = -1  # -1 = never stop early


def _sample(logits: jnp.ndarray, rng, p: SamplingParams) -> jnp.ndarray:
    """[B, V] → [B] token ids."""
    if p.greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / jnp.maximum(p.temperature, 1e-6)
    if p.top_k > 0:
        kth = jax.lax.top_k(logits, p.top_k)[0][:, -1:]
        logits = jnp.where(logits < kth, -1e30, logits)
    if p.top_p > 0.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum(cum < p.top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -1e30, logits)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


class GenerationEngine:
    """Owns the jitted prefill+decode program for one (B, S_pad, max_new)."""

    def __init__(self, cfg: GPTConfig, params, cache_dtype=jnp.bfloat16):
        self.cfg = cfg
        self.model = GPTModel(cfg)
        self.params = params
        self.cache_dtype = cache_dtype
        self._jit = {}

    def _build(self, B: int, S: int, sampling: SamplingParams):
        cfg, model = self.cfg, self.model
        total = S + sampling.max_new_tokens

        def run(params, tokens, prompt_len, rng):
            """tokens [B, S] LEFT-padded; prompt_len [B]."""
            pad = S - prompt_len  # [B]
            slots = jnp.arange(S)[None, :]
            positions = jnp.maximum(slots - pad[:, None], 0)
            kv_valid0 = jnp.zeros((B, total), bool).at[:, :S].set(slots >= pad[:, None])

            caches = init_kv_caches(cfg, B, total, self.cache_dtype)
            logits, caches = model.apply(
                {"params": params}, tokens, positions,
                kv_caches=caches, decode_index=0, kv_valid=kv_valid0[:, :total],
            )
            last = logits[:, -1]  # [B, V] (slot S-1 = last prompt token)

            def step(carry, i):
                caches, prev_logits, tok_prev, done, kv_valid, rng = carry
                rng, sub = jax.random.split(rng)
                tok = _sample(prev_logits, sub, sampling)
                tok = jnp.where(done, 0, tok)
                slot = S + i
                kv_valid = kv_valid.at[:, slot].set(~done)
                pos = (slot - pad)[:, None]
                logits, caches = model.apply(
                    {"params": params}, tok[:, None], pos,
                    kv_caches=caches, decode_index=slot, kv_valid=kv_valid,
                )
                new_done = done | (tok == sampling.eos_id)
                out_tok = jnp.where(done, -1, tok)
                return (caches, logits[:, 0], tok, new_done, kv_valid, rng), out_tok

            init = (caches, last, jnp.zeros(B, jnp.int32), jnp.zeros(B, bool), kv_valid0, rng)
            _, out_tokens = jax.lax.scan(step, init, jnp.arange(sampling.max_new_tokens))
            return jnp.transpose(out_tokens)  # [B, max_new]

        return jax.jit(run)

    def generate_tokens(
        self,
        prompt_ids: Sequence[Sequence[int]],
        sampling: SamplingParams = SamplingParams(),
        seed: int = 0,
    ) -> List[List[int]]:
        B = len(prompt_ids)
        S = max(8, int(2 ** np.ceil(np.log2(max(len(p) for p in prompt_ids)))))
        key = (B, S, sampling)
        if key not in self._jit:
            self._jit[key] = self._build(B, S, sampling)
        tokens = np.zeros((B, S), np.int32)
        plen = np.zeros(B, np.int32)
        for b, p in enumerate(prompt_ids):
            tokens[b, S - len(p):] = p  # left padding
            plen[b] = len(p)
        out = self._jit[key](
            self.params, jnp.asarray(tokens), jnp.asarray(plen), jax.random.PRNGKey(seed)
        )
        out = np.asarray(out)
        results = []
        for b in range(B):
            ids = [int(t) for t in out[b] if t >= 0]
            if sampling.eos_id >= 0 and sampling.eos_id in ids:
                ids = ids[: ids.index(sampling.eos_id)]
            results.append(ids)
        return results


def generate(
    cfg: GPTConfig,
    params,
    tokenizer,
    prompts: Sequence[str],
    sampling: SamplingParams = SamplingParams(),
    seed: int = 0,
) -> List[str]:
    """Text-level API (reference llm.generate, api.py:1061)."""
    engine = GenerationEngine(cfg, params)
    ids = [tokenizer.text_to_ids(p) for p in prompts]
    out = engine.generate_tokens(ids, sampling, seed)
    return [tokenizer.ids_to_text(o) for o in out]
