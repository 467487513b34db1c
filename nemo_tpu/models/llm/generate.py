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


class ContinuousBatchingEngine:
    """vLLM-style continuous batching on a fixed slot pool.

    Reference parity: the deploy stack's dynamic batching (SURVEY §2.7;
    the reference leans on Triton/vLLM for this — here it is native).

    TPU-native shape: a shared KV-cache pool [L, slots, max_len, ...];
    per-request prefill writes one slot (few bucketed shapes → few
    compiles), then ONE jitted decode program steps every active slot
    per iteration with per-slot write indices (scatter on the time axis)
    and per-slot causal offsets. Requests join and retire mid-flight
    without touching other slots — no recompiles in steady state."""

    def __init__(self, cfg: GPTConfig, params, *, max_slots: int = 4,
                 max_len: int = 512, prefill_buckets: Sequence[int] = (32, 64, 128),
                 cache_dtype=jnp.bfloat16):
        self.cfg = cfg
        self.model = GPTModel(cfg)
        self.params = params
        self.max_slots = max_slots
        self.max_len = max_len
        self.buckets = sorted(prefill_buckets)
        self.caches = init_kv_caches(cfg, max_slots, max_len, cache_dtype)
        self.cur_len = np.zeros(max_slots, np.int64)  # next write index per slot
        self._prefill_jit = {}
        self._decode_jit = None
        model = self.model

        def prefill(params, k_cache, v_cache, slot, tokens, plen, temperature, rng):
            """tokens [1, Sb] right-padded; writes slot's KV, returns first tok."""
            Sb = tokens.shape[1]
            positions = jnp.arange(Sb)[None, :]
            kv_valid = (jnp.arange(self.max_len) < plen)[None, :]
            kc = jax.lax.dynamic_slice_in_dim(k_cache, slot, 1, axis=1)
            vc = jax.lax.dynamic_slice_in_dim(v_cache, slot, 1, axis=1)
            logits, (kc, vc) = model.apply(
                {"params": params}, tokens, positions,
                kv_caches=(kc, vc), decode_index=0, kv_valid=kv_valid)
            k_cache = jax.lax.dynamic_update_slice_in_dim(k_cache, kc, slot, axis=1)
            v_cache = jax.lax.dynamic_update_slice_in_dim(v_cache, vc, slot, axis=1)
            last = logits[0, plen - 1]
            tok = _temp_sample(last[None], rng, temperature)[0]
            return k_cache, v_cache, tok

        def decode(params, k_cache, v_cache, tok, cur_len, temperature, rng):
            """One step for every slot: tok [B] feeds, writes at cur_len [B]."""
            positions = cur_len[:, None].astype(jnp.int32)
            kv_valid = jnp.arange(self.max_len)[None, :] <= cur_len[:, None]
            logits, (k_cache, v_cache) = model.apply(
                {"params": params}, tok[:, None], positions,
                kv_caches=(k_cache, v_cache),
                decode_index=cur_len.astype(jnp.int32), kv_valid=kv_valid)
            nxt = _temp_sample(logits[:, 0], rng, temperature)
            return k_cache, v_cache, nxt

        self._prefill_fn = prefill
        self._decode_fn = decode

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def prefill_slot(self, slot: int, prompt_ids: Sequence[int],
                     temperature: float = 0.0, seed: int = 0) -> int:
        """Admit a request into `slot`; returns its first generated token."""
        Sb = self._bucket(len(prompt_ids))
        if Sb not in self._prefill_jit:
            self._prefill_jit[Sb] = jax.jit(self._prefill_fn)
        ids = list(prompt_ids)[-Sb:]
        toks = np.zeros((1, Sb), np.int32)
        toks[0, : len(ids)] = ids
        k, v, tok = self._prefill_jit[Sb](
            self.params, self.caches[0], self.caches[1], jnp.asarray(slot),
            jnp.asarray(toks), jnp.asarray(len(ids)),
            jnp.asarray(temperature, jnp.float32), jax.random.PRNGKey(seed))
        self.caches = (k, v)
        self.cur_len[slot] = len(ids)
        return int(tok)

    def decode_step(self, feed_tokens: np.ndarray, active: np.ndarray,
                    temperature=0.0, seed: int = 0) -> np.ndarray:
        """feed_tokens [slots] (last sampled per slot; 0 for inactive).
        Advances active slots one token; returns next tokens [slots].
        `temperature` is a scalar or per-slot [slots] vector (each request's
        own sampling params under continuous batching)."""
        if self._decode_jit is None:
            self._decode_jit = jax.jit(self._decode_fn)
        k, v, nxt = self._decode_jit(
            self.params, self.caches[0], self.caches[1],
            jnp.asarray(feed_tokens, jnp.int32), jnp.asarray(self.cur_len),
            jnp.asarray(temperature, jnp.float32), jax.random.PRNGKey(seed))
        self.caches = (k, v)
        self.cur_len = np.where(active, self.cur_len + 1, self.cur_len)
        return np.asarray(nxt)

    def free_slot(self, slot: int):
        self.cur_len[slot] = 0


def _temp_sample(logits: jnp.ndarray, rng, temperature) -> jnp.ndarray:
    """Greedy when temperature==0 else categorical — one program for both
    (`where` keeps the decode jit cache at size 1). `temperature` may be a
    scalar or a per-row [B] vector (continuous batching: each slot keeps its
    own request's sampling params — a greedy request stays deterministic
    even when co-scheduled with sampled ones)."""
    t = jnp.asarray(temperature, jnp.float32)
    t_rows = t if t.ndim == 0 else t[:, None]
    greedy = jnp.argmax(logits, -1).astype(jnp.int32)
    sampled = jax.random.categorical(
        rng, logits / jnp.maximum(t_rows, 1e-6), axis=-1).astype(jnp.int32)
    return jnp.where(t > 0, sampled, greedy)


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
