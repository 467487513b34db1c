"""VLM generation: image-conditioned prefill + jitted scan decode.

Reference parity: `nemo/collections/vlm/inference/vlm_engine.py` +
`vlm_inference_wrapper.py` / `qwenvl_inference_wrapper.py` /
`llava_inference_wrapper.py` — the reference wraps each VLM family in an
inference wrapper that (a) runs the vision tower + projector once, (b)
splices image embeddings at placeholder positions, (c) feeds the result
into the MCoreEngine text generation controller's KV-cached decode.

TPU-native shape: the entire request — vision encode, embedding splice,
prefill, and the full decode loop — is ONE jitted program per
(B, S, sampling) bucket. The vision tower output feeds the LLM prefill as
`inputs_embeds`; decode steps embed sampled tokens normally, so the decode
scan is byte-identical to the text-only engine's. Left-padded prompts share
a single cache write index (see GenerationEngine, models/llm/generate.py).

Family mechanics handled here:
- neva (LLaVA):   features at placeholder positions, 1-D RoPE.
- gemma3vl:       pooled SigLIP features, bidirectional image-span mask
                  during prefill (bidir_ids), 1-D RoPE.
- qwen2vl:        merged ViT patches, 3-axis M-RoPE positions in prefill
                  AND decode (text decode ids advance all three axes from
                  max(prompt position)+1, reference get_rope_index).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from nemo_tpu.models.llm.generate import SamplingParams, _sample
from nemo_tpu.models.llm.gpt import init_kv_caches
from nemo_tpu.models.vlm.gemma3vl import Gemma3VLModel, image_span_ids
from nemo_tpu.models.vlm.neva import NevaModel
from nemo_tpu.models.vlm.qwen2vl import Qwen2VLModel, get_mrope_positions


def _llm_forward(mdl, *args, **kwargs):
    """apply-method: run the wrapped GPT LLM inside the VLM's scope."""
    return mdl.llm(*args, **kwargs)


class VLMGenerationEngine:
    """Owns the jitted image→text program for one (B, S, max_new) bucket.

    `model` is a NevaModel / Gemma3VLModel / Qwen2VLModel; `params` its
    full variables["params"] tree (vision + projector + llm). All three
    families must use placeholder-token splicing (image_token_id ≥ 0) —
    the collator emits exactly n_image_tokens placeholders per row.
    """

    def __init__(self, model, params, cache_dtype=jnp.bfloat16):
        self.model = model
        self.params = params
        self.cache_dtype = cache_dtype
        self.family = (
            "qwen2vl" if isinstance(model, Qwen2VLModel)
            else "gemma3vl" if isinstance(model, Gemma3VLModel)
            else "neva")
        self.cfg = model.cfg
        self.image_token_id = int(self.cfg.image_token_id)
        if self.image_token_id < 0:
            raise ValueError("VLM generation requires placeholder splicing "
                             "(image_token_id >= 0)")
        self._jit = {}

    # -- family-specific pieces (pure, run under jit) ----------------------

    def _embed(self, params, images, tokens):
        """vision encode + projector + placeholder splice → [B, S, D]."""
        model = self.model
        if self.family == "qwen2vl":
            def m(mdl, images, tokens):
                img = mdl.encode_images(images)
                is_img = tokens == mdl.cfg.image_token_id
                txt = mdl.llm.embed_tokens(jnp.where(is_img, 0, tokens))
                idx = jnp.cumsum(is_img.astype(jnp.int32), axis=1) - 1
                gathered = jnp.take_along_axis(
                    img.astype(txt.dtype),
                    jnp.clip(idx, 0, img.shape[1] - 1)[..., None], axis=1)
                return jnp.where(is_img[..., None], gathered, txt)
            return model.apply({"params": params}, images, tokens, method=m)
        if self.family == "gemma3vl":
            def m(mdl, images, tokens):
                B = tokens.shape[0]
                img = mdl.encode_images(images)  # [B·N, T, H]
                img = img.reshape(B, -1, img.shape[-1])
                return mdl.splice(tokens, img)
            return model.apply({"params": params}, images, tokens, method=m)

        def m(mdl, images, tokens):
            img = mdl.encode_images(images)
            return mdl.splice(tokens, img)
        return model.apply({"params": params}, images, tokens, method=m)

    def _build(self, B: int, S: int, sampling: SamplingParams):
        model, llm_cfg = self.model, self.cfg.llm
        total = S + sampling.max_new_tokens
        mrope = self.family == "qwen2vl"

        def run(params, images, tokens, prompt_len, positions, rng):
            """tokens [B, S] LEFT-padded (placeholders + text); positions:
            [B, S] (1-D rope) or [B, S, 3] (M-RoPE, host-built); decode
            positions continue at max(positions)+1 per row."""
            pad = S - prompt_len  # [B]
            slots = jnp.arange(S)[None, :]
            kv_valid0 = jnp.zeros((B, total), bool).at[:, :S].set(
                slots >= pad[:, None])

            embeds = self._embed(params, images, tokens)
            bidir = None
            if self.family == "gemma3vl":
                bidir = image_span_ids(tokens, self.image_token_id)

            caches = init_kv_caches(llm_cfg, B, total, self.cache_dtype)
            logits, caches = model.apply(
                {"params": params}, None, positions,
                kv_caches=caches, decode_index=0, kv_valid=kv_valid0,
                inputs_embeds=embeds, bidir_ids=bidir, method=_llm_forward)
            last = logits[:, -1]

            if mrope:
                # text decode ids: all 3 axes advance together from the
                # prompt's max position + 1 (reference get_rope_index)
                next_pos = jnp.max(
                    jnp.where(kv_valid0[:, :S, None], positions, -1),
                    axis=(1, 2)) + 1  # [B]
            else:
                next_pos = jnp.max(
                    jnp.where(kv_valid0[:, :S], positions, -1), axis=1) + 1

            def step(carry, i):
                caches, prev_logits, tok_prev, done, kv_valid, rng = carry
                rng, sub = jax.random.split(rng)
                tok = _sample(prev_logits, sub, sampling)
                tok = jnp.where(done, 0, tok)
                slot = S + i
                kv_valid = kv_valid.at[:, slot].set(~done)
                if mrope:
                    pos = jnp.broadcast_to(
                        (next_pos + i)[:, None, None], (B, 1, 3))
                else:
                    pos = (next_pos + i)[:, None]
                logits, caches = model.apply(
                    {"params": params}, tok[:, None], pos,
                    kv_caches=caches, decode_index=slot, kv_valid=kv_valid,
                    method=_llm_forward)
                new_done = done | (tok == sampling.eos_id)
                out_tok = jnp.where(done, -1, tok)
                return (caches, logits[:, 0], tok, new_done, kv_valid, rng), out_tok

            init = (caches, last, jnp.zeros(B, jnp.int32),
                    jnp.zeros(B, bool), kv_valid0, rng)
            _, out_tokens = jax.lax.scan(
                step, init, jnp.arange(sampling.max_new_tokens))
            return jnp.transpose(out_tokens)  # [B, max_new]

        return jax.jit(run)

    # -- host-side request assembly ----------------------------------------

    def _pad_prompts(self, prompt_ids, grids=None):
        B = len(prompt_ids)
        S = max(8, int(2 ** np.ceil(np.log2(max(len(p) for p in prompt_ids)))))
        tokens = np.zeros((B, S), np.int32)
        plen = np.zeros(B, np.int32)
        for b, p in enumerate(prompt_ids):
            tokens[b, S - len(p):] = p
            plen[b] = len(p)
        if self.family == "qwen2vl":
            positions = np.zeros((B, S, 3), np.int32)
            for b, p in enumerate(prompt_ids):
                row = np.asarray(p, np.int64)[None, :]
                g = [grids[b]] if grids is not None else [[]]
                pos = get_mrope_positions(row, self.image_token_id, g)
                positions[b, S - len(p):] = pos[0]
        else:
            pad = (S - plen)[:, None]
            positions = np.maximum(np.arange(S)[None, :] - pad, 0).astype(
                np.int32)
        return tokens, plen, positions, S

    def generate_tokens(
        self,
        images,
        prompt_ids: Sequence[Sequence[int]],
        sampling: SamplingParams = SamplingParams(),
        seed: int = 0,
        grids: Optional[Sequence] = None,
    ) -> List[List[int]]:
        """images: [B(,·N), H, W, C] array matching the model's convention;
        prompt_ids: per-row token lists CONTAINING the placeholder runs
        (n_image_tokens repetitions of image_token_id each). `grids`
        (qwen2vl): per-row list of merged (t, h, w) image grids for M-RoPE.
        """
        B = len(prompt_ids)
        tokens, plen, positions, S = self._pad_prompts(prompt_ids, grids)
        key = (B, S, sampling)
        if key not in self._jit:
            self._jit[key] = self._build(B, S, sampling)
        out = self._jit[key](
            self.params, jnp.asarray(images), jnp.asarray(tokens),
            jnp.asarray(plen), jnp.asarray(positions),
            jax.random.PRNGKey(seed))
        out = np.asarray(out)
        results = []
        for b in range(B):
            ids = [int(t) for t in out[b] if t >= 0]
            if sampling.eos_id >= 0 and sampling.eos_id in ids:
                ids = ids[: ids.index(sampling.eos_id)]
            results.append(ids)
        return results


def generate_vlm(model, params, tokenizer, images, prompts: Sequence[str],
                 n_image_tokens: int,
                 sampling: SamplingParams = SamplingParams(),
                 seed: int = 0, grids=None) -> List[str]:
    """Text-level VLM API (reference vlm_engine.generate): each prompt's
    '<image>' marker expands to `n_image_tokens` placeholder ids."""
    image_token_id = int(model.cfg.image_token_id)
    ids = []
    for p in prompts:
        pre, _, post = p.partition("<image>")
        row = tokenizer.text_to_ids(pre) if pre else []
        row = list(row) + [image_token_id] * n_image_tokens
        if post:
            row += list(tokenizer.text_to_ids(post))
        ids.append(row)
    engine = VLMGenerationEngine(model, params)
    out = engine.generate_tokens(images, ids, sampling, seed, grids=grids)
    return [tokenizer.ids_to_text(o) for o in out]
