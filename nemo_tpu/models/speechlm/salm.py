"""SALM: Speech-Augmented Language Model.

Reference parity: `nemo/collections/speechlm2/models/salm.py` — a frozen
(or LoRA-tuned) LLM consuming audio through [conformer encoder →
modality adapter → projection] as prefix embeddings, trained with CE on
the text continuation only.

TPU-first shape: the whole path (mel → conformer → k-frame stacking →
projector → splice → GPT) is one jitted program; audio prefix length is
static per duration bucket so serving/training never recompiles on
content. Prompt format: [audio embeds | prompt tokens | answer tokens],
loss-masked to the answer.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.models.llm.config import GPTConfig
from nemo_tpu.models.llm.gpt import GPTModel
from nemo_tpu.ops.audio import MelSpectrogramConfig, mel_spectrogram


@dataclasses.dataclass(frozen=True)
class SALMConfig:
    llm: GPTConfig = dataclasses.field(default_factory=GPTConfig)
    # audio encoder config dict (conformer-style; see models/asr/configs.py)
    encoder: Any = None
    mel_features: int = 80
    # modality adapter: stack k encoder frames per LLM position (the
    # reference's fixed-rate downsampling adapter)
    frame_stacking: int = 2
    freeze_llm: bool = False  # handled by the optimizer mask upstream


class SALMNet(nn.Module):
    cfg: SALMConfig

    def setup(self):
        from nemo_tpu.models.asr.ctc_models import build_encoder

        self.encoder = build_encoder(
            ConfigDict(dict(self.cfg.encoder)), self.cfg.mel_features, name="encoder")
        self.llm = GPTModel(self.cfg.llm, name="llm")
        self.projector = nn.Dense(self.cfg.llm.hidden_size, name="projector")

    def encode_audio(self, feats, feat_len, *, train=False):
        """mel [B,D,T] → LLM-space prefix embeddings [B, Ta, H] + lengths."""
        enc, enc_len = self.encoder(feats, feat_len, train=train)  # [B, d, T']
        enc = jnp.transpose(enc, (0, 2, 1))
        k = self.cfg.frame_stacking
        B, T, d = enc.shape
        Ts = (T // k) * k
        stacked = enc[:, :Ts].reshape(B, Ts // k, k * d)
        emb = self.projector(stacked)
        return emb, enc_len // k

    def __call__(self, feats, feat_len, tokens, *, train=False):
        """Returns logits over [audio | text] positions: [B, Ta+St, V]."""
        audio_emb, audio_len = self.encode_audio(feats, feat_len, train=train)
        text_emb = self.llm.embed_tokens(tokens)
        x = jnp.concatenate([audio_emb.astype(text_emb.dtype), text_emb], axis=1)
        return self.llm(tokens=None, inputs_embeds=x, train=train)

    def prefill_and_decode(self, feats, feat_len, prompt, max_new: int, eos_id: int):
        """Greedy generation: jitted prefill over [audio|prompt] then a
        lax.scan decode loop with the stacked KV cache."""
        from nemo_tpu.models.llm.gpt import init_kv_caches

        audio_emb, _ = self.encode_audio(feats, feat_len)
        text_emb = self.llm.embed_tokens(prompt)
        x = jnp.concatenate([audio_emb.astype(text_emb.dtype), text_emb], axis=1)
        B, S = x.shape[:2]
        total = S + max_new
        caches = init_kv_caches(self.cfg.llm, B, total,
                                dtype=jnp.float32
                                if self.cfg.llm.compute_dtype == "float32"
                                else jnp.bfloat16)
        positions = jnp.arange(S)[None, :].repeat(B, 0)
        logits, caches = self.llm(
            tokens=None, inputs_embeds=x, positions=positions,
            kv_caches=caches, decode_index=0)
        last = jnp.argmax(logits[:, -1], -1)

        def step(carry, i):
            tok, caches = carry
            emb = self.llm.embed_tokens(tok[:, None])
            lg, caches = self.llm(
                tokens=None, inputs_embeds=emb,
                positions=(S + i) * jnp.ones((B, 1), jnp.int32),
                kv_caches=caches, decode_index=S + i)
            nxt = jnp.argmax(lg[:, -1], -1)
            return (nxt, caches), nxt

        (_, _), toks = jax.lax.scan(step, (last, caches), jnp.arange(max_new - 1))
        out = jnp.concatenate([last[None], toks], 0).T  # [B, max_new]
        return out


class SALM:
    """User-facing wrapper: init, loss, train-step pieces, generate."""

    def __init__(self, cfg: SALMConfig, init_params: bool = True, seed: int = 0):
        self.cfg = cfg
        self.mel_cfg = MelSpectrogramConfig(features=cfg.mel_features)
        self.net = SALMNet(cfg)
        if init_params:
            feats = jnp.zeros((1, cfg.mel_features, 32), jnp.float32)
            toks = jnp.zeros((1, 8), jnp.int32)
            self.variables = self.net.init(
                jax.random.PRNGKey(seed), feats, jnp.array([32]), toks, train=False)

    def loss_fn(self, params, batch_stats, batch, rng):
        """batch: audio [B,T], audio_len [B], tokens [B,S] (prompt+answer),
        loss_mask [B,S] (1 on answer tokens). Returns (loss, new_stats)."""
        feats, feat_len = mel_spectrogram(
            batch["audio"], batch["audio_len"], self.mel_cfg, training=False)
        (logits), upd = self.net.apply(
            {"params": params, "batch_stats": batch_stats},
            feats, feat_len, batch["tokens"], train=True,
            mutable=["batch_stats"], rngs={"dropout": rng})
        S = batch["tokens"].shape[1]
        text_logits = logits[:, -S:-1]  # predict tokens[1:]
        labels = batch["tokens"][:, 1:]
        mask = batch["loss_mask"][:, 1:]
        lp = jax.nn.log_softmax(text_logits.astype(jnp.float32))
        nll = -jnp.take_along_axis(lp, labels[..., None], -1)[..., 0]
        loss = jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)
        return loss, upd["batch_stats"]

    def generate(self, audio: np.ndarray, audio_len: np.ndarray,
                 prompt_ids: np.ndarray, max_new: int = 32, eos_id: int = 2):
        feats, feat_len = mel_spectrogram(
            jnp.asarray(audio), jnp.asarray(audio_len), self.mel_cfg, training=False)
        return self.net.apply(
            self.variables, feats, feat_len, jnp.asarray(prompt_ids), max_new, eos_id,
            method=SALMNet.prefill_and_decode)
