"""Magpie-style codec-LM TTS: autoregressive audio-token generation.

Reference parity: `nemo/collections/tts/models/magpietts.py` (MagpieTTS:
LLM-style decoder generating neural-codec frames conditioned on text,
decoded to waveform by AudioCodecModel). TPU-native composition of two
existing pieces: the native GPT stack as the token LM and the SEANet+RVQ
AudioCodecModel as the tokenizer/decoder.

Codec frames carry L residual levels; per the delay-pattern-free compact
formulation here, one LM step predicts the level-0 code and a small
per-level head refines the remaining residual levels from the LM hidden
state (parallel levels — the Vall-E NAR-style split, one AR pass total).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.models.llm.config import GPTConfig
from nemo_tpu.models.llm.gpt import GPTModel


@dataclasses.dataclass(frozen=True)
class MagpieConfig:
    text_vocab: int = 256
    codebook_size: int = 1024
    num_levels: int = 4
    llm: Optional[GPTConfig] = None

    @property
    def boa_id(self) -> int:  # begin-of-audio
        return self.text_vocab + self.codebook_size

    @property
    def joint_vocab(self) -> int:
        return self.text_vocab + self.codebook_size + 1


class MagpieNet(nn.Module):
    cfg: MagpieConfig

    def setup(self):
        c = self.cfg
        llm_cfg = c.llm or GPTConfig(
            num_layers=4, hidden_size=128, ffn_hidden_size=256,
            num_attention_heads=4, vocab_size=c.joint_vocab, seq_length=1024,
            compute_dtype="float32")
        llm_cfg = dataclasses.replace(llm_cfg, vocab_size=c.joint_vocab)
        self.llm = GPTModel(llm_cfg, name="llm")
        # NAR residual-level heads off the LM hidden state
        self.level_heads = [
            nn.Dense(c.codebook_size, name=f"level_head{l}")
            for l in range(1, c.num_levels)
        ]

    def pack(self, text_tokens, codes_l0):
        boa = jnp.full((text_tokens.shape[0], 1), self.cfg.boa_id, jnp.int32)
        audio = codes_l0.astype(jnp.int32) + self.cfg.text_vocab
        return jnp.concatenate([text_tokens, boa, audio], axis=1)

    def __call__(self, text_tokens, codes, *, train: bool = False):
        """codes [B, L, F] → (l0 next-token logits over the seq,
        residual-level logits [L-1, B, F, K])."""
        seq = self.pack(text_tokens, codes[:, 0])
        logits = self.llm(seq, train=train)
        F = codes.shape[2]
        # hidden-state proxy for NAR heads: reuse the audio-span logits'
        # pre-softmax features by projecting the one-hot-free logits is
        # lossy; instead re-embed the audio span through the LM embedding
        emb = self.llm.embed_tokens(seq[:, -F:])
        lvl_logits = jnp.stack(
            [head(emb) for head in self.level_heads]) if self.level_heads \
            else jnp.zeros((0,))
        return logits, lvl_logits

    def loss(self, text_tokens, codes, *, train: bool = False):
        c = self.cfg
        seq = self.pack(text_tokens, codes[:, 0])
        logits, lvl_logits = self(text_tokens, codes, train=train)
        # AR loss over the audio span only (predict audio tokens + levels)
        F = codes.shape[2]
        S = seq.shape[1]
        lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        tgt = seq[:, 1:]
        span = jnp.arange(S - 1) >= (S - 1 - F)  # audio positions
        nll = -jnp.take_along_axis(lp, tgt[..., None], -1)[..., 0]
        ar_loss = jnp.sum(nll * span[None]) / jnp.maximum(
            jnp.sum(span) * seq.shape[0], 1)
        # NAR residual levels
        nar_loss = 0.0
        for l in range(1, c.num_levels):
            ll = jax.nn.log_softmax(
                lvl_logits[l - 1].astype(jnp.float32), -1)
            nar_loss = nar_loss - jnp.mean(
                jnp.take_along_axis(ll, codes[:, l][..., None], -1))
        return ar_loss + nar_loss / max(c.num_levels - 1, 1)


class MagpieTTSModel:
    """text → codec codes → waveform (needs a trained AudioCodecModel)."""

    def __init__(self, cfg: Optional[ConfigDict] = None, codec=None,
                 seed: int = 0):
        cfg = ConfigDict(cfg or {})
        self.mcfg = MagpieConfig(
            text_vocab=int(cfg.get("text_vocab", 256)),
            codebook_size=int(cfg.get("codebook_size", 1024)),
            num_levels=int(cfg.get("num_levels", 4)),
        )
        self.net = MagpieNet(self.mcfg)
        self.codec = codec
        toks = jnp.zeros((1, 8), jnp.int32)
        codes = jnp.zeros((1, self.mcfg.num_levels, 8), jnp.int32)
        self.variables = self.net.init(jax.random.PRNGKey(seed), toks, codes)

    def train_loss(self, variables, text_tokens, codes):
        return self.net.apply(variables, text_tokens, codes,
                              method=MagpieNet.loss)

    def generate_codes(self, text_tokens, n_frames: int, rng,
                       temperature: float = 0.9) -> np.ndarray:
        """AR level-0 sampling + parallel residual levels → [B, L, F]."""
        c = self.mcfg
        seq = jnp.concatenate(
            [text_tokens,
             jnp.full((text_tokens.shape[0], 1), c.boa_id, jnp.int32)], 1)
        lo, hi = c.text_vocab, c.text_vocab + c.codebook_size
        for _ in range(n_frames):
            logits = self.net.apply(
                self.variables, seq,
                method=lambda m, s: m.llm(s))[:, -1]
            logits = logits.at[:, :lo].set(-1e30).at[:, hi:].set(-1e30)
            rng, sub = jax.random.split(rng)
            nxt = jax.random.categorical(sub, logits / temperature, -1)
            seq = jnp.concatenate([seq, nxt[:, None].astype(jnp.int32)], 1)
        l0 = seq[:, -n_frames:] - lo
        # residual levels from the embedding heads
        def residuals(m, seq_in):
            emb = m.llm.embed_tokens(seq_in[:, -n_frames:])
            return [jnp.argmax(h(emb), -1) for h in m.level_heads]
        lvls = self.net.apply(self.variables, seq, method=residuals)
        codes = jnp.stack([l0] + list(lvls), axis=1)
        return np.asarray(codes)

    def synthesize(self, text_tokens, n_frames: int,
                   rng: Optional[jax.Array] = None) -> np.ndarray:
        codes = self.generate_codes(
            text_tokens, n_frames, rng or jax.random.PRNGKey(0))
        if self.codec is None:
            raise ValueError("attach an AudioCodecModel to decode waveforms")
        return np.asarray(self.codec.decode(jnp.asarray(codes)))
