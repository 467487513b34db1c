"""RadTTS: normalizing-flow acoustic model (text → mel by exact likelihood).

Reference parity: `nemo/collections/tts/models/radtts.py` (RadTTS: mel
frames modeled by a conditional normalizing flow given aligned text
context; alignment learned with the shared Aligner machinery; deterministic
attribute (duration) predictor for inference).

Compact TPU-native formulation reusing the in-repo pieces:
- alignment: AlignmentEncoder + Viterbi durations (modules/aligner.py),
  trained jointly with forward-sum (the reference's aligner loss);
- flow: K steps of [channel flip + text-conditioned affine coupling]
  over mel frames (the VITS WN stack), exact NLL with logdets;
- duration predictor for inference-time length regulation
  (modules/fastpitch.TemporalPredictor).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.core.model import Model
from nemo_tpu.data.text_tokenizers import EnglishCharsTTSTokenizer
from nemo_tpu.models.tts.modules.aligner import (
    AlignmentEncoder,
    forward_sum_loss,
    viterbi_durations,
)
from nemo_tpu.models.tts.modules.fastpitch import (
    TemporalPredictor,
    regulate_length,
)
from nemo_tpu.models.tts.modules.vits import WN


class CondAffineCoupling(nn.Module):
    """Affine coupling over mel channels, conditioned on aligned text."""

    channels: int
    hidden: int = 96

    @nn.compact
    def __call__(self, x, cond, mask, reverse: bool = False):
        half = self.channels // 2
        xa, xb = x[..., :half], x[..., half:]
        m = mask[..., None].astype(x.dtype)
        h = jnp.concatenate([xa, cond], axis=-1) * m
        h = nn.Conv(self.hidden, (1,), name="pre")(h)
        h = WN(self.hidden, name="wn")(h, m)
        st = nn.Conv(2 * (self.channels - half), (1,),
                     kernel_init=nn.initializers.zeros, name="post")(h)
        log_s, t = jnp.split(st, 2, axis=-1)
        log_s = jnp.clip(log_s, -7.0, 7.0) * m
        t = t * m
        if reverse:
            return jnp.concatenate([xa, (xb - t) * jnp.exp(-log_s)], -1), None
        xb = xb * jnp.exp(log_s) + t
        return (jnp.concatenate([xa, xb], -1),
                jnp.sum(log_s, axis=(1, 2)))


class RadTTSNet(nn.Module):
    n_symbols: int
    n_mels: int = 80
    d_text: int = 192
    n_flows: int = 6
    hidden: int = 96
    max_mel_len: int = 512

    def setup(self):
        self.embed = nn.Embed(self.n_symbols, self.d_text)
        self.aligner = AlignmentEncoder(d_att=self.d_text // 2)
        self.dur_pred = TemporalPredictor(filter_size=self.d_text)
        self.couplings = [CondAffineCoupling(self.n_mels, self.hidden,
                                             name=f"ac{i}")
                          for i in range(self.n_flows)]

    def _align(self, emb, mels_t, text_mask, mel_mask):
        log_attn = self.aligner(emb, mels_t, text_mask, mel_mask)
        text_len = jnp.sum(text_mask, -1).astype(jnp.int32)
        mel_len = jnp.sum(mel_mask, -1).astype(jnp.int32)
        dur = jax.lax.stop_gradient(
            viterbi_durations(log_attn, text_len, mel_len))
        return log_attn, dur

    def flow_forward(self, mels_t, cond, mel_mask):
        x = mels_t
        logdet = jnp.zeros((x.shape[0],))
        for ac in self.couplings:
            x = jnp.flip(x, axis=-1)
            x, ld = ac(x, cond, mel_mask)
            logdet = logdet + ld
        return x, logdet

    def flow_inverse(self, z, cond, mel_mask):
        x = z
        for ac in reversed(self.couplings):
            x, _ = ac(x, cond, mel_mask, reverse=True)
            x = jnp.flip(x, axis=-1)
        return x

    def __call__(self, tokens, token_len, mels, mel_len, *, train=False):
        """Training: NLL of mel frames + aligner + duration losses."""
        B, _, T = mels.shape
        U = tokens.shape[1]
        text_mask = jnp.arange(U)[None] < token_len[:, None]
        mel_mask = jnp.arange(T)[None] < mel_len[:, None]
        emb = self.embed(tokens)
        mels_t = jnp.transpose(mels, (0, 2, 1))  # [B, T, n_mels]

        log_attn, dur = self._align(emb, mels_t, text_mask, mel_mask)
        align_loss = jnp.mean(forward_sum_loss(
            log_attn, jnp.sum(text_mask, -1).astype(jnp.int32),
            jnp.sum(mel_mask, -1).astype(jnp.int32)))

        cond, _ = regulate_length(dur, emb, T)  # aligned text context
        z, logdet = self.flow_forward(mels_t, cond, mel_mask)
        n = jnp.maximum(jnp.sum(mel_mask), 1) * self.n_mels
        z = z * mel_mask[..., None]
        nll = (0.5 * jnp.sum(z ** 2) - jnp.sum(logdet)) / n

        log_dur = self.dur_pred(emb, text_mask, train=train)
        dur_tgt = jnp.log(jnp.maximum(dur.astype(jnp.float32), 1e-2))
        dur_loss = jnp.sum(jnp.where(text_mask,
                                     (log_dur - dur_tgt) ** 2, 0.0)) \
            / jnp.maximum(jnp.sum(text_mask), 1)
        return {"nll": nll, "align": align_loss, "dur": dur_loss}

    def infer(self, tokens, token_len, rng, sigma: float = 0.7,
              pace: float = 1.0):
        U = tokens.shape[1]
        text_mask = jnp.arange(U)[None] < token_len[:, None]
        emb = self.embed(tokens)
        log_dur = self.dur_pred(emb, text_mask, train=False)
        dur = jnp.round(jnp.exp(log_dur) / pace).astype(jnp.int32)
        dur = jnp.where(text_mask, jnp.maximum(dur, 1), 0)
        cond, mel_len = regulate_length(dur, emb, self.max_mel_len)
        mel_mask = jnp.arange(self.max_mel_len)[None] < mel_len[:, None]
        z = sigma * jax.random.normal(
            rng, (tokens.shape[0], self.max_mel_len, self.n_mels))
        mels_t = self.flow_inverse(z * mel_mask[..., None], cond, mel_mask)
        return jnp.transpose(mels_t, (0, 2, 1)), mel_len


class RadTTSModel(Model):
    def __init__(self, cfg: Optional[ConfigDict] = None, init_params: bool = True):
        cfg = ConfigDict(cfg or {})
        super().__init__(cfg)
        self.tokenizer = EnglishCharsTTSTokenizer()
        self.net = RadTTSNet(
            n_symbols=int(cfg.get("n_symbols", self.tokenizer.vocab_size)),
            n_mels=int(cfg.get("n_mels", 80)),
            d_text=int(cfg.get("d_text", 192)),
            n_flows=int(cfg.get("n_flows", 6)),
            hidden=int(cfg.get("hidden", 96)),
            max_mel_len=int(cfg.get("max_mel_len", 512)),
        )
        if init_params:
            toks = jnp.zeros((1, 8), jnp.int32)
            mels = jnp.zeros((1, self.net.n_mels, 16), jnp.float32)
            self.variables = self.net.init(
                jax.random.PRNGKey(0), toks, jnp.asarray([8]), mels,
                jnp.asarray([16]))
        self._jit_infer = jax.jit(
            lambda v, t, tl, rng: self.net.apply(
                v, t, tl, rng, method=RadTTSNet.infer))

    def parse(self, text: str) -> jnp.ndarray:
        ids = self.tokenizer.text_to_ids(text)
        return jnp.asarray(np.array(ids, np.int32))[None]

    def loss(self, variables, tokens, token_len, mels, mel_len, rng=None):
        parts = self.net.apply(
            variables, tokens, token_len, mels, mel_len, train=True,
            rngs={"dropout": rng} if rng is not None else None)
        total = parts["nll"] + parts["align"] + 0.1 * parts["dur"]
        return total, parts

    def generate_spectrogram(self, tokens: jnp.ndarray) -> np.ndarray:
        token_len = jnp.full((tokens.shape[0],), tokens.shape[1], jnp.int32)
        mel, mel_len = self._jit_infer(self.variables, tokens, token_len,
                                       jax.random.PRNGKey(0))
        n = int(np.asarray(mel_len).max())
        return np.asarray(mel[:, :, :n])
