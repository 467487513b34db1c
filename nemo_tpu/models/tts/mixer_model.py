"""Mixer-TTS: MLP-Mixer spectrogram generator.

Reference parity: `nemo/collections/tts/models/mixer_tts.py` (MixerTTS:
attention-free token-mixing encoder/decoder from MLP-Mixer blocks, with
FastPitch-style duration/pitch predictors and length regulation).

TPU-native: time-mixing is a dense matmul over the (static, padded) time
axis with padding masked — MXU-friendly and compile-once; shares
TemporalPredictor and the searchsorted length regulator with FastPitch.
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
from nemo_tpu.models.tts.modules.fastpitch import (
    TemporalPredictor,
    regulate_length,
)


class MixerBlock(nn.Module):
    """time-mix (over the padded static T) + channel-mix, both pre-LN."""

    d_model: int
    max_len: int
    expansion: int = 4

    @nn.compact
    def __call__(self, x, mask):
        # token (time) mixing — transpose, MLP over time, transpose back
        h = nn.LayerNorm(name="ln1")(x)
        h = jnp.where(mask[..., None], h, 0.0)
        h = jnp.swapaxes(h, 1, 2)  # [B, D, T]
        h = nn.Dense(self.max_len, name="time_fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(x.shape[1], name="time_fc2")(h)
        h = jnp.swapaxes(h, 1, 2)
        x = x + jnp.where(mask[..., None], h, 0.0)
        # channel mixing
        h = nn.LayerNorm(name="ln2")(x)
        h = nn.Dense(self.d_model * self.expansion, name="ch_fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.d_model, name="ch_fc2")(h)
        return x + jnp.where(mask[..., None], h, 0.0)


class MixerTTSNet(nn.Module):
    n_symbols: int
    n_mels: int = 80
    d_model: int = 192
    enc_layers: int = 4
    dec_layers: int = 4
    max_text_len: int = 128
    max_mel_len: int = 512

    @nn.compact
    def __call__(self, tokens, token_len, *, durations=None, pitch=None,
                 pace: float = 1.0, train: bool = False):
        U = tokens.shape[1]
        # time-mixing needs one static length: pad to max_text_len
        Upad = self.max_text_len
        tokens = jnp.pad(tokens, ((0, 0), (0, Upad - U)))
        tmask = jnp.arange(Upad)[None] < token_len[:, None]
        x = nn.Embed(self.n_symbols, self.d_model, name="embed")(tokens)
        for i in range(self.enc_layers):
            x = MixerBlock(self.d_model, self.max_text_len,
                           name=f"enc{i}")(x, tmask)

        log_dur = TemporalPredictor(filter_size=self.d_model,
                                    name="dur_pred")(x, tmask, train=train)
        pitch_pred = TemporalPredictor(filter_size=self.d_model,
                                       name="pitch_pred")(x, tmask, train=train)
        if pitch is not None:
            pitch = jnp.pad(pitch, ((0, 0), (0, Upad - U)))
        use_pitch = pitch if pitch is not None else pitch_pred
        x = x + nn.Dense(self.d_model, name="pitch_emb")(use_pitch[..., None])

        if durations is None:
            durations = jnp.round(
                jnp.exp(log_dur) / pace).astype(jnp.int32)
            durations = jnp.where(tmask, jnp.maximum(durations, 1), 0)
        else:
            durations = jnp.pad(durations, ((0, 0), (0, Upad - U)))
        mel_in, mel_len = regulate_length(durations, x, self.max_mel_len)
        mmask = jnp.arange(self.max_mel_len)[None] < mel_len[:, None]
        h = mel_in
        for i in range(self.dec_layers):
            h = MixerBlock(self.d_model, self.max_mel_len,
                           name=f"dec{i}")(h, mmask)
        mel = nn.Dense(self.n_mels, name="mel_head")(h)
        mel = jnp.where(mmask[..., None], mel, 0.0)
        return {"mel": jnp.transpose(mel, (0, 2, 1)), "mel_len": mel_len,
                "log_dur": log_dur[:, :U], "pitch_pred": pitch_pred[:, :U]}


class MixerTTSModel(Model):
    def __init__(self, cfg: Optional[ConfigDict] = None, init_params: bool = True):
        cfg = ConfigDict(cfg or {})
        super().__init__(cfg)
        self.tokenizer = EnglishCharsTTSTokenizer()
        self.net = MixerTTSNet(
            n_symbols=int(cfg.get("n_symbols", self.tokenizer.vocab_size)),
            n_mels=int(cfg.get("n_mels", 80)),
            d_model=int(cfg.get("d_model", 192)),
            enc_layers=int(cfg.get("enc_layers", 4)),
            dec_layers=int(cfg.get("dec_layers", 4)),
            max_text_len=int(cfg.get("max_text_len", 128)),
            max_mel_len=int(cfg.get("max_mel_len", 512)),
        )
        if init_params:
            toks = jnp.zeros((1, 8), jnp.int32)
            self.variables = self.net.init(
                jax.random.PRNGKey(0), toks, jnp.asarray([8]))
        self._jit_gen = jax.jit(
            lambda v, t, tl, pace: self.net.apply(v, t, tl, pace=pace),
            static_argnames=("pace",))

    def parse(self, text: str) -> jnp.ndarray:
        ids = self.tokenizer.text_to_ids(text)
        return jnp.asarray(np.array(ids, np.int32))[None]

    def loss(self, variables, tokens, token_len, mels, mel_len, durations,
             pitch, rng=None):
        """Supervised FastPitch-style loss: mel MSE + log-duration MSE +
        pitch MSE (reference mixer_tts.py training_step)."""
        out = self.net.apply(variables, tokens, token_len,
                             durations=durations, pitch=pitch, train=True,
                             rngs={"dropout": rng} if rng is not None else None)
        T = mels.shape[2]
        pred = out["mel"][:, :, :T]
        fmask = (jnp.arange(T)[None] < mel_len[:, None])[:, None, :]
        denom = jnp.maximum(jnp.sum(fmask), 1) * self.net.n_mels
        mel_loss = jnp.sum(jnp.where(fmask, (pred - mels) ** 2, 0.0)) / denom
        tmask = jnp.arange(tokens.shape[1])[None] < token_len[:, None]
        dur_tgt = jnp.log(jnp.maximum(durations.astype(jnp.float32), 1e-2))
        dur_loss = jnp.sum(jnp.where(tmask, (out["log_dur"] - dur_tgt) ** 2,
                                     0.0)) / jnp.maximum(jnp.sum(tmask), 1)
        pitch_loss = jnp.sum(jnp.where(tmask, (out["pitch_pred"] - pitch) ** 2,
                                       0.0)) / jnp.maximum(jnp.sum(tmask), 1)
        return mel_loss + 0.1 * dur_loss + 0.1 * pitch_loss, {
            "mel": mel_loss, "dur": dur_loss, "pitch": pitch_loss}

    def generate_spectrogram(self, tokens: jnp.ndarray,
                             pace: float = 1.0) -> np.ndarray:
        token_len = jnp.full((tokens.shape[0],), tokens.shape[1], jnp.int32)
        out = self._jit_gen(self.variables, tokens, token_len, pace)
        n = int(np.asarray(out["mel_len"]).max())
        return np.asarray(out["mel"][:, :, :n])
