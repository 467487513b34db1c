"""FastPitch spectrogram-generator model.

Reference parity: FastPitchModel (`nemo/collections/tts/models/fastpitch.py:82`):
`parse()` (:270, text → tokens), `generate_spectrogram()` (:341), training
with duration/pitch supervision (aligner-based durations to come).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.core.model import Model
from nemo_tpu.data.text_tokenizers import EnglishCharsTTSTokenizer
from nemo_tpu.models.tts.modules.fastpitch import FastPitchModule


class FastPitchModel(Model):
    def __init__(self, cfg: Optional[ConfigDict] = None, init_params: bool = True):
        cfg = ConfigDict(cfg or {})
        super().__init__(cfg)
        self.tokenizer = EnglishCharsTTSTokenizer()
        self.sample_rate = int(cfg.get("sample_rate", 22050))
        self.net = FastPitchModule(
            n_symbols=int(cfg.get("n_symbols", self.tokenizer.vocab_size)),
            n_mels=int(cfg.get("n_mels", 80)),
            d_model=int(cfg.get("d_model", 384)),
            n_heads=int(cfg.get("n_heads", 1)),
            d_ff=int(cfg.get("d_ff", 1536)),
            enc_layers=int(cfg.get("enc_layers", 6)),
            dec_layers=int(cfg.get("dec_layers", 6)),
            max_mel_len=int(cfg.get("max_mel_len", 2048)),
        )
        if init_params:
            tokens = jnp.zeros((1, 16), jnp.int32)
            self.variables = self.net.init(
                jax.random.PRNGKey(0), tokens, jnp.array([16], jnp.int32)
            )
        self._jit_gen = jax.jit(
            lambda v, t, tl, pace: self.net.apply(v, t, tl, pace=pace, train=False),
            static_argnames=("pace",),
        )

    def parse(self, text: str) -> jnp.ndarray:
        """Text → token ids [1, U] (reference fastpitch.py:270)."""
        ids = self.tokenizer.text_to_ids(text)
        return jnp.asarray(np.array(ids, np.int32))[None]

    def generate_spectrogram(self, tokens: jnp.ndarray, pace: float = 1.0):
        """tokens [B, U] → mel [B, n_mels, T_valid] (reference :341)."""
        token_len = jnp.full((tokens.shape[0],), tokens.shape[1], jnp.int32)
        out = self._jit_gen(self.variables, tokens, token_len, pace)
        mel_len = int(np.asarray(out["mel_len"]).max())
        return out["mel"][:, :, :mel_len]

    # -- training loss ------------------------------------------------------
    def loss(self, out, mel_target, mel_len, dur_target, pitch_target, token_mask):
        """FastPitch multi-task loss: mel MSE + log-duration MSE + pitch MSE
        (reference losses in tts/losses/fastpitchloss.py)."""
        T = out["mel"].shape[2]
        mel_mask = (jnp.arange(T)[None, :] < mel_len[:, None])[:, None, :]
        mt = mel_target[:, :, :T]
        mel_loss = jnp.sum(jnp.square((out["mel"] - mt) * mel_mask)) / jnp.maximum(
            jnp.sum(mel_mask) * out["mel"].shape[1], 1.0
        ) * out["mel"].shape[1]
        log_dur_t = jnp.log(dur_target.astype(jnp.float32) + 1.0)
        dur_loss = jnp.sum(jnp.square(out["log_dur_pred"] - log_dur_t) * token_mask) / jnp.maximum(jnp.sum(token_mask), 1.0)
        pitch_loss = jnp.sum(jnp.square(out["pitch_pred"] - pitch_target) * token_mask) / jnp.maximum(jnp.sum(token_mask), 1.0)
        return mel_loss + 0.1 * dur_loss + 0.1 * pitch_loss
