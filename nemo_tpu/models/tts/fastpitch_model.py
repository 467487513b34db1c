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
            min_token_duration=int(cfg.get("min_token_duration", 0)),
            max_token_duration=int(cfg.get("max_token_duration", 75)),
            norm_style=str(cfg.get("norm_style", "pre")),
            d_head=(int(cfg["d_head"]) if cfg.get("d_head") else None),
            pos_concat=bool(cfg.get("pos_concat", False)),
            predictor_filter_size=int(cfg.get("predictor_filter_size", 256)),
            predictor_kernel_size=int(cfg.get("predictor_kernel_size", 3)),
            predictor_n_layers=int(cfg.get("predictor_n_layers", 2)),
        )
        if init_params:
            tokens = jnp.zeros((1, 16), jnp.int32)
            self.variables = self.net.init(
                jax.random.PRNGKey(0), tokens, jnp.array([16], jnp.int32)
            )
        # pace is a traced scalar (it only scales durations), so changing the
        # pace does NOT recompile — one program per (B, U) shape.
        self._jit_gen = jax.jit(
            lambda v, t, tl, pace: self.net.apply(v, t, tl, pace=pace, train=False),
        )
        # Two-phase bucketed inference: (1) encoder + duration predictor,
        # (2) fetch tiny mel_len on host, (3) decoder at a static bucketed
        # length ≥ the real mel length. The decoder (the FLOPs-dominant half)
        # then runs over ~the real length instead of the full max_mel_len pad.
        self._jit_enc = jax.jit(
            lambda v, t, tl, pace: self.net.apply(
                v, t, tl, pace=pace, train=False, stage="encode"
            ),
        )
        self._jit_dec = jax.jit(
            lambda v, t, tl, enc, dur, bucket: self.net.apply(
                v, t, tl, train=False, stage="decode", enc=enc, dur=dur,
                mel_max_len=bucket,
            ),
            static_argnames=("bucket",),
        )

    def parse(self, text: str) -> jnp.ndarray:
        """Text → token ids [1, U] (reference fastpitch.py:270)."""
        ids = self.tokenizer.text_to_ids(text)
        return jnp.asarray(np.array(ids, np.int32))[None]

    def generate_spectrogram(self, tokens: jnp.ndarray, pace: float = 1.0):
        """tokens [B, U] → mel [B, n_mels, T_valid] (reference :341).

        Bucketed two-phase synthesis: run the encoder, fetch the (tiny)
        mel_len, then run the decoder at the smallest power-of-2 bucket that
        fits — static shapes for XLA, ~real-length decoder compute.
        """
        token_len = jnp.full((tokens.shape[0],), tokens.shape[1], jnp.int32)
        e = self._jit_enc(self.variables, tokens, token_len, pace)
        mel_len = int(np.asarray(e["mel_len"]).max())
        if mel_len == 0:
            return jnp.zeros((tokens.shape[0], self.net.n_mels, 0), jnp.float32)
        # 128-granular buckets: the decoder (the FLOPs-dominant half) runs at
        # ≤127 frames of padding instead of up-to-2× with power-of-2 buckets
        bucket = min(-(-mel_len // 128) * 128, self.net.max_mel_len)
        out = self._jit_dec(self.variables, tokens, token_len, e["enc"],
                            e["durations"], bucket)
        return out["mel"][:, :, :min(mel_len, bucket)]

    def fit_synthetic(self, steps: int = 60, batch: int = 8, seq: int = 64,
                      seed: int = 0, lr: float = 2e-3) -> float:
        """Briefly train on synthetic (tokens, durations, pitch, mel) batches.

        Calibrates the duration/pitch predictors so inference emits realistic
        positive durations (~4-8 frames/token, like a trained LJSpeech model);
        used by tests and bench.py so synthesis is measured on a trained-model
        duration profile rather than a fresh init (reference models train on
        real data; `tts/models/fastpitch.py:341 generate_spectrogram` assumes
        trained weights). Returns the final loss.
        """
        import optax

        opt = optax.adam(lr)
        n_mels = self.net.n_mels
        vocab = self.net.n_symbols
        T = self.net.max_mel_len
        token_len = jnp.full((batch,), seq, jnp.int32)
        tok_mask = jnp.ones((batch, seq), jnp.float32)

        def loss_fn(p, tokens, dur, pitch, mel, mel_len, key):
            out = self.net.apply(p, tokens, token_len, durations=dur,
                                 pitch=pitch, train=True, rngs={"dropout": key})
            return self.loss(out, mel, mel_len, dur, pitch, tok_mask)

        def one_step(carry, key):
            p, s = carry
            kt, kd, km, kp, kdrop = jax.random.split(key, 5)
            # synthetic batch generated ON DEVICE (a host loop uploading
            # [B, n_mels, T] mel targets per step costs minutes through the
            # serving relay; the whole fit is ONE dispatch)
            tokens = jax.random.randint(kt, (batch, seq), 1, vocab)
            dur = jax.random.randint(kd, (batch, seq), 3, 10)
            mel = jax.random.normal(km, (batch, n_mels, T), jnp.float32)
            pitch = jax.random.normal(kp, (batch, seq), jnp.float32)
            l, g = jax.value_and_grad(loss_fn)(
                p, tokens, dur, pitch, mel, jnp.sum(dur, axis=1), kdrop)
            updates, s = opt.update(g, s, p)
            return (optax.apply_updates(p, updates), s), l

        @jax.jit
        def fit(p, key):
            (p, _), losses = jax.lax.scan(
                one_step, (p, opt.init(p)), jax.random.split(key, steps))
            return p, losses[-1]

        self.variables, loss = fit(self.variables, jax.random.PRNGKey(seed))
        return float(loss)

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
