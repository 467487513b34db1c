"""Standalone speech-text Aligner model.

Reference parity: `nemo/collections/tts/models/aligner.py` (AlignerModel):
text embedding + AlignmentEncoder trained with ForwardSumLoss + BinLoss
(bin loss ramped in after `bin_loss_start_ratio` of training), beta-binomial
attention prior folded into the soft attention, and hard durations via
Viterbi for downstream FastPitch training.

TPU-native: the whole train step (prior construction included) is one jit;
losses are `lax.scan` DPs (see modules/aligner.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.core.model import Model
from nemo_tpu.data.text_tokenizers import EnglishCharsTTSTokenizer
from nemo_tpu.models.tts.modules.aligner import (
    AlignmentEncoder,
    beta_binomial_prior,
    binarization_loss,
    forward_sum_loss,
    viterbi_durations,
)

import flax.linen as nn


class _AlignerNet(nn.Module):
    n_symbols: int
    n_mels: int = 80
    d_text: int = 384
    d_att: int = 128
    temperature: float = 0.0005

    @nn.compact
    def __call__(self, tokens, mels, text_mask, mel_mask):
        emb = nn.Embed(self.n_symbols, self.d_text, name="embed")(tokens)
        return AlignmentEncoder(self.d_att, self.temperature, name="alignment_encoder")(
            emb, mels, text_mask, mel_mask
        )


class AlignerModel(Model):
    """Trainable text↔mel aligner; `get_durations()` is its product."""

    def __init__(self, cfg: Optional[ConfigDict] = None, init_params: bool = True):
        cfg = ConfigDict(cfg or {})
        super().__init__(cfg)
        self.tokenizer = EnglishCharsTTSTokenizer()
        self.bin_loss_scale = float(cfg.get("bin_loss_scale", 1.0))
        self.bin_loss_start = float(cfg.get("bin_loss_start_ratio", 0.2))
        self.total_steps = int(cfg.get("total_steps", 1000))
        self.prior_scaling = float(cfg.get("prior_scaling_factor", 1.0))
        self.net = _AlignerNet(
            n_symbols=int(cfg.get("n_symbols", self.tokenizer.vocab_size)),
            n_mels=int(cfg.get("n_mels", 80)),
            d_text=int(cfg.get("d_text", 384)),
            d_att=int(cfg.get("d_att", 128)),
        )
        if init_params:
            self.variables = self.net.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 8), jnp.int32), jnp.zeros((1, 16, self.net.n_mels)),
                jnp.ones((1, 8), bool), jnp.ones((1, 16), bool),
            )
        self._jit_align = jax.jit(self._align_fn)

    # -- losses --------------------------------------------------------------

    def _log_attn(self, variables, tokens, token_len, mels, mel_len):
        U, T = tokens.shape[1], mels.shape[1]
        text_mask = jnp.arange(U)[None] < token_len[:, None]
        mel_mask = jnp.arange(T)[None] < mel_len[:, None]
        logp = self.net.apply(variables, tokens, mels, text_mask, mel_mask)
        prior = beta_binomial_prior(token_len, mel_len, U, T, self.prior_scaling)
        # prior is applied in probability space then renormalized (reference
        # adds attn_prior before softmax; equivalent in log space):
        combined = jax.nn.log_softmax(logp + prior, axis=-1)
        return jnp.where(text_mask[:, None, :], combined, -1e30)

    def loss(self, variables, tokens, token_len, mels, mel_len, step: jnp.ndarray):
        log_attn = self._log_attn(variables, tokens, token_len, mels, mel_len)
        fs = jnp.mean(forward_sum_loss(log_attn, token_len, mel_len))
        dur = jax.lax.stop_gradient(viterbi_durations(log_attn, token_len, mel_len))
        bl = binarization_loss(log_attn, dur, mel_len)
        # ramp the bin loss in after bin_loss_start of training (reference
        # aligner.py `add_bin_loss` warmup)
        frac = step.astype(jnp.float32) / max(self.total_steps, 1)
        w = jnp.where(frac >= self.bin_loss_start,
                      jnp.minimum((frac - self.bin_loss_start) /
                                  max(1.0 - self.bin_loss_start, 1e-6), 1.0),
                      0.0)
        return fs + self.bin_loss_scale * w * bl, {"forward_sum": fs, "bin": bl}

    # -- training ------------------------------------------------------------

    def make_train_step(self, lr: float = 1e-3):
        tx = optax.adamw(lr)
        opt_state = tx.init(self.variables)

        @jax.jit
        def step_fn(variables, opt_state, tokens, token_len, mels, mel_len, step):
            def lf(v):
                return self.loss(v, tokens, token_len, mels, mel_len, step)
            (total, parts), grads = jax.value_and_grad(lf, has_aux=True)(variables)
            updates, opt_state = tx.update(grads, opt_state, variables)
            variables = optax.apply_updates(variables, updates)
            return variables, opt_state, total, parts

        return step_fn, opt_state

    # -- inference ------------------------------------------------------------

    def _align_fn(self, variables, tokens, token_len, mels, mel_len):
        log_attn = self._log_attn(variables, tokens, token_len, mels, mel_len)
        return viterbi_durations(log_attn, token_len, mel_len)

    def get_durations(self, tokens, token_len, mels, mel_len):
        """[B, U] int durations summing to mel_len (reference aligner.py
        `get_durations`)."""
        return self._jit_align(self.variables, tokens, jnp.asarray(token_len),
                               mels, jnp.asarray(mel_len))
