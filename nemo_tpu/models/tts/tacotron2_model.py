"""Tacotron 2 model wrapper.

Reference parity: `nemo/collections/tts/models/tacotron2.py`
(Tacotron2Model): parse() text → tokens, training_step loss = MSE(pre) +
MSE(post) + BCE(gate) with padded-frame masking, generate_spectrogram().
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
from nemo_tpu.models.tts.modules.tacotron2 import (
    Postnet,
    Tacotron2Decoder,
    Tacotron2Encoder,
)


class _Tacotron2Net(nn.Module):
    n_symbols: int
    n_mels: int = 80
    d_model: int = 512

    def setup(self):
        self.encoder = Tacotron2Encoder(self.n_symbols, self.d_model)
        self.decoder = Tacotron2Decoder(n_mels=self.n_mels, d_enc=self.d_model)
        self.postnet = Postnet(n_mels=self.n_mels)

    def __call__(self, tokens, token_len, mels, rng, *, train: bool = False):
        memory, mask = self.encoder(tokens, token_len, train=train)
        pre, gates, aligns = self.decoder(memory, mask, mels, rng)
        post = self.postnet(pre, train=train)
        return pre, post, gates, aligns

    def infer(self, tokens, token_len, rng, max_steps: int = 500):
        memory, mask = self.encoder(tokens, token_len, train=False)
        pre, gates, mel_len = self.decoder.infer(memory, mask, rng,
                                                 max_steps=max_steps)
        post = self.postnet(pre, train=False)
        return post, mel_len


class Tacotron2Model(Model):
    def __init__(self, cfg: Optional[ConfigDict] = None, init_params: bool = True):
        cfg = ConfigDict(cfg or {})
        super().__init__(cfg)
        self.tokenizer = EnglishCharsTTSTokenizer()
        self.n_mels = int(cfg.get("n_mels", 80))
        self.sample_rate = int(cfg.get("sample_rate", 22050))
        self.net = _Tacotron2Net(
            n_symbols=int(cfg.get("n_symbols", self.tokenizer.vocab_size)),
            n_mels=self.n_mels,
            d_model=int(cfg.get("d_model", 512)),
        )
        if init_params:
            toks = jnp.zeros((1, 8), jnp.int32)
            mels = jnp.zeros((1, self.n_mels, 12), jnp.float32)
            self.variables = self.net.init(
                jax.random.PRNGKey(0), toks, jnp.asarray([8]), mels,
                jax.random.PRNGKey(1))
        self._jit_infer = jax.jit(
            lambda v, t, tl, rng, steps: self.net.apply(
                v, t, tl, rng, max_steps=steps, method=_Tacotron2Net.infer),
            static_argnames=("steps",),
        )

    def parse(self, text: str) -> jnp.ndarray:
        ids = self.tokenizer.text_to_ids(text)
        return jnp.asarray(np.array(ids, np.int32))[None]

    # -- loss (reference tacotron2.py Tacotron2Loss) -------------------------
    def loss(self, variables, tokens, token_len, mels, mel_len, rng,
             train: bool = True):
        outs = self.net.apply(
            variables, tokens, token_len, mels, rng, train=train,
            mutable=["batch_stats"] if train else False)
        (pre, post, gates, _), mutated = outs if train else (outs, {})
        T = mels.shape[2]
        fmask = jnp.arange(T)[None, :] < mel_len[:, None]  # [B,T]
        m3 = fmask[:, None, :]
        denom = jnp.maximum(jnp.sum(fmask), 1) * self.n_mels
        mse_pre = jnp.sum(jnp.where(m3, (pre - mels) ** 2, 0.0)) / denom
        mse_post = jnp.sum(jnp.where(m3, (post - mels) ** 2, 0.0)) / denom
        # gate target: 1 at the last valid frame onward
        tgt = (jnp.arange(T)[None, :] >= (mel_len - 1)[:, None]).astype(jnp.float32)
        bce = optax.sigmoid_binary_cross_entropy(gates, tgt)
        gate_loss = jnp.mean(jnp.where(fmask, bce, 0.0))
        total = mse_pre + mse_post + gate_loss
        return total, {"mel_pre": mse_pre, "mel_post": mse_post,
                       "gate": gate_loss, "mutated": mutated}

    def make_train_step(self, lr: float = 1e-3):
        tx = optax.adamw(lr)
        opt_state = tx.init(self.variables["params"])

        @jax.jit
        def step_fn(variables, opt_state, tokens, token_len, mels, mel_len, rng):
            def lf(params):
                v = {**variables, "params": params}
                total, parts = self.loss(v, tokens, token_len, mels, mel_len, rng)
                return total, parts

            (total, parts), grads = jax.value_and_grad(lf, has_aux=True)(
                variables["params"])
            updates, opt_state = tx.update(grads, opt_state, variables["params"])
            params = optax.apply_updates(variables["params"], updates)
            new_vars = {**variables, "params": params,
                        **parts.pop("mutated")}
            return new_vars, opt_state, total, parts

        return step_fn, opt_state

    def generate_spectrogram(self, tokens: jnp.ndarray,
                             max_steps: int = 500) -> np.ndarray:
        token_len = jnp.full((tokens.shape[0],), tokens.shape[1], jnp.int32)
        mel, mel_len = self._jit_infer(
            self.variables, tokens, token_len, jax.random.PRNGKey(0), max_steps)
        n = int(np.asarray(mel_len).max())
        return np.asarray(mel[:, :, :n])
