"""Speech enhancement (masking-based, TPU-native).

Reference parity: `nemo/collections/audio/models/enhancement.py` masking
models: STFT → neural mask estimator → complex-domain masking → ISTFT,
trained with SI-SNR (audio/metrics). The mask estimator here is a compact
conv net over log-magnitude features.
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
from nemo_tpu.ops.stft import istft, si_snr, stft


class MaskEstimator(nn.Module):
    channels: int = 64
    n_layers: int = 4

    @nn.compact
    def __call__(self, logmag):  # [B, F, K]
        h = logmag[..., None]
        for i in range(self.n_layers):
            h = nn.Conv(self.channels, (3, 3), padding="SAME", name=f"conv{i}")(h)
            h = nn.LayerNorm(name=f"ln{i}")(h)
            h = nn.silu(h)
        mask = nn.Conv(1, (3, 3), padding="SAME", name="out")(h)[..., 0]
        return jax.nn.sigmoid(mask)  # [B, F, K] magnitude mask


class MaskingEnhancementModel(Model):
    def __init__(self, cfg: Optional[ConfigDict] = None, init_params: bool = True):
        cfg = ConfigDict(cfg or {})
        super().__init__(cfg)
        self.n_fft = int(cfg.get("n_fft", 512))
        self.hop = int(cfg.get("hop", 128))
        self.net = MaskEstimator(
            channels=int(cfg.get("channels", 64)),
            n_layers=int(cfg.get("n_layers", 4)),
        )
        if init_params:
            dummy = jnp.zeros((1, 16, self.n_fft // 2 + 1), jnp.float32)
            self.variables = self.net.init(jax.random.PRNGKey(0), dummy)
        self._jit_enhance = jax.jit(self._enhance)

    def _enhance(self, params, noisy):
        re, im = stft(noisy, self.n_fft, self.hop)
        logmag = jnp.log1p(jnp.sqrt(re * re + im * im))
        mask = self.net.apply(params, logmag)
        return istft(re * mask, im * mask, self.n_fft, self.hop, length=noisy.shape[1])

    def enhance(self, noisy: jnp.ndarray) -> jnp.ndarray:
        """[B, T] noisy waveform → [B, T] enhanced."""
        return self._jit_enhance(self.variables, noisy)

    def make_train_step(self, lr: float = 1e-3):
        tx = optax.adamw(lr)
        net, n_fft, hop = self.net, self.n_fft, self.hop

        @jax.jit
        def train_step(params, opt_state, noisy, clean):
            def loss_fn(p):
                re, im = stft(noisy, n_fft, hop)
                logmag = jnp.log1p(jnp.sqrt(re * re + im * im))
                mask = net.apply(p, logmag)
                est = istft(re * mask, im * mask, n_fft, hop, length=noisy.shape[1])
                return -jnp.mean(si_snr(est, clean))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return tx, train_step
