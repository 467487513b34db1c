"""SSL pretraining for audio enhancement encoders (audio collection).

Reference parity: `nemo/collections/audio/models` SSL pretraining —
mask fixed-size time patches of the input spectrogram
(ssl_pretrain_masking.py) and train the enhancement UNet to reconstruct
the original signal, loss concentrated on the masked regions. The
pretrained trunk then warm-starts the enhancement models
(generative.py), which share the same SpectralUNet.

TPU-first: mask sampling is the vectorized rank trick from
ssl_pretrain_masking (no host loop); the whole step (STFT → mask → UNet
→ masked loss) is one jitted program on static shapes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.core.model import Model
from nemo_tpu.models.audio.generative import SpectralUNet, _spec, _wave
from nemo_tpu.models.audio.ssl_pretrain_masking import ssl_patch_mask


class SSLPretrainModel(Model):
    """Masked-patch self-supervised pretraining on complex spectrograms.

    cfg: n_fft/hop/spec_scale/channels (the _EnhBase contract) plus
    patch_size / mask_fraction (the masking schedule)."""

    def __init__(self, cfg: Optional[ConfigDict] = None,
                 init_params: bool = True, seed: int = 0):
        cfg = ConfigDict(cfg or {})
        super().__init__(cfg)
        self.n_fft = int(cfg.get("n_fft", 512))
        self.hop = int(cfg.get("hop", 128))
        self.scale = float(cfg.get("spec_scale", 0.15))
        self.patch_size = int(cfg.get("patch_size", 10))
        self.mask_fraction = float(cfg.get("mask_fraction", 0.7))
        self.net = SpectralUNet(ch=int(cfg.get("channels", 48)), c_out=2)
        if init_params:
            F = self.n_fft // 2 + 1
            self.variables = self.net.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, F, 8, 2), jnp.float32))

    def _masked_recon(self, params, audio, lengths, rng):
        """Returns (estimate, target, mask) specs — all [B, F, K, 2];
        mask [B, 1, K, 1] is 0 where a patch was hidden."""
        s = _spec(audio, self.n_fft, self.hop) / self.scale  # [B, F, K, 2]
        K = s.shape[2]
        frame_len = jnp.minimum(lengths // self.hop + 1, K)
        # time-last layout for the masker, one flag channel per frame
        flags = ssl_patch_mask(
            rng, jnp.ones((s.shape[0], K), s.dtype), frame_len,
            patch_size=self.patch_size, mask_fraction=self.mask_fraction)
        m = flags[:, None, :, None]  # 1 = visible, 0 = masked
        est = self.net.apply(params, s * m)
        return est, s, m

    def make_train_step(self, lr: float = 1e-3):
        tx = optax.adamw(lr)

        @jax.jit
        def train_step(params, opt_state, audio, lengths, rng):
            def loss_fn(p):
                est, tgt, m = self._masked_recon(p, audio, lengths, rng)
                hidden = 1.0 - m
                # reconstruction focused on the hidden patches (the SSL
                # objective) + a small visible anchor so the net stays an
                # identity map where it can see
                l_mask = jnp.sum(jnp.abs(est - tgt) * hidden) / \
                    jnp.maximum(jnp.sum(hidden * jnp.ones_like(tgt)), 1.0)
                l_vis = jnp.sum(jnp.abs(est - tgt) * m) / \
                    jnp.maximum(jnp.sum(m * jnp.ones_like(tgt)), 1.0)
                return l_mask + 0.1 * l_vis

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return tx, train_step

    def masked_reconstruction_error(self, audio, lengths, seed: int = 0):
        """Mean |est − target| over hidden patches (the SSL validation
        metric)."""
        est, tgt, m = self._masked_recon(
            self.variables, jnp.asarray(audio), jnp.asarray(lengths),
            jax.random.PRNGKey(seed))
        hidden = 1.0 - m
        return float(jnp.sum(jnp.abs(est - tgt) * hidden)
                     / jnp.maximum(jnp.sum(hidden * jnp.ones_like(tgt)), 1.0))

    def pretrained_trunk(self):
        """The UNet variables, for warm-starting the enhancement models
        (they share SpectralUNet geometry at c_in=2)."""
        return self.variables
