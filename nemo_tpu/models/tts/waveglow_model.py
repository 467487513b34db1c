"""WaveGlow: flow-based vocoder (exact-likelihood mel → waveform).

Reference parity: `nemo/collections/tts/models/waveglow.py` +
`modules/waveglow_module.py`: audio squeezed into channel groups flows
through K steps of [invertible 1×1 conv + mel-conditioned affine coupling],
trained by exact NLL (Gaussian prior + log-determinants); inference runs
the inverse flow on sampled noise. (Compact formulation: no early-output
multiscale split — all groups flow through every step.)

TPU-native: couplings reuse the WN stack from the VITS modules; the 1×1
invertible mix is a [G, G] matmul with `slogdet` (tiny — G=8); the whole
NLL and the inverse are single jit programs.
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
from nemo_tpu.models.tts.modules.vits import WN


class AffineCoupling(nn.Module):
    channels: int  # group size G
    hidden: int = 64

    @nn.compact
    def __call__(self, x, mel_up, reverse: bool = False):
        """x [B, T, G]; mel_up [B, T, n_mels] aligned conditioning."""
        half = self.channels // 2
        xa, xb = x[..., :half], x[..., half:]
        h = jnp.concatenate([xa, mel_up], axis=-1)
        h = nn.Conv(self.hidden, (1,), name="pre")(h)
        ones = jnp.ones(h.shape[:-1] + (1,), h.dtype)
        h = WN(self.hidden, name="wn")(h, ones)
        st = nn.Conv(2 * (self.channels - half), (1,),
                     kernel_init=nn.initializers.zeros, name="post")(h)
        log_s, t = jnp.split(st, 2, axis=-1)
        log_s = jnp.clip(log_s, -7.0, 7.0)
        if reverse:
            xb = (xb - t) * jnp.exp(-log_s)
            return jnp.concatenate([xa, xb], -1), None
        xb = xb * jnp.exp(log_s) + t
        return jnp.concatenate([xa, xb], -1), jnp.sum(log_s, axis=(1, 2))


class Invertible1x1(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x, reverse: bool = False):
        init = jnp.linalg.qr(
            jax.random.normal(jax.random.PRNGKey(0),
                              (self.channels, self.channels)))[0]
        W = self.param("W", lambda rng, shape: init, (self.channels,) * 2)
        if reverse:
            return x @ jnp.linalg.inv(W), None
        logdet = jnp.linalg.slogdet(W)[1] * x.shape[1]
        return x @ W, jnp.broadcast_to(logdet, (x.shape[0],))


class WaveGlowNet(nn.Module):
    n_mels: int = 80
    n_group: int = 8
    n_flows: int = 6
    hidden: int = 64
    hop: int = 256

    def setup(self):
        self.convs = [Invertible1x1(self.n_group, name=f"inv{i}")
                      for i in range(self.n_flows)]
        self.couplings = [AffineCoupling(self.n_group, self.hidden,
                                         name=f"ac{i}")
                          for i in range(self.n_flows)]

    def _upsample_mel(self, mel, T_groups):
        """mel [B, n_mels, F] → [B, T_groups, n_mels] (nearest)."""
        m = jnp.transpose(mel, (0, 2, 1))
        F = m.shape[1]
        idx = jnp.clip((jnp.arange(T_groups) * F) // jnp.maximum(T_groups, 1),
                       0, F - 1)
        return m[:, idx]

    def forward(self, audio, mel):
        """audio [B, T] → (z, total logdet [B]); T must divide n_group."""
        B, T = audio.shape
        G = self.n_group
        x = audio[:, : (T // G) * G].reshape(B, T // G, G)
        mel_up = self._upsample_mel(mel, T // G)
        logdet = jnp.zeros((B,))
        for inv, ac in zip(self.convs, self.couplings):
            x, ld1 = inv(x)
            x, ld2 = ac(x, mel_up)
            logdet = logdet + ld1 + ld2
        return x, logdet

    def __call__(self, audio, mel):
        return self.forward(audio, mel)

    def infer(self, mel, rng, sigma: float = 1.0):
        B, _, F = mel.shape
        T_groups = (F * self.hop) // self.n_group
        mel_up = self._upsample_mel(mel, T_groups)
        z = sigma * jax.random.normal(rng, (B, T_groups, self.n_group))
        x = z
        for inv, ac in zip(reversed(self.convs), reversed(self.couplings)):
            x, _ = ac(x, mel_up, reverse=True)
            x, _ = inv(x, reverse=True)
        return x.reshape(B, T_groups * self.n_group)


class WaveGlowModel(Model):
    def __init__(self, cfg: Optional[ConfigDict] = None, init_params: bool = True):
        cfg = ConfigDict(cfg or {})
        super().__init__(cfg)
        self.sigma = float(cfg.get("sigma", 1.0))
        self.net = WaveGlowNet(
            n_mels=int(cfg.get("n_mels", 80)),
            n_group=int(cfg.get("n_group", 8)),
            n_flows=int(cfg.get("n_flows", 6)),
            hidden=int(cfg.get("hidden", 64)),
            hop=int(cfg.get("hop", 256)),
        )
        if init_params:
            audio = jnp.zeros((1, 64), jnp.float32)
            mel = jnp.zeros((1, self.net.n_mels, 4), jnp.float32)
            self.variables = self.net.init(jax.random.PRNGKey(0), audio, mel)
        self._jit_infer = jax.jit(
            lambda v, m, rng: self.net.apply(v, m, rng, sigma=self.sigma,
                                             method=WaveGlowNet.infer))

    def nll(self, variables, audio, mel):
        """−log p(audio | mel) per sample (reference WaveGlowLoss)."""
        z, logdet = self.net.apply(variables, audio, mel)
        n = z.shape[1] * z.shape[2]
        prior = 0.5 * jnp.sum(z ** 2, axis=(1, 2)) / (self.sigma ** 2)
        return jnp.mean((prior - logdet) / n)

    def convert_spectrogram_to_audio(self, spec: jnp.ndarray,
                                     seed: int = 0) -> jnp.ndarray:
        return self._jit_infer(self.variables, spec, jax.random.PRNGKey(seed))
