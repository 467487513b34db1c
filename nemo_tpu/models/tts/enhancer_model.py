"""Spectrogram enhancer + SSL voice conversion (TPU-native).

Reference parity:
- `nemo/collections/tts/models/spectrogram_enhancer.py` — a GAN that adds
  realistic high-frequency detail to synthesized (over-smoothed) mels
  before vocoding (StyleGAN-ish generator + patch discriminator).
- `nemo/collections/tts/models/ssl_tts.py` — voice conversion: a content
  encoder extracts speaker-independent features, a speaker embedding
  conditions the decoder, so content(src) + speaker(tgt) re-synthesizes
  the source speech in the target voice.

TPU-first shapes: both are conv nets over [B, n_mels, T] with
MXU-friendly channel counts; the GAN trains with the same 2-optimizer
pattern as HiFi-GAN; the voice converter trains by reconstruction with a
speaker-classifier-free bottleneck (instance-norm removes speaker
statistics from content features, the reference's SSL-feature analog)."""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.core.model import Model


class _EnhGenerator(nn.Module):
    ch: int = 64
    zdim: int = 32

    @nn.compact
    def __call__(self, mel, z):
        """mel [B, D, T] + noise z [B, zdim] → residual detail [B, D, T]."""
        x = mel[..., None]  # [B, D, T, 1]
        zc = nn.Dense(self.ch, name="zmap")(z)[:, None, None, :]
        h = nn.Conv(self.ch, (3, 3), padding="SAME", name="in")(x)
        for i in range(3):
            h = nn.silu(nn.GroupNorm(num_groups=8, name=f"gn{i}")(h) + zc)
            h = nn.Conv(self.ch, (3, 3), padding="SAME", name=f"c{i}")(h)
        out = nn.Conv(1, (3, 3), padding="SAME",
                      kernel_init=nn.initializers.zeros, name="out")(h)
        return out[..., 0]


class _PatchDisc(nn.Module):
    ch: int = 32

    @nn.compact
    def __call__(self, mel):
        h = mel[..., None]
        for i, s in enumerate([(2, 2), (2, 2), (2, 2)]):
            h = nn.Conv(self.ch * (2 ** i), (4, 4), strides=s,
                        padding="SAME", name=f"d{i}")(h)
            h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (3, 3), padding="SAME", name="out")(h)[..., 0]


class SpectrogramEnhancer(Model):
    """GAN mel enhancer: `enhance(mel)` adds detail to synthesized mels
    (reference spectrogram_enhancer.py surface)."""

    def __init__(self, cfg: Optional[ConfigDict] = None, init_params=True):
        cfg = ConfigDict(cfg or {})
        super().__init__(cfg)
        self.n_mels = int(cfg.get("n_mels", 80))
        self.zdim = int(cfg.get("zdim", 32))
        self.gen = _EnhGenerator(ch=int(cfg.get("channels", 64)), zdim=self.zdim)
        self.disc = _PatchDisc()
        if init_params:
            mel = jnp.zeros((1, self.n_mels, 32), jnp.float32)
            z = jnp.zeros((1, self.zdim), jnp.float32)
            self.gen_vars = self.gen.init(jax.random.PRNGKey(0), mel, z)
            self.disc_vars = self.disc.init(jax.random.PRNGKey(1), mel)
        self._jit_enh = jax.jit(
            lambda v, mel, z: mel + self.gen.apply(v, mel, z))

    def enhance(self, mel: jnp.ndarray, seed: int = 0) -> jnp.ndarray:
        z = jax.random.normal(jax.random.PRNGKey(seed),
                              (mel.shape[0], self.zdim))
        return self._jit_enh(self.gen_vars, mel, z)

    def make_train_steps(self, lr: float = 2e-4):
        """(gen_step, disc_step): hinge GAN + L1 anchor — the HiFi-GAN
        2-optimizer pattern on mels."""
        gtx, dtx = optax.adam(lr, b1=0.5), optax.adam(lr, b1=0.5)
        gen, disc = self.gen, self.disc

        @jax.jit
        def disc_step(dv, d_opt, gv, degraded, real, rng):
            z = jax.random.normal(rng, (degraded.shape[0], self.zdim))
            fake = degraded + gen.apply(gv, degraded, z)

            def f(dv):
                sr = disc.apply(dv, real)
                sf = disc.apply(dv, fake)
                return jnp.mean(nn.relu(1.0 - sr)) + jnp.mean(nn.relu(1.0 + sf))

            loss, g = jax.value_and_grad(f)(dv)
            up, d_opt = dtx.update(g, d_opt)
            return optax.apply_updates(dv, up), d_opt, loss

        @jax.jit
        def gen_step(gv, g_opt, dv, degraded, real, rng):
            z = jax.random.normal(rng, (degraded.shape[0], self.zdim))

            def f(gv):
                fake = degraded + gen.apply(gv, degraded, z)
                adv = -jnp.mean(disc.apply(dv, fake))
                anchor = jnp.mean(jnp.abs(fake - real))
                return adv + 10.0 * anchor

            loss, g = jax.value_and_grad(f)(gv)
            up, g_opt = gtx.update(g, g_opt)
            return optax.apply_updates(gv, up), g_opt, loss

        return gtx, dtx, gen_step, disc_step


class _ContentEncoder(nn.Module):
    ch: int = 96
    bottleneck: int = 32

    @nn.compact
    def __call__(self, mel):
        """[B, D, T] → speaker-stripped content [B, T, bottleneck]:
        per-utterance instance norm removes global (speaker) statistics —
        the SSL-feature analog of the reference's frozen Conformer-SSL
        content extractor."""
        x = jnp.transpose(mel, (0, 2, 1))  # [B, T, D]
        for i in range(2):
            x = nn.Conv(self.ch, (5,), padding="SAME", name=f"c{i}")(x)
            x = nn.silu(nn.LayerNorm(name=f"ln{i}")(x))
        x = nn.Conv(self.bottleneck, (1,), name="bott")(x)
        mu = jnp.mean(x, axis=1, keepdims=True)
        sd = jnp.std(x, axis=1, keepdims=True) + 1e-5
        return (x - mu) / sd  # instance-normalized content


class _SpeakerEncoder(nn.Module):
    emb: int = 64

    @nn.compact
    def __call__(self, mel):
        x = jnp.transpose(mel, (0, 2, 1))
        for i in range(2):
            x = nn.Conv(96, (5,), strides=(2,), padding="SAME", name=f"c{i}")(x)
            x = nn.silu(x)
        # attentive stats pooling (titanet-style, simplified)
        w = jax.nn.softmax(nn.Dense(1, name="attn")(x), axis=1)
        mu = jnp.sum(x * w, axis=1)
        sd = jnp.sqrt(jnp.maximum(jnp.sum(x * x * w, 1) - mu * mu, 1e-6))
        z = nn.Dense(self.emb, name="emb")(jnp.concatenate([mu, sd], -1))
        return z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-6)


class _VCDecoder(nn.Module):
    n_mels: int
    ch: int = 128

    @nn.compact
    def __call__(self, content, spk):
        """content [B, T, C] + spk [B, E] → mel [B, D, T]."""
        s = nn.Dense(self.ch, name="smap")(spk)[:, None, :]
        x = nn.Dense(self.ch, name="in")(content) + s
        for i in range(3):
            h = nn.Conv(self.ch, (5,), padding="SAME", name=f"c{i}")(nn.silu(x))
            x = x + h + s
        mel = nn.Dense(self.n_mels, name="out")(nn.silu(x))
        return jnp.transpose(mel, (0, 2, 1))


class SSLVoiceConverter(Model):
    """ssl_tts-style voice conversion: content(src) + speaker(tgt) → mel
    in the target voice (reference ssl_tts.py surface)."""

    def __init__(self, cfg: Optional[ConfigDict] = None, init_params=True):
        cfg = ConfigDict(cfg or {})
        super().__init__(cfg)
        self.n_mels = int(cfg.get("n_mels", 80))
        self.content = _ContentEncoder(bottleneck=int(cfg.get("bottleneck", 32)))
        self.speaker = _SpeakerEncoder(emb=int(cfg.get("spk_emb", 64)))
        self.decoder = _VCDecoder(n_mels=self.n_mels)
        if init_params:
            mel = jnp.zeros((1, self.n_mels, 32), jnp.float32)
            k = jax.random.PRNGKey(0)
            self.c_vars = self.content.init(k, mel)
            self.s_vars = self.speaker.init(k, mel)
            c = self.content.apply(self.c_vars, mel)
            s = self.speaker.apply(self.s_vars, mel)
            self.d_vars = self.decoder.init(k, c, s)
        self._jit_convert = jax.jit(self._convert)

    def _convert(self, cv, sv, dv, src_mel, tgt_mel):
        c = self.content.apply(cv, src_mel)
        s = self.speaker.apply(sv, tgt_mel)
        return self.decoder.apply(dv, c, s)

    def convert(self, src_mel, tgt_mel):
        """Content of `src_mel` spoken with `tgt_mel`'s voice."""
        return self._jit_convert(self.c_vars, self.s_vars, self.d_vars,
                                 src_mel, tgt_mel)

    def make_train_step(self, lr: float = 1e-3):
        tx = optax.adamw(lr)
        content, speaker, decoder = self.content, self.speaker, self.decoder

        @jax.jit
        def step(params, opt, mel):
            def f(p):
                cv, sv, dv = p
                c = content.apply(cv, mel)
                s = speaker.apply(sv, mel)
                rec = decoder.apply(dv, c, s)
                return jnp.mean(jnp.abs(rec - mel))

            loss, g = jax.value_and_grad(f)(params)
            up, opt = tx.update(g, opt, params)
            return optax.apply_updates(params, up), opt, loss

        return tx, step
