"""AudioCodecModel: neural audio codec with residual VQ.

Reference parity: `nemo/collections/tts/models/audio_codec.py`
(AudioCodecModel — encoder → RVQ → decoder trained with multi-resolution
mel + time-domain losses, MPD/MSD adversarial + feature-matching; the
encode()/decode() API returning discrete tokens, used by speechlm codecs).

TPU-first: one jitted generator step (encoder+RVQ+decoder+losses) and one
jitted discriminator step; codebook lookups are argmin matmuls.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.core.model import Model
from nemo_tpu.models.tts.modules.codec import (
    CodecDecoder,
    CodecEncoder,
    ResidualVectorQuantizer,
    multiscale_mel_loss,
)
from nemo_tpu.models.tts.modules.hifigan import (
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    discriminator_loss,
    generator_loss,
)

import flax.linen as nn


class _CodecNet(nn.Module):
    base_channels: int
    strides: tuple
    latent_dim: int
    num_levels: int
    codebook_size: int

    def setup(self):
        self.encoder = CodecEncoder(self.base_channels, self.strides, self.latent_dim)
        self.decoder = CodecDecoder(self.base_channels, tuple(reversed(self.strides)),
                                    self.latent_dim)
        self.rvq = ResidualVectorQuantizer(self.num_levels, self.codebook_size,
                                           self.latent_dim)

    def __call__(self, audio):
        z = self.encoder(audio)
        q, codes, vq_loss = self.rvq(z)
        recon = self.decoder(q)
        return recon, codes, vq_loss

    def encode(self, audio):
        z = self.encoder(audio)
        _, codes, _ = self.rvq(z)
        return codes  # [B, L, F]

    def decode(self, codes):
        q = self.rvq.decode_codes(codes)
        return self.decoder(q)


class AudioCodecModel(Model):
    def __init__(self, cfg: Optional[ConfigDict] = None, init_params: bool = True):
        cfg = ConfigDict(cfg or {})
        super().__init__(cfg)
        self.sample_rate = int(cfg.get("sample_rate", 16000))
        self.net = _CodecNet(
            base_channels=int(cfg.get("base_channels", 32)),
            strides=tuple(cfg.get("strides", (2, 4, 5, 8))),
            latent_dim=int(cfg.get("latent_dim", 128)),
            num_levels=int(cfg.get("num_levels", 8)),
            codebook_size=int(cfg.get("codebook_size", 1024)),
        )
        self.mpd = MultiPeriodDiscriminator()
        self.msd = MultiScaleDiscriminator()
        self.frame_rate = int(np.prod(self.net.strides))
        if init_params:
            audio = jnp.zeros((1, 4 * self.frame_rate), jnp.float32)
            self.variables = {"params": self.net.init(
                jax.random.PRNGKey(0), audio)["params"]}
        self._jit_encode = jax.jit(
            lambda p, a: self.net.apply({"params": p}, a, method=_CodecNet.encode))
        self._jit_decode = jax.jit(
            lambda p, c: self.net.apply({"params": p}, c, method=_CodecNet.decode))

    # -- inference API (reference audio_codec.py encode/decode) ---------------
    def encode(self, audio: jnp.ndarray) -> jnp.ndarray:
        """[B, T] waveform → [B, L, F] discrete codec tokens."""
        return self._jit_encode(self.variables["params"], audio)

    def decode(self, codes: jnp.ndarray) -> jnp.ndarray:
        """[B, L, F] tokens → [B, T] waveform."""
        return self._jit_decode(self.variables["params"], codes)

    # -- GAN training ----------------------------------------------------------
    def init_train(self, seed: int = 0, lr: float = 2e-4):
        rng = jax.random.PRNGKey(seed)
        audio = jnp.zeros((1, 4 * self.frame_rate), jnp.float32)
        g = self.net.init(rng, audio)["params"]
        d_mpd = self.mpd.init(rng, audio, audio)["params"]
        d_msd = self.msd.init(rng, audio, audio)["params"]
        self.opt_g = optax.adamw(lr, b1=0.8, b2=0.99)
        self.opt_d = optax.adamw(lr, b1=0.8, b2=0.99)
        return {
            "g": g, "mpd": d_mpd, "msd": d_msd,
            "opt_g": self.opt_g.init(g),
            "opt_d": self.opt_d.init({"mpd": d_mpd, "msd": d_msd}),
        }

    def train_step_fns(self, adv_weight: float = 1.0, mel_weight: float = 10.0,
                       time_weight: float = 1.0, vq_weight: float = 1.0,
                       fm_weight: float = 2.0, use_disc: bool = True):
        net, mpd, msd = self.net, self.mpd, self.msd
        sr = self.sample_rate
        opt_g, opt_d = self.opt_g, self.opt_d

        @jax.jit
        def disc_step(state, audio):
            fake, _, _ = net.apply({"params": state["g"]}, audio)
            fake = jax.lax.stop_gradient(fake)

            def d_loss(dp):
                outs = mpd.apply({"params": dp["mpd"]}, audio, fake)
                outs += msd.apply({"params": dp["msd"]}, audio, fake)
                return discriminator_loss(outs)

            loss, grads = jax.value_and_grad(d_loss)(
                {"mpd": state["mpd"], "msd": state["msd"]})
            upd, opt_state = opt_d.update(
                grads, state["opt_d"], {"mpd": state["mpd"], "msd": state["msd"]})
            new = optax.apply_updates({"mpd": state["mpd"], "msd": state["msd"]}, upd)
            return {**state, "mpd": new["mpd"], "msd": new["msd"],
                    "opt_d": opt_state}, loss

        @jax.jit
        def gen_step(state, audio):
            def g_loss(gp):
                fake, _, vq_loss = net.apply({"params": gp}, audio)
                loss = mel_weight * multiscale_mel_loss(fake, audio, sr)
                loss = loss + time_weight * jnp.mean(jnp.abs(fake - audio))
                loss = loss + vq_weight * vq_loss
                if use_disc:
                    outs = mpd.apply({"params": state["mpd"]}, audio, fake)
                    outs += msd.apply({"params": state["msd"]}, audio, fake)
                    adv, fm = generator_loss(outs)
                    loss = loss + adv_weight * adv + fm_weight * fm
                return loss

            loss, grads = jax.value_and_grad(g_loss)(state["g"])
            upd, opt_state = opt_g.update(grads, state["opt_g"], state["g"])
            return {**state, "g": optax.apply_updates(state["g"], upd),
                    "opt_g": opt_state}, loss

        return gen_step, disc_step
