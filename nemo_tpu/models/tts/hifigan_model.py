"""HiFi-GAN vocoder model with two-optimizer GAN training.

Reference parity: HifiGanModel (`nemo/collections/tts/models/hifigan.py:43`):
`convert_spectrogram_to_audio()` (:172); training_step runs discriminator
(MPD+MSD) and generator (adv + feature-matching + mel-L1) optimizers.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.core.model import Model
from nemo_tpu.models.tts.modules.hifigan import (
    Generator,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    discriminator_loss,
    generator_loss,
)
from nemo_tpu.ops.audio import MelSpectrogramConfig, mel_spectrogram


class HifiGanModel(Model):
    def __init__(self, cfg: Optional[ConfigDict] = None, init_params: bool = True):
        cfg = ConfigDict(cfg or {})
        super().__init__(cfg)
        self.sample_rate = int(cfg.get("sample_rate", 22050))
        self.n_mels = int(cfg.get("n_mels", 80))
        gen_cfg = cfg.get("generator", ConfigDict())
        self.generator = Generator(
            upsample_rates=tuple(gen_cfg.get("upsample_rates", (8, 8, 2, 2))),
            upsample_kernel_sizes=tuple(gen_cfg.get("upsample_kernel_sizes", (16, 16, 4, 4))),
            upsample_initial_channel=int(gen_cfg.get("upsample_initial_channel", 512)),
            resblock_kernel_sizes=tuple(gen_cfg.get("resblock_kernel_sizes", (3, 7, 11))),
            resblock_dilation_sizes=tuple(
                tuple(d) for d in gen_cfg.get("resblock_dilation_sizes",
                                              ((1, 3, 5), (1, 3, 5), (1, 3, 5)))),
        )
        self.mpd = MultiPeriodDiscriminator()
        self.msd = MultiScaleDiscriminator()
        self.mel_cfg = MelSpectrogramConfig(
            sample_rate=self.sample_rate,
            features=self.n_mels,
            n_window_size=1024,
            n_window_stride=256,
            n_fft=1024,
            normalize="none",
            preemph=None,
            dither=0.0,
            pad_to=0,
        )
        if init_params:
            mel = jnp.zeros((1, self.n_mels, 16), jnp.float32)
            self.variables = {"params": {"generator": self.generator.init(
                jax.random.PRNGKey(0), mel)["params"]}}
        self._jit_gen = jax.jit(
            lambda p, mel: self.generator.apply({"params": p}, mel)
        )

    @property
    def hop_length(self) -> int:
        import numpy as _np

        return int(_np.prod(self.generator.upsample_rates))

    def convert_spectrogram_to_audio(self, spec: jnp.ndarray) -> jnp.ndarray:
        """[B, n_mels, T] → [B, T*hop] waveform (reference hifigan.py:172)."""
        return self._jit_gen(self.variables["params"]["generator"], spec)

    # -- GAN training -------------------------------------------------------
    def init_train(self, seed: int = 0):
        """Initializes generator + discriminator params and two optimizers
        (reference: two-optimizer training_step, hifigan.py)."""
        rng = jax.random.PRNGKey(seed)
        mel = jnp.zeros((1, self.n_mels, 16), jnp.float32)
        audio = jnp.zeros((1, 16 * self.hop_length), jnp.float32)
        g = self.generator.init(rng, mel)["params"]
        d_mpd = self.mpd.init(rng, audio, audio)["params"]
        d_msd = self.msd.init(rng, audio, audio)["params"]
        self.opt_g = optax.adamw(2e-4, b1=0.8, b2=0.99)
        self.opt_d = optax.adamw(2e-4, b1=0.8, b2=0.99)
        state = {
            "g": g, "mpd": d_mpd, "msd": d_msd,
            "opt_g": self.opt_g.init(g),
            "opt_d": self.opt_d.init({"mpd": d_mpd, "msd": d_msd}),
        }
        return state

    def train_step_fns(self):
        gen, mpd, msd = self.generator, self.mpd, self.msd
        mel_cfg = self.mel_cfg
        opt_g, opt_d = self.opt_g, self.opt_d

        def _mel(audio):
            m, _ = mel_spectrogram(
                audio, jnp.full((audio.shape[0],), audio.shape[1], jnp.int32), mel_cfg
            )
            return m

        @jax.jit
        def disc_step(state, mel, audio):
            fake = gen.apply({"params": state["g"]}, mel)
            fake = jax.lax.stop_gradient(fake)

            def d_loss(dp):
                outs = mpd.apply({"params": dp["mpd"]}, audio, fake)
                outs += msd.apply({"params": dp["msd"]}, audio, fake)
                return discriminator_loss(outs)

            dp = {"mpd": state["mpd"], "msd": state["msd"]}
            loss, grads = jax.value_and_grad(d_loss)(dp)
            updates, new_opt = opt_d.update(grads, state["opt_d"], dp)
            dp = optax.apply_updates(dp, updates)
            state = dict(state, mpd=dp["mpd"], msd=dp["msd"], opt_d=new_opt)
            return state, loss

        @jax.jit
        def gen_step(state, mel, audio):
            def g_loss(g):
                fake = gen.apply({"params": g}, mel)
                outs = mpd.apply({"params": state["mpd"]}, audio, fake)
                outs += msd.apply({"params": state["msd"]}, audio, fake)
                adv, fm = generator_loss(outs)
                mf, mr = _mel(fake), _mel(audio)
                F = min(mf.shape[2], mr.shape[2])
                mel_l1 = jnp.mean(jnp.abs(mf[:, :, :F] - mr[:, :, :F]))
                return adv + 2.0 * fm + 45.0 * mel_l1, (adv, fm, mel_l1)

            (loss, aux), grads = jax.value_and_grad(g_loss, has_aux=True)(state["g"])
            updates, new_opt = opt_g.update(grads, state["opt_g"], state["g"])
            g = optax.apply_updates(state["g"], updates)
            state = dict(state, g=g, opt_g=new_opt)
            return state, loss

        return disc_step, gen_step
