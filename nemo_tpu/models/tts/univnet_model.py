"""UnivNet vocoder model wrapper (GAN training + inference).

Reference parity: `nemo/collections/tts/models/univnet.py` (UnivNetModel):
generator = LVC stack; discriminators = MPD + multi-scale (standing in for
the reference's multi-resolution STFT discriminator — same adversarial
role, shared implementation with HiFi-GAN); losses = adv + FM + mel L1.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.core.model import Model
from nemo_tpu.models.tts.modules.hifigan import (
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    discriminator_loss,
    generator_loss,
)
from nemo_tpu.models.tts.modules.univnet import UnivNetGenerator


class UnivNetModel(Model):
    def __init__(self, cfg: Optional[ConfigDict] = None, init_params: bool = True):
        cfg = ConfigDict(cfg or {})
        super().__init__(cfg)
        self.sample_rate = int(cfg.get("sample_rate", 22050))
        self.n_mels = int(cfg.get("n_mels", 80))
        self.net = UnivNetGenerator(
            n_mels=self.n_mels,
            noise_dim=int(cfg.get("noise_dim", 64)),
            channels=int(cfg.get("channels", 32)),
            upsamples=tuple(cfg.get("upsamples", (8, 8, 4))),
        )
        self.mpd = MultiPeriodDiscriminator()
        self.msd = MultiScaleDiscriminator()
        if init_params:
            mel = jnp.zeros((1, self.n_mels, 8), jnp.float32)
            self.variables = self.net.init(
                jax.random.PRNGKey(0), mel, jax.random.PRNGKey(1))
        self._jit_gen = jax.jit(self.net.apply)

    def convert_spectrogram_to_audio(self, spec: jnp.ndarray,
                                     seed: int = 0) -> jnp.ndarray:
        return self._jit_gen(self.variables, spec, jax.random.PRNGKey(seed))

    def make_train_steps(self, gen_lr: float = 2e-4, disc_lr: float = 2e-4,
                         c_fm: float = 2.0, c_mel: float = 45.0):
        g_tx = optax.adamw(gen_lr, b1=0.8, b2=0.99)
        d_tx = optax.adamw(disc_lr, b1=0.8, b2=0.99)

        @jax.jit
        def disc_step(d_state, g_params, mel, audio, rng):
            fake = jax.lax.stop_gradient(self.net.apply(g_params, mel, rng))
            n = min(fake.shape[1], audio.shape[1])

            def dl(dp):
                outs = self.mpd.apply(dp["mpd"], audio[:, :n], fake[:, :n])
                outs += self.msd.apply(dp["msd"], audio[:, :n], fake[:, :n])
                return discriminator_loss(outs)

            loss, g = jax.value_and_grad(dl)(d_state["params"])
            up, opt = d_tx.update(g, d_state["opt"], d_state["params"])
            return {"params": optax.apply_updates(d_state["params"], up),
                    "opt": opt}, loss

        @jax.jit
        def gen_step(g_state, d_params, mel, audio, rng):
            def gl(gp):
                fake = self.net.apply(gp, mel, rng)
                n = min(fake.shape[1], audio.shape[1])
                outs = self.mpd.apply(d_params["mpd"], audio[:, :n], fake[:, :n])
                outs += self.msd.apply(d_params["msd"], audio[:, :n], fake[:, :n])
                adv, fm = generator_loss(outs)
                l1 = jnp.mean(jnp.abs(fake[:, :n] - audio[:, :n]))
                return adv + c_fm * fm + c_mel * l1, {"adv": adv, "fm": fm,
                                                      "l1": l1}

            (loss, parts), g = jax.value_and_grad(gl, has_aux=True)(
                g_state["params"])
            up, opt = g_tx.update(g, g_state["opt"], g_state["params"])
            return {"params": optax.apply_updates(g_state["params"], up),
                    "opt": opt}, loss, parts

        seg = jnp.zeros((1, 256))
        d_params = {"mpd": self.mpd.init(jax.random.PRNGKey(2), seg, seg),
                    "msd": self.msd.init(jax.random.PRNGKey(3), seg, seg)}
        g_state = {"params": self.variables, "opt": g_tx.init(self.variables)}
        d_state = {"params": d_params, "opt": d_tx.init(d_params)}
        return gen_step, disc_step, g_state, d_state
