"""VITS model wrapper: 2-optimizer adversarial training + text→waveform.

Reference parity: `nemo/collections/tts/models/vits.py` (VitsModel):
generator step = KL + duration + mel-L1 + adversarial + feature-matching;
discriminator step on real/generated waveform segments;
`convert_text_to_waveform()` inference.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.core.model import Model
from nemo_tpu.data.text_tokenizers import EnglishCharsTTSTokenizer
from nemo_tpu.models.tts.modules.hifigan import (
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    discriminator_loss,
    generator_loss,
)
from nemo_tpu.models.tts.modules.vits import VITSModule, slice_segments
from nemo_tpu.ops.audio import MelSpectrogramConfig, mel_spectrogram


class VitsModel(Model):
    def __init__(self, cfg: Optional[ConfigDict] = None, init_params: bool = True):
        cfg = ConfigDict(cfg or {})
        super().__init__(cfg)
        self.tokenizer = EnglishCharsTTSTokenizer()
        self.sample_rate = int(cfg.get("sample_rate", 22050))
        ups = tuple(cfg.get("upsample_rates", (8, 8, 2, 2)))
        self.net = VITSModule(
            n_symbols=int(cfg.get("n_symbols", self.tokenizer.vocab_size)),
            spec_channels=int(cfg.get("n_mels", 80)),
            latent_channels=int(cfg.get("latent_channels", 96)),
            d_model=int(cfg.get("d_model", 96)),
            prior_layers=int(cfg.get("prior_layers", 2)),
            n_flows=int(cfg.get("n_flows", 2)),
            segment_frames=int(cfg.get("segment_frames", 16)),
            upsample_rates=ups,
            upsample_initial_channel=int(cfg.get("upsample_initial_channel", 128)),
        )
        self.mpd = MultiPeriodDiscriminator()
        self.msd = MultiScaleDiscriminator()
        self.mel_cfg = MelSpectrogramConfig(
            sample_rate=self.sample_rate,
            features=int(cfg.get("n_mels", 80)),
            n_window_size=int(cfg.get("n_fft", 1024)),
            n_window_stride=self.net.hop,
            n_fft=int(cfg.get("n_fft", 1024)),
            normalize="none", preemph=None, dither=0.0, pad_to=0,
        )
        if init_params:
            toks = jnp.zeros((1, 8), jnp.int32)
            spec = jnp.zeros((1, self.mel_cfg.features, 32), jnp.float32)
            self.variables = self.net.init(
                jax.random.PRNGKey(0), toks, jnp.asarray([8]), spec,
                jnp.asarray([32]), jax.random.PRNGKey(1))
            seg_audio = jnp.zeros((1, self.net.segment_frames * self.net.hop))
            self.disc_variables = {
                "mpd": self.mpd.init(jax.random.PRNGKey(2), seg_audio, seg_audio),
                "msd": self.msd.init(jax.random.PRNGKey(3), seg_audio, seg_audio),
            }
        self._jit_infer = jax.jit(
            lambda v, t, tl, rng, mf: self.net.apply(
                v, t, tl, rng, max_frames=mf, method=VITSModule.infer),
            static_argnames=("mf",),
        )

    def parse(self, text: str) -> jnp.ndarray:
        ids = self.tokenizer.text_to_ids(text)
        return jnp.asarray(np.array(ids, np.int32))[None]

    def _mel(self, audio, lens):
        feats, flens = mel_spectrogram(audio, lens, self.mel_cfg,
                                       training=False)
        return feats, flens

    # -- training ------------------------------------------------------------
    def make_train_steps(self, gen_lr: float = 2e-4, disc_lr: float = 2e-4,
                         c_mel: float = 45.0, c_kl: float = 1.0,
                         c_fm: float = 2.0):
        g_tx = optax.adamw(gen_lr, b1=0.8, b2=0.99)
        d_tx = optax.adamw(disc_lr, b1=0.8, b2=0.99)

        def real_segment(audio, starts):
            seg = self.net.segment_frames * self.net.hop
            idx = starts[:, None] * self.net.hop + jnp.arange(seg)[None]
            return jnp.take_along_axis(audio, idx, axis=1)

        @jax.jit
        def disc_step(dv, gv, tokens, token_len, spec, mel_len, audio, rng):
            out = self.net.apply(gv, tokens, token_len, spec, mel_len, rng,
                                 train=False)
            fake = jax.lax.stop_gradient(out["audio_seg"])
            real = real_segment(audio, out["starts"])

            def dl(dvars):
                outs = self.mpd.apply(dvars["mpd"], real, fake)
                outs += self.msd.apply(dvars["msd"], real, fake)
                return discriminator_loss(outs)

            loss, grads = jax.value_and_grad(dl)(dv["params"])
            updates, opt = d_tx.update(grads, dv["opt"], dv["params"])
            params = optax.apply_updates(dv["params"], updates)
            return {"params": params, "opt": opt}, loss

        @jax.jit
        def gen_step(gv_state, dv_params, tokens, token_len, spec, mel_len,
                     audio, rng):
            def gl(gvars):
                out = self.net.apply(gvars, tokens, token_len, spec, mel_len,
                                     rng, train=True,
                                     rngs={"dropout": jax.random.fold_in(rng, 1)})
                fake = out["audio_seg"]
                real = real_segment(audio, out["starts"])
                seg_len = jnp.full((fake.shape[0],), fake.shape[1], jnp.int32)
                mel_f, _ = self._mel(fake, seg_len)
                mel_r, _ = self._mel(real, seg_len)
                mel_l1 = jnp.mean(jnp.abs(mel_f - mel_r))
                outs = self.mpd.apply(dv_params["mpd"], real, fake)
                outs += self.msd.apply(dv_params["msd"], real, fake)
                adv, fm = generator_loss(outs)
                total = (c_mel * mel_l1 + c_kl * out["kl"] + out["dur_loss"]
                         + adv + c_fm * fm)
                return total, {"mel": mel_l1, "kl": out["kl"],
                               "dur": out["dur_loss"], "adv": adv, "fm": fm}

            (loss, parts), grads = jax.value_and_grad(gl, has_aux=True)(
                gv_state["params"])
            updates, opt = g_tx.update(grads, gv_state["opt"],
                                       gv_state["params"])
            params = optax.apply_updates(gv_state["params"], updates)
            return {"params": params, "opt": opt}, loss, parts

        g_state = {"params": self.variables, "opt": g_tx.init(self.variables)}
        d_state = {"params": self.disc_variables,
                   "opt": d_tx.init(self.disc_variables)}
        return gen_step, disc_step, g_state, d_state

    # -- inference -----------------------------------------------------------
    def convert_text_to_waveform(self, tokens: jnp.ndarray,
                                 max_frames: int = 200) -> np.ndarray:
        token_len = jnp.full((tokens.shape[0],), tokens.shape[1], jnp.int32)
        audio, audio_len = self._jit_infer(
            self.variables, tokens, token_len, jax.random.PRNGKey(0), max_frames)
        n = int(np.asarray(audio_len).max())
        return np.asarray(audio[:, :n])
