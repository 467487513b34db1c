"""VITS: end-to-end text-to-waveform VAE with adversarial training.

Reference parity: `nemo/collections/tts/models/vits.py` +
`modules/vits_modules.py` (TextEncoder prior, WaveNet posterior encoder,
residual-coupling normalizing flow, MAS alignment, HiFi-GAN decoder on
sliced latents, duration predictor; losses = KL + mel L1 + adv + FM + dur).

TPU-native choices: MAS runs as the same lax.scan monotonic Viterbi used by
the aligner (the alignment lattice is identical — per-frame token
likelihoods); latent slicing is a static-size dynamic_slice per element;
the flow is mean-only residual coupling (VITS `mean_only=True`) so both
directions are single fused passes.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from nemo_tpu.models.tts.modules.aligner import viterbi_durations
from nemo_tpu.models.tts.modules.fastpitch import (
    FFTransformer,
    TemporalPredictor,
    regulate_length,
)
from nemo_tpu.models.tts.modules.hifigan import Generator


class WN(nn.Module):
    """Dilated gated conv stack (reference vits_modules.WN, simplified:
    no global conditioning)."""

    channels: int
    kernel_size: int = 5
    n_layers: int = 4
    dilation_rate: int = 1

    @nn.compact
    def __call__(self, x, mask):
        out = jnp.zeros_like(x)
        for i in range(self.n_layers):
            d = self.dilation_rate ** i
            pad = (self.kernel_size - 1) // 2 * d
            h = nn.Conv(2 * self.channels, (self.kernel_size,),
                        kernel_dilation=(d,), padding=[(pad, pad)],
                        name=f"in{i}")(x * mask)
            a, b = jnp.split(h, 2, axis=-1)
            acts = jnp.tanh(a) * jax.nn.sigmoid(b)
            res_skip = nn.Conv(2 * self.channels, (1,), name=f"rs{i}")(acts)
            res, skip = jnp.split(res_skip, 2, axis=-1)
            x = (x + res) * mask
            out = out + skip
        return out * mask


class PosteriorEncoder(nn.Module):
    """spec [B, C_spec, T] → (z, m_q, logs_q) each [B, T, C_lat]."""

    latent_channels: int = 192
    hidden: int = 192

    @nn.compact
    def __call__(self, spec, mel_mask, rng):
        x = jnp.transpose(spec, (0, 2, 1))
        m = mel_mask[..., None].astype(x.dtype)
        x = nn.Conv(self.hidden, (1,), name="pre")(x) * m
        x = WN(self.hidden, name="wn")(x, m)
        stats = nn.Conv(2 * self.latent_channels, (1,), name="proj")(x) * m
        mq, logs_q = jnp.split(stats, 2, axis=-1)
        z = mq + jax.random.normal(rng, mq.shape) * jnp.exp(logs_q)
        return z * m, mq, logs_q


class ResidualCouplingLayer(nn.Module):
    """Mean-only affine coupling (vits_modules.ResidualCouplingLayer)."""

    channels: int
    hidden: int = 192

    @nn.compact
    def __call__(self, x, mask, reverse: bool = False):
        half = self.channels // 2
        xa, xb = x[..., :half], x[..., half:]
        m = mask[..., None].astype(x.dtype)
        h = nn.Conv(self.hidden, (1,), name="pre")(xa * m) * m
        h = WN(self.hidden, name="wn")(h, m)
        mean = nn.Conv(half, (1,), name="post")(h) * m
        xb = (xb - mean) if reverse else (xb + mean)
        return jnp.concatenate([xa, xb * m], axis=-1)


class Flow(nn.Module):
    """Stack of couplings with channel flips; volume-preserving
    (mean-only), so no logdet terms."""

    channels: int
    n_flows: int = 4
    hidden: int = 192

    @nn.compact
    def __call__(self, z, mask, reverse: bool = False):
        layers = [ResidualCouplingLayer(self.channels, self.hidden,
                                        name=f"flow{i}")
                  for i in range(self.n_flows)]
        order = reversed(layers) if reverse else layers
        for l in order:
            if reverse:
                # forward step is flip∘C; inverse is C⁻¹∘flip
                z = l(jnp.flip(z, -1), mask, reverse=True)
            else:
                z = jnp.flip(l(z, mask, reverse=False), -1)
        return z


class TextPrior(nn.Module):
    """tokens → hidden h [B,U,D] + prior stats (m_p, logs_p) [B,U,C_lat]."""

    n_symbols: int
    d_model: int = 192
    n_layers: int = 4
    n_heads: int = 2
    latent_channels: int = 192

    @nn.compact
    def __call__(self, tokens, text_mask, *, train: bool = False):
        x = nn.Embed(self.n_symbols, self.d_model, name="emb")(tokens)
        x = x * math.sqrt(self.d_model)
        x = FFTransformer(self.n_layers, self.d_model, self.n_heads,
                          4 * self.d_model, dropout=0.1, name="encoder")(
            x, text_mask, train=train)
        stats = nn.Dense(2 * self.latent_channels, name="proj")(x)
        mp, logs_p = jnp.split(stats, 2, axis=-1)
        return x, mp, logs_p


def mas_durations(z_p, m_p, logs_p, text_mask, mel_mask):
    """Monotonic alignment search (vits monotonic_align): hard path
    maximizing Σ log N(z_p[t]; m_p[u], s_p[u]) — our aligner Viterbi on the
    per-frame token log-likelihood lattice."""
    # ll[b, t, u] = -0.5*(log(2π) + 2logs_p) - 0.5 (z_p - m_p)^2 e^{-2 logs_p}
    neg = -0.5 * math.log(2 * math.pi) - logs_p  # [B,U,C] summed later
    ll = (
        jnp.einsum("btc,buc->btu", z_p, m_p * jnp.exp(-2 * logs_p))
        - 0.5 * jnp.einsum("btc,buc->btu", z_p ** 2, jnp.exp(-2 * logs_p))
        - 0.5 * jnp.sum(m_p ** 2 * jnp.exp(-2 * logs_p), -1)[:, None, :]
        + jnp.sum(neg, -1)[:, None, :]
    )
    ll = jnp.where(text_mask[:, None, :], ll, -1e30)
    ll = jnp.where(mel_mask[:, :, None], ll, -1e30)
    text_len = jnp.sum(text_mask, -1).astype(jnp.int32)
    mel_len = jnp.sum(mel_mask, -1).astype(jnp.int32)
    dur = viterbi_durations(ll, text_len, mel_len)
    return jax.lax.stop_gradient(dur)


def slice_segments(x, starts, seg: int):
    """[B, T, C] gather of seg frames from per-element starts (vits
    rand_slice_segments)."""
    idx = starts[:, None] + jnp.arange(seg)[None, :]
    return jnp.take_along_axis(x, idx[..., None], axis=1)


class VITSModule(nn.Module):
    n_symbols: int
    spec_channels: int = 80
    latent_channels: int = 96
    d_model: int = 96
    prior_layers: int = 2
    n_flows: int = 2
    segment_frames: int = 16
    upsample_rates: Sequence[int] = (8, 8, 2, 2)
    upsample_initial_channel: int = 128

    def setup(self):
        self.prior = TextPrior(self.n_symbols, self.d_model,
                               self.prior_layers,
                               latent_channels=self.latent_channels)
        self.posterior = PosteriorEncoder(self.latent_channels,
                                          hidden=self.latent_channels)
        self.flow = Flow(self.latent_channels, self.n_flows,
                         hidden=self.latent_channels)
        self.decoder = Generator(
            upsample_rates=tuple(self.upsample_rates),
            upsample_kernel_sizes=tuple(2 * r for r in self.upsample_rates),
            upsample_initial_channel=self.upsample_initial_channel,
        )
        self.dur_predictor = TemporalPredictor(filter_size=self.d_model)

    @property
    def hop(self) -> int:
        h = 1
        for r in self.upsample_rates:
            h *= r
        return h

    def __call__(self, tokens, token_len, spec, mel_len, rng,
                 *, train: bool = False):
        """Training pass → dict of pieces for the VITS losses."""
        B, _, T = spec.shape
        U = tokens.shape[1]
        text_mask = jnp.arange(U)[None] < token_len[:, None]
        mel_mask = jnp.arange(T)[None] < mel_len[:, None]

        h_text, m_p_u, logs_p_u = self.prior(tokens, text_mask, train=train)
        r1, r2, r3 = jax.random.split(rng, 3)
        z, m_q, logs_q = self.posterior(spec, mel_mask, r1)
        z_p = self.flow(z, mel_mask, reverse=False)

        dur = mas_durations(z_p, m_p_u, logs_p_u, text_mask, mel_mask)
        # expand prior stats to frame rate along the MAS path
        m_p, _ = regulate_length(dur, m_p_u, T)
        logs_p, _ = regulate_length(dur, logs_p_u, T)

        # duration predictor on log-durations (vits DP loss)
        log_dur_pred = self.dur_predictor(h_text, text_mask, train=train)
        log_dur_tgt = jnp.log(jnp.maximum(dur.astype(jnp.float32), 1e-4))
        dur_loss = jnp.sum(
            jnp.where(text_mask, (log_dur_pred - log_dur_tgt) ** 2, 0.0)
        ) / jnp.maximum(jnp.sum(text_mask), 1)

        # KL(q || p) under the alignment
        kl = logs_p - logs_q - 0.5 + 0.5 * (
            jnp.exp(2 * logs_q) + (z_p - m_p) ** 2) * jnp.exp(-2 * logs_p)
        kl = jnp.sum(jnp.where(mel_mask[..., None], kl, 0.0)) / jnp.maximum(
            jnp.sum(mel_mask) * self.latent_channels, 1)

        # decode a random latent segment
        seg = self.segment_frames
        max_start = jnp.maximum(mel_len - seg, 0)
        starts = (jax.random.uniform(r2, (B,)) * (max_start + 1)).astype(jnp.int32)
        z_slice = slice_segments(z, starts, seg)
        audio = self.decoder(jnp.transpose(z_slice, (0, 2, 1)))
        return {"audio_seg": audio, "starts": starts, "kl": kl,
                "dur_loss": dur_loss, "durations": dur}

    def infer(self, tokens, token_len, rng, max_frames: int = 200,
              noise_scale: float = 0.667, pace: float = 1.0):
        U = tokens.shape[1]
        text_mask = jnp.arange(U)[None] < token_len[:, None]
        h_text, m_p_u, logs_p_u = self.prior(tokens, text_mask, train=False)
        log_dur = self.dur_predictor(h_text, text_mask, train=False)
        dur = jnp.round(jnp.exp(log_dur) / pace).astype(jnp.int32)
        dur = jnp.where(text_mask, jnp.maximum(dur, 1), 0)
        m_p, mel_len = regulate_length(dur, m_p_u, max_frames)
        logs_p, _ = regulate_length(dur, logs_p_u, max_frames)
        mel_mask = jnp.arange(max_frames)[None] < mel_len[:, None]
        z_p = m_p + jax.random.normal(rng, m_p.shape) * jnp.exp(logs_p) * noise_scale
        z = self.flow(z_p * mel_mask[..., None], mel_mask, reverse=True)
        audio = self.decoder(jnp.transpose(z, (0, 2, 1)))
        return audio, mel_len * self.hop
