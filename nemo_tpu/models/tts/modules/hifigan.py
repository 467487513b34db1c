"""HiFi-GAN modules (TPU-native).

Reference parity: `nemo/collections/tts/modules/hifigan_modules.py` —
Generator (`:182`): pre-conv → N× [transposed-conv upsample → MRF (multi-
receptive-field fusion of ResBlocks, `:65,138`)] → post-conv → tanh;
MultiPeriodDiscriminator + MultiScaleDiscriminator for GAN training.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from nemo_tpu.core.neural_types import (
    AudioSignal, MelSpectrogramType, NeuralType, typecheck,
)

LRELU_SLOPE = 0.1


def lrelu(x):
    return nn.leaky_relu(x, LRELU_SLOPE)


class ResBlock1(nn.Module):
    """3-layer dilated resblock (hifigan ResBlock1, kernel k, dilations d)."""

    channels: int
    kernel: int = 3
    dilations: Sequence[int] = (1, 3, 5)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            pad = (self.kernel - 1) * d // 2
            h = lrelu(x)
            h = nn.Conv(self.channels, (self.kernel,), kernel_dilation=(d,),
                        padding=[(pad, pad)], name=f"c1_{i}")(h)
            h = lrelu(h)
            pad2 = (self.kernel - 1) // 2
            h = nn.Conv(self.channels, (self.kernel,), padding=[(pad2, pad2)], name=f"c2_{i}")(h)
            x = x + h
        return x


class Generator(nn.Module):
    """Mel [B, n_mels, T] → waveform [B, T*prod(upsample_rates)].

    Defaults = HiFi-GAN V1 (reference hifigan config)."""

    upsample_rates: Sequence[int] = (8, 8, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5),) * 3

    # semantic ports (reference: hifigan_modules.py Generator input_types)
    @property
    def input_types(self):
        return {"mel": NeuralType(("B", "D", "T"), MelSpectrogramType())}

    @property
    def output_types(self):
        return {"audio": NeuralType(("B", "T"), AudioSignal())}

    @typecheck
    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        x = jnp.transpose(mel, (0, 2, 1))  # [B, T, n_mels]
        x = nn.Conv(self.upsample_initial_channel, (7,), padding=[(3, 3)], name="pre")(x)
        ch = self.upsample_initial_channel
        for i, (r, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            ch //= 2
            x = lrelu(x)
            # torch ConvTranspose1d semantics: out = (in-1)*r + k - 2*pad with
            # pad=(k-r)//2 → upsample exactly ×r. flax padding differs, so use
            # VALID ((in-1)*r + k) and crop pad from both ends.
            pad = (k - r) // 2
            x = nn.ConvTranspose(ch, (k,), strides=(r,), padding="VALID", name=f"up{i}")(x)
            x = x[:, pad : x.shape[1] - pad]
            acc = None
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
            ):
                h = ResBlock1(ch, rk, tuple(rd), name=f"res{i}_{j}")(x)
                acc = h if acc is None else acc + h
            x = acc / len(self.resblock_kernel_sizes)
        x = lrelu(x)
        x = nn.Conv(1, (7,), padding=[(3, 3)], name="post")(x)
        return jnp.tanh(x)[..., 0]  # [B, T_audio]


class PeriodDiscriminator(nn.Module):
    period: int

    @nn.compact
    def __call__(self, audio: jnp.ndarray):
        B, T = audio.shape
        pad = (-T) % self.period
        x = jnp.pad(audio, ((0, 0), (0, pad)), mode="reflect" if T > 1 else "constant")
        x = x.reshape(B, -1, self.period, 1)  # [B, T/p, p, 1]
        feats = []
        ch = 32
        for i in range(4):
            x = nn.Conv(ch, (5, 1), strides=(3, 1), padding=[(2, 2), (0, 0)], name=f"c{i}")(x)
            x = lrelu(x)
            feats.append(x)
            ch = min(ch * 4, 1024)
        x = nn.Conv(1024, (5, 1), padding=[(2, 2), (0, 0)], name="c4")(x)
        x = lrelu(x)
        feats.append(x)
        x = nn.Conv(1, (3, 1), padding=[(1, 1), (0, 0)], name="out")(x)
        feats.append(x)
        return x.reshape(B, -1), feats


class ScaleDiscriminator(nn.Module):
    @nn.compact
    def __call__(self, audio: jnp.ndarray):
        x = audio[..., None]  # [B, T, 1]
        feats = []
        cfgs = [
            (128, 15, 1, 1), (128, 41, 2, 4), (256, 41, 2, 16), (512, 41, 4, 16),
            (1024, 41, 4, 16), (1024, 41, 1, 16), (1024, 5, 1, 1),
        ]
        for i, (ch, k, s, g) in enumerate(cfgs):
            pad = (k - 1) // 2
            x = nn.Conv(ch, (k,), strides=(s,), padding=[(pad, pad)],
                        feature_group_count=g if x.shape[-1] % g == 0 else 1,
                        name=f"c{i}")(x)
            x = lrelu(x)
            feats.append(x)
        x = nn.Conv(1, (3,), padding=[(1, 1)], name="out")(x)
        feats.append(x)
        return x.reshape(audio.shape[0], -1), feats


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, real, fake):
        outs = []
        for p in self.periods:
            d = PeriodDiscriminator(p, name=f"p{p}")
            outs.append((d(real), d(fake)))
        return outs


class MultiScaleDiscriminator(nn.Module):
    n_scales: int = 3

    @nn.compact
    def __call__(self, real, fake):
        outs = []
        r, f = real, fake
        for i in range(self.n_scales):
            d = ScaleDiscriminator(name=f"s{i}")
            outs.append((d(r), d(f)))
            if i < self.n_scales - 1:
                r = nn.avg_pool(r[..., None], (4,), strides=(2,), padding=[(2, 2)])[..., 0]
                f = nn.avg_pool(f[..., None], (4,), strides=(2,), padding=[(2, 2)])[..., 0]
        return outs


def generator_loss(disc_outs):
    """LSGAN generator + feature-matching losses."""
    adv, fm = 0.0, 0.0
    for (r_out, r_feats), (f_out, f_feats) in disc_outs:
        adv += jnp.mean(jnp.square(f_out - 1.0))
        for rf, ff in zip(r_feats, f_feats):
            fm += jnp.mean(jnp.abs(jax.lax.stop_gradient(rf) - ff))
    return adv, fm


def discriminator_loss(disc_outs):
    loss = 0.0
    for (r_out, _), (f_out, _) in disc_outs:
        loss += jnp.mean(jnp.square(r_out - 1.0)) + jnp.mean(jnp.square(f_out))
    return loss
