"""Neural audio codec modules: conv encoder/decoder + residual VQ.

Reference parity: `nemo/collections/tts/models/audio_codec.py` +
`tts/modules/audio_codec_modules.py` (SEANet-style conv encoder/decoder,
ResidualVectorQuantizer with straight-through gradients, codebook +
commitment losses).

TPU-first: all convs are lax-backed flax Conv/ConvTranspose over [B,T,C]
(MXU-friendly channels-last); RVQ codebook lookup is one argmin matmul
per level; straight-through keeps the whole codec in a single jitted
train step.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _elu(x):
    return nn.elu(x)


class _EncBlock(nn.Module):
    channels: int
    stride: int

    @nn.compact
    def __call__(self, x):  # [B, T, C]
        h = _elu(x)
        h = nn.Conv(self.channels // 2, (3,), padding="SAME", name="res1")(h)
        h = _elu(h)
        h = nn.Conv(x.shape[-1], (1,), name="res2")(h)
        x = x + h
        x = _elu(x)
        return nn.Conv(self.channels, (2 * self.stride,),
                       strides=(self.stride,), padding="SAME", name="down")(x)


class _DecBlock(nn.Module):
    channels: int
    stride: int

    @nn.compact
    def __call__(self, x):
        x = _elu(x)
        x = nn.ConvTranspose(self.channels, (2 * self.stride,),
                             strides=(self.stride,), padding="SAME", name="up")(x)
        h = _elu(x)
        h = nn.Conv(self.channels // 2, (3,), padding="SAME", name="res1")(h)
        h = _elu(h)
        h = nn.Conv(self.channels, (1,), name="res2")(h)
        return x + h


class CodecEncoder(nn.Module):
    base_channels: int = 32
    strides: Sequence[int] = (2, 4, 5, 8)  # prod = 320 samples/frame
    latent_dim: int = 128

    @nn.compact
    def __call__(self, audio):  # [B, T] → [B, F, latent]
        x = nn.Conv(self.base_channels, (7,), padding="SAME", name="stem")(
            audio[..., None])
        ch = self.base_channels
        for i, s in enumerate(self.strides):
            ch *= 2
            x = _EncBlock(ch, s, name=f"block{i}")(x)
        x = _elu(x)
        return nn.Conv(self.latent_dim, (3,), padding="SAME", name="head")(x)


class CodecDecoder(nn.Module):
    base_channels: int = 32
    strides: Sequence[int] = (8, 5, 4, 2)
    latent_dim: int = 128

    @nn.compact
    def __call__(self, z):  # [B, F, latent] → [B, T]
        ch = self.base_channels * 2 ** len(self.strides)
        x = nn.Conv(ch, (7,), padding="SAME", name="stem")(z)
        for i, s in enumerate(self.strides):
            ch //= 2
            x = _DecBlock(ch, s, name=f"block{i}")(x)
        x = _elu(x)
        x = nn.Conv(1, (7,), padding="SAME", name="head")(x)
        return jnp.tanh(x[..., 0])


class ResidualVectorQuantizer(nn.Module):
    """N-level residual VQ with straight-through gradients.

    Per level: nearest codebook entry of the running residual; the sum of
    selected entries approximates z. Losses (returned, caller-weighted):
    codebook loss ‖sg(z)−q‖² trains the codebooks, commitment loss
    ‖z−sg(q)‖² keeps the encoder close to them."""

    num_levels: int = 8
    codebook_size: int = 1024
    dim: int = 128

    @nn.compact
    def __call__(self, z) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        residual = z
        quantized = jnp.zeros_like(z)
        codes = []
        cb_loss = 0.0
        for l in range(self.num_levels):
            book = self.param(f"codebook{l}", nn.initializers.normal(1.0),
                              (self.codebook_size, self.dim), jnp.float32)
            d = (jnp.sum(residual**2, -1, keepdims=True)
                 - 2 * residual @ book.T
                 + jnp.sum(book**2, -1)[None, None, :])
            idx = jnp.argmin(d, -1)  # [B, F]
            q = jnp.take(book, idx, axis=0)
            cb_loss = cb_loss + jnp.mean(
                jnp.square(jax.lax.stop_gradient(residual) - q))
            quantized = quantized + q
            residual = residual - jax.lax.stop_gradient(q)
            codes.append(idx)
        commit = jnp.mean(jnp.square(z - jax.lax.stop_gradient(quantized)))
        # straight-through: decoder sees quantized, encoder grads flow as if id
        out = z + jax.lax.stop_gradient(quantized - z)
        return out, jnp.stack(codes, 1), cb_loss / self.num_levels + 0.25 * commit

    def decode_codes(self, codes) -> jnp.ndarray:
        """codes [B, L, F] → summed embeddings [B, F, dim]."""
        out = 0.0
        for l in range(self.num_levels):
            book = self.get_variable("params", f"codebook{l}")
            out = out + jnp.take(book, codes[:, l], axis=0)
        return out


def multiscale_mel_loss(pred: jnp.ndarray, target: jnp.ndarray,
                        sample_rate: int = 16000,
                        window_sizes: Sequence[int] = (512, 1024, 2048)) -> jnp.ndarray:
    """L1 over log-mels at several resolutions (reference
    MultiResolutionMelLoss in audio_codec losses)."""
    from nemo_tpu.ops.audio import MelSpectrogramConfig, mel_spectrogram

    loss = 0.0
    B = pred.shape[0]
    lens = jnp.full((B,), pred.shape[1], jnp.int32)
    for w in window_sizes:
        cfg = MelSpectrogramConfig(
            sample_rate=sample_rate, features=64, n_fft=w,
            window_size=w / sample_rate, window_stride=w / (4 * sample_rate),
            normalize="none", preemph=None, dither=0.0,
            log_zero_guard_value=1e-5)
        mp, _ = mel_spectrogram(pred, lens, cfg, training=False)
        mt, _ = mel_spectrogram(target, lens, cfg, training=False)
        loss = loss + jnp.mean(jnp.abs(mp - mt))
    return loss / len(window_sizes)
