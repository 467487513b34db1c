"""UnivNet: location-variable-convolution GAN vocoder.

Reference parity: `nemo/collections/tts/models/univnet.py` +
`modules/univnet_modules.py` (Generator of LVCBlocks: a kernel predictor
convnet on the mel produces per-frame conv kernels applied to the
upsampled noise signal through gated activations; trained with the same
MPD + multi-resolution STFT discriminators family).

TPU-native LVC: the audio-rate signal is viewed as [B, F, hop·up, C]
windows aligned to mel frames; the location-variable convolution is ONE
einsum between unfolded windows and the per-frame predicted kernels —
batched MXU work, no per-position scatter. Kernels are predicted once per
frame (static shapes), matching the reference's hop-wise kernel sharing.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def location_variable_conv(x: jnp.ndarray, kernels: jnp.ndarray,
                           bias: jnp.ndarray, hop: int) -> jnp.ndarray:
    """x [B, T, Cin] with T = F·hop; kernels [B, F, K, Cin, Cout];
    bias [B, F, Cout] → [B, T, Cout]; 'same' causal-centered padding."""
    B, T, Cin = x.shape
    F, K, _, Cout = kernels.shape[1:]
    pad = (K - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pad, K - 1 - pad), (0, 0)))
    # unfold: window position t needs xp[t : t+K]
    idx = jnp.arange(T)[:, None] + jnp.arange(K)[None, :]  # [T, K]
    windows = xp[:, idx]  # [B, T, K, Cin]
    windows = windows.reshape(B, F, hop, K, Cin)
    out = jnp.einsum("bfhki,bfkio->bfho", windows, kernels)
    out = out + bias[:, :, None, :]
    return out.reshape(B, T, Cout)


class KernelPredictor(nn.Module):
    """Mel → per-frame LVC kernels/bias (univnet_modules.KernelPredictor)."""

    channels: int  # conv channels of the LVC signal
    kernel_size: int = 3
    hidden: int = 64
    layers_per_block: int = 2

    @nn.compact
    def __call__(self, mel):  # [B, F, n_mels]
        h = nn.Conv(self.hidden, (5,), padding="SAME", name="pre")(mel)
        h = nn.leaky_relu(h, 0.1)
        h = nn.Conv(self.hidden, (3,), padding="SAME", name="mid")(h)
        h = nn.leaky_relu(h, 0.1)
        C, K = self.channels, self.kernel_size
        n_k = self.layers_per_block * K * C * 2 * C  # gated: 2C outputs
        n_b = self.layers_per_block * 2 * C
        kern = nn.Conv(n_k, (3,), padding="SAME", name="kernel_out")(h)
        bias = nn.Conv(n_b, (3,), padding="SAME", name="bias_out")(h)
        B, F = mel.shape[:2]
        kern = kern.reshape(B, F, self.layers_per_block, K, C, 2 * C)
        bias = bias.reshape(B, F, self.layers_per_block, 2 * C)
        return kern, bias


class LVCBlock(nn.Module):
    channels: int
    upsample: int
    kernel_size: int = 3
    layers: int = 2

    @nn.compact
    def __call__(self, x, mel):
        """x [B, T, C] audio-rate, mel [B, F, n_mels]; T·up = F·hop_out."""
        up = self.upsample
        # transposed-conv upsample ×up
        k = 2 * up
        pad = (k - up) // 2
        x = nn.ConvTranspose(self.channels, (k,), strides=(up,),
                             padding="VALID", name="up")(
            nn.leaky_relu(x, 0.2))
        x = x[:, pad: x.shape[1] - (k - up - pad)]
        kern, bias = KernelPredictor(
            self.channels, self.kernel_size, layers_per_block=self.layers,
            name="kp")(mel)
        T = x.shape[1]
        F = mel.shape[1]
        hop = T // F
        x = x[:, : F * hop]
        for l in range(self.layers):
            h = location_variable_conv(
                nn.leaky_relu(x, 0.2), kern[:, :, l], bias[:, :, l], hop)
            a, b = jnp.split(h, 2, axis=-1)
            x = x + jnp.tanh(a) * jax.nn.sigmoid(b)  # gated residual
        return x


class UnivNetGenerator(nn.Module):
    """mel [B, n_mels, F] (+ noise) → waveform [B, F·prod(upsamples)]."""

    n_mels: int = 80
    noise_dim: int = 64
    channels: int = 32
    upsamples: Sequence[int] = (8, 8, 4)

    @nn.compact
    def __call__(self, mel, rng):
        m = jnp.transpose(mel, (0, 2, 1))  # [B, F, n_mels]
        B, F = m.shape[:2]
        z = jax.random.normal(rng, (B, F, self.noise_dim))
        x = nn.Conv(self.channels, (7,), padding="SAME", name="pre")(z)
        for i, up in enumerate(self.upsamples):
            x = LVCBlock(self.channels, up, name=f"lvc{i}")(x, m)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(1, (7,), padding="SAME", name="post")(x)
        return jnp.tanh(x)[..., 0]
