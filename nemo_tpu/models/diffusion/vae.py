"""Continuous KL autoencoder for latent diffusion (Flux-style AutoEncoder).

Reference parity: `nemo/collections/diffusion/vae/autoencoder.py`
(Encoder/Decoder resnet towers with mid attention, DiagonalGaussian,
scale/shift latent normalization) and `vae/train_vae.py` (recon + KL
training). TPU-first: NHWC layout throughout (XLA convs tile NHWC onto
the MXU directly), GroupNorm+SiLU fused by XLA, attention mid-block as
one einsum over the flattened spatial grid, and the whole train step is
a pure function for jit.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AutoEncoderKLConfig:
    in_channels: int = 3
    ch: int = 32                       # base width
    ch_mult: Sequence[int] = (1, 2, 4)  # per-resolution width multipliers
    num_res_blocks: int = 2
    z_channels: int = 4
    # latent normalization (Flux: scale 0.3611 / shift 0.1159)
    scale_factor: float = 0.3611
    shift_factor: float = 0.1159
    kl_weight: float = 1e-6

    @property
    def downscale(self) -> int:
        return 2 ** (len(self.ch_mult) - 1)


def _gn(x, name=None):
    groups = min(32, x.shape[-1])
    while x.shape[-1] % groups:
        groups -= 1
    return nn.GroupNorm(num_groups=groups, name=name)(x)


class ResnetBlock(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x):
        h = nn.silu(_gn(x, "norm1"))
        h = nn.Conv(self.out_ch, (3, 3), name="conv1")(h)
        h = nn.silu(_gn(h, "norm2"))
        h = nn.Conv(self.out_ch, (3, 3), name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head self-attention over the flattened spatial grid."""

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = _gn(x, "norm")
        q = nn.Conv(C, (1, 1), name="q")(h).reshape(B, H * W, C)
        k = nn.Conv(C, (1, 1), name="k")(h).reshape(B, H * W, C)
        v = nn.Conv(C, (1, 1), name="v")(h).reshape(B, H * W, C)
        att = jax.nn.softmax(
            jnp.einsum("bsc,btc->bst", q, k).astype(jnp.float32)
            / jnp.sqrt(C).astype(jnp.float32), -1).astype(x.dtype)
        h = jnp.einsum("bst,btc->bsc", att, v).reshape(B, H, W, C)
        return x + nn.Conv(C, (1, 1), name="proj_out")(h)


class Encoder(nn.Module):
    cfg: AutoEncoderKLConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = nn.Conv(cfg.ch, (3, 3), name="conv_in")(x)
        for i, mult in enumerate(cfg.ch_mult):
            for j in range(cfg.num_res_blocks):
                h = ResnetBlock(cfg.ch * mult, name=f"down{i}_block{j}")(h)
            if i != len(cfg.ch_mult) - 1:
                h = nn.Conv(h.shape[-1], (3, 3), strides=(2, 2),
                            name=f"down{i}_downsample")(h)
        h = ResnetBlock(h.shape[-1], name="mid_block1")(h)
        h = AttnBlock(name="mid_attn")(h)
        h = ResnetBlock(h.shape[-1], name="mid_block2")(h)
        h = nn.silu(_gn(h, "norm_out"))
        # double z: mean and logvar
        return nn.Conv(2 * cfg.z_channels, (3, 3), name="conv_out")(h)


class Decoder(nn.Module):
    cfg: AutoEncoderKLConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        h = nn.Conv(cfg.ch * cfg.ch_mult[-1], (3, 3), name="conv_in")(z)
        h = ResnetBlock(h.shape[-1], name="mid_block1")(h)
        h = AttnBlock(name="mid_attn")(h)
        h = ResnetBlock(h.shape[-1], name="mid_block2")(h)
        for i in reversed(range(len(cfg.ch_mult))):
            for j in range(cfg.num_res_blocks + 1):
                h = ResnetBlock(cfg.ch * cfg.ch_mult[i],
                                name=f"up{i}_block{j}")(h)
            if i != 0:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, 2 * H, 2 * W, C), "nearest")
                h = nn.Conv(C, (3, 3), name=f"up{i}_upsample")(h)
        h = nn.silu(_gn(h, "norm_out"))
        return nn.Conv(cfg.in_channels, (3, 3), name="conv_out")(h)


class AutoEncoderKL(nn.Module):
    """encode() → (mean, logvar); decode() inverts; __call__ reconstructs.

    Latents handed to diffusion are `(sample − shift) · scale` (encode_
    latent) and decoded via the inverse (decode_latent) — the Flux latent
    convention."""

    cfg: AutoEncoderKLConfig

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)

    def encode(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z):
        return self.decoder(z)

    def encode_latent(self, x, rng=None):
        mean, logvar = self.encode(x)
        z = mean if rng is None else (
            mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mean.shape, mean.dtype))
        return (z - self.cfg.shift_factor) * self.cfg.scale_factor

    def decode_latent(self, z):
        return self.decode(z / self.cfg.scale_factor + self.cfg.shift_factor)

    def __call__(self, x, rng=None):
        mean, logvar = self.encode(x)
        z = mean if rng is None else (
            mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mean.shape, mean.dtype))
        return self.decode(z), mean, logvar


def vae_loss(model: AutoEncoderKL, params, rng, x):
    """Reconstruction (L1) + KL-to-N(0,1) (contperceptual_loss.py minus the
    perceptual/GAN terms, which need pretrained towers)."""
    recon, mean, logvar = model.apply({"params": params}, x, rng)
    rec = jnp.mean(jnp.abs(recon - x))
    kl = 0.5 * jnp.mean(
        jnp.sum(jnp.square(mean) + jnp.exp(logvar) - 1.0 - logvar, axis=-1))
    return rec + model.cfg.kl_weight * kl, {"rec": rec, "kl": kl}
