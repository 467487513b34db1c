"""Hyena operator: sub-quadratic implicit long-convolution sequence mixer.

Reference parity: the in-repo Megatron hyena mixer used by Evo2
(`nemo/collections/llm/gpt/model/megatron/hyena/hyena_mixer.py` +
`hyena_filter` modules): per-channel implicit long filters (MLP over
positional features, exponentially windowed), short explicit depthwise
convs on the projections, and multiplicative gating between projection
branches.

TPU-native: the long convolution is an FFT circular convolution
(zero-padded to 2T for causality) — `jnp.fft.rfft` lowers to XLA FFT which
runs on-chip; everything is static-shaped and jit/scan friendly. The FFT
path makes token mixing O(T log T) instead of attention's O(T²).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def fft_causal_conv(u: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Causal per-channel convolution via FFT.

    u [B, T, D], h [T, D] (filter taps, tap 0 = current step) → [B, T, D].
    """
    T = u.shape[1]
    n = 2 * T
    Uf = jnp.fft.rfft(u.astype(jnp.float32), n=n, axis=1)
    Hf = jnp.fft.rfft(h.astype(jnp.float32), n=n, axis=0)
    y = jnp.fft.irfft(Uf * Hf[None], n=n, axis=1)[:, :T]
    return y.astype(u.dtype)


class ImplicitFilter(nn.Module):
    """h(t) = window(t) · MLP(positional features)(t) per channel
    (reference hyena filter: sine-activated MLP + exponential decay)."""

    d_model: int
    filter_order: int = 16  # MLP width
    n_freqs: int = 8
    decay_fast: float = 0.3
    decay_slow: float = 1e-2

    @nn.compact
    def __call__(self, T: int) -> jnp.ndarray:
        t = jnp.arange(T, dtype=jnp.float32)[:, None] / max(T, 1)  # [T,1]
        freqs = jnp.arange(1, self.n_freqs + 1, dtype=jnp.float32)[None, :]
        feats = jnp.concatenate(
            [t, jnp.sin(2 * math.pi * freqs * t), jnp.cos(2 * math.pi * freqs * t)],
            axis=-1,
        )  # [T, 2F+1]
        h = nn.Dense(self.filter_order, name="fc1")(feats)
        h = jnp.sin(h)
        h = nn.Dense(self.filter_order, name="fc2")(h)
        h = jnp.sin(h)
        h = nn.Dense(self.d_model, name="out")(h)  # [T, D]
        # per-channel exponential window between fast and slow decay
        alpha = jax.nn.sigmoid(
            self.param("decay", nn.initializers.normal(1.0), (self.d_model,)))
        rate = self.decay_fast * alpha + self.decay_slow * (1 - alpha)
        window = jnp.exp(-rate[None, :] * jnp.arange(T, dtype=jnp.float32)[:, None])
        bias = self.param("bias", nn.initializers.zeros, (self.d_model,))
        return h * window + bias[None, :] * (jnp.arange(T)[:, None] == 0)


class ShortConv(nn.Module):
    """Causal depthwise short conv (reference hyena short_conv, k=3)."""

    d_model: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.d_model, (self.kernel_size,),
                       padding=[(self.kernel_size - 1, 0)],
                       feature_group_count=self.d_model, name="conv")(x)


class HyenaOperator(nn.Module):
    """Order-N hyena recurrence: z ← x_o ⊙ (h_o * z) (reference
    hyena_mixer.py). Input/output [B, T, D]."""

    d_model: int
    order: int = 2
    filter_order: int = 16

    @nn.compact
    def __call__(self, u: jnp.ndarray) -> jnp.ndarray:
        B, T, D = u.shape
        # one fused projection for v + order gates, each short-conv'd
        p = nn.Dense((self.order + 1) * D, name="in_proj")(u)
        p = ShortConv((self.order + 1) * D, name="short")(p)
        splits = jnp.split(p, self.order + 1, axis=-1)
        v, gates = splits[0], splits[1:]
        z = v
        for o, x_o in enumerate(gates):
            h = ImplicitFilter(D, self.filter_order, name=f"filter{o}")(T)
            z = x_o * fft_causal_conv(z, h)
        return nn.Dense(D, name="out_proj")(z)


class HyenaBlock(nn.Module):
    """Pre-norm hyena mixer + gated MLP (Evo2 block layout)."""

    d_model: int
    ffn_mult: int = 4
    order: int = 2

    @nn.compact
    def __call__(self, x):
        h = nn.RMSNorm(name="norm1")(x)
        x = x + HyenaOperator(self.d_model, self.order, name="mixer")(h)
        h = nn.RMSNorm(name="norm2")(x)
        g = nn.Dense(self.d_model * self.ffn_mult, name="gate")(h)
        up = nn.Dense(self.d_model * self.ffn_mult, name="up")(h)
        h = nn.silu(g) * up
        return x + nn.Dense(self.d_model, name="down")(h)


class HyenaLM(nn.Module):
    """Compact hyena language model (Evo2-style striped stack: hyena blocks
    with optional interleaved attention handled by the hybrid ssm stack —
    here the pure-hyena column; reference evo2 model family)."""

    vocab_size: int
    d_model: int = 256
    n_layers: int = 4
    order: int = 2

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        x = nn.Embed(self.vocab_size, self.d_model, name="embed")(tokens)
        for i in range(self.n_layers):
            x = HyenaBlock(self.d_model, order=self.order, name=f"block{i}")(x)
        x = nn.RMSNorm(name="final_norm")(x)
        emb = self.variables["params"]["embed"]["embedding"]
        return x @ emb.T.astype(x.dtype)


def evo2_1b(**kw) -> HyenaLM:
    """Evo2-1B-class pure-hyena column (reference: llm/recipes/hyena_1b.py /
    gpt/model/hyena.py Hyena1bConfig; byte-level vocab)."""
    d = dict(vocab_size=512, d_model=1920, n_layers=25, order=2)
    d.update(kw)
    return HyenaLM(**d)


def evo2_7b(**kw) -> HyenaLM:
    """(reference: recipes/hyena_7b.py — 4096×32 striped stack)"""
    d = dict(vocab_size=512, d_model=4096, n_layers=32, order=2)
    d.update(kw)
    return HyenaLM(**d)


def evo2_40b(**kw) -> HyenaLM:
    """(reference: recipes/hyena_40b.py — 8192×50 striped stack)"""
    d = dict(vocab_size=512, d_model=8192, n_layers=50, order=2)
    d.update(kw)
    return HyenaLM(**d)
