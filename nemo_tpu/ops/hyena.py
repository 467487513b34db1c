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
    hyena_mixer.py). Input/output [B, T, D].

    operator_type selects the Evo2 striped-stack mixer family
    (reference megatron/hyena/hyena_config.py + hybrid_override_pattern):
    - "long"   ('H'): implicit sine-MLP filter over the full sequence
    - "medium" ('D'): explicit grouped taps, hyena_medium_conv_len=128
    - "short"  ('S'): explicit grouped taps, hyena_short_conv_len=7
    Grouped taps share one filter across D//groups channels."""

    d_model: int
    order: int = 2
    filter_order: int = 16
    operator_type: str = "long"  # "long" | "medium" | "short"
    groups: Optional[int] = None  # explicit-filter groups (medium/short)

    def _filter(self, o: int, T: int) -> jnp.ndarray:
        D = self.d_model
        if self.operator_type == "long":
            return ImplicitFilter(D, self.filter_order, name=f"filter{o}")(T)
        L = 7 if self.operator_type == "short" else 128
        G = self.groups or D
        taps = self.param(f"taps{o}", nn.initializers.normal(0.02), (L, G))
        taps = jnp.repeat(taps, D // G, axis=1)  # share across group
        h = jnp.zeros((T, D), taps.dtype)
        return h.at[: min(L, T)].set(taps[: min(L, T)])

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
            z = x_o * fft_causal_conv(z, self._filter(o, T))
        return nn.Dense(D, name="out_proj")(z)


def _gated_mlp(x, d_model: int, d_ff: int):
    g = nn.Dense(d_ff, name="gate")(x)
    up = nn.Dense(d_ff, name="up")(x)
    return nn.Dense(d_model, name="down")(nn.silu(g) * up)


class HyenaBlock(nn.Module):
    """Pre-norm hyena mixer + gated MLP (Evo2 block layout)."""

    d_model: int
    ffn_mult: int = 4
    order: int = 2
    operator_type: str = "long"
    groups: Optional[int] = None
    d_ff: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        h = nn.RMSNorm(name="norm1")(x)
        x = x + HyenaOperator(self.d_model, self.order,
                              operator_type=self.operator_type,
                              groups=self.groups, name="mixer")(h)
        h = nn.RMSNorm(name="norm2")(x)
        h = _gated_mlp(h, self.d_model, self.d_ff or self.d_model * self.ffn_mult)
        return x + h


class HyenaAttentionBlock(nn.Module):
    """'*' blocks of the Evo2 striped stack: pre-norm causal MHA with
    rotary positions + the same gated MLP (reference hyena.py attention
    layers in hybrid_override_pattern)."""

    d_model: int
    n_heads: int
    d_ff: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        B, T, D = x.shape
        H = self.n_heads
        dh = D // H
        h = nn.RMSNorm(name="norm1")(x)
        q = nn.Dense(D, use_bias=False, name="q")(h).reshape(B, T, H, dh)
        k = nn.Dense(D, use_bias=False, name="k")(h).reshape(B, T, H, dh)
        v = nn.Dense(D, use_bias=False, name="v")(h).reshape(B, T, H, dh)
        # rotary
        half = dh // 2
        inv = 1.0 / (10000.0 ** (jnp.arange(0, half, dtype=jnp.float32) / half))
        ang = jnp.arange(T, dtype=jnp.float32)[:, None] * inv[None]
        cos, sin = jnp.cos(ang)[None, :, None, :], jnp.sin(ang)[None, :, None, :]

        def rope(t):
            t1, t2 = t[..., :half], t[..., half:]
            return jnp.concatenate([t1 * cos - t2 * sin, t2 * cos + t1 * sin], -1)

        q, k = rope(q), rope(k)
        scores = jnp.einsum("bihd,bjhd->bhij", q, k,
                            preferred_element_type=jnp.float32) / math.sqrt(dh)
        causal = jnp.tril(jnp.ones((T, T), bool))
        scores = jnp.where(causal[None, None], scores, -1e30)
        att = jnp.einsum("bhij,bjhd->bihd",
                         jax.nn.softmax(scores, -1).astype(v.dtype), v)
        x = x + nn.Dense(D, use_bias=False, name="o")(att.reshape(B, T, D))
        h = nn.RMSNorm(name="norm2")(x)
        return x + _gated_mlp(h, self.d_model, self.d_ff or self.d_model * 4)


class HyenaLM(nn.Module):
    """Hyena/Evo2 language model. With `pattern` set this is the striped
    SDH* hybrid of the reference (gpt/model/hyena.py Hyena{1b,7b,40b}Config
    hybrid_override_pattern: S=short-explicit, D=medium-explicit, H=long-
    implicit hyena mixers, *=rotary attention); without it, a pure
    long-hyena column."""

    vocab_size: int
    d_model: int = 256
    n_layers: int = 4
    order: int = 2
    pattern: Optional[str] = None  # e.g. "SDH*"; None → all 'H'
    n_heads: int = 8
    d_ff: Optional[int] = None
    short_groups: Optional[int] = None
    medium_groups: Optional[int] = None

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        pat = self.pattern or "H" * self.n_layers
        if len(pat) != self.n_layers:
            raise ValueError(f"pattern len {len(pat)} != n_layers {self.n_layers}")
        x = nn.Embed(self.vocab_size, self.d_model, name="embed")(tokens)
        for i, ch in enumerate(pat):
            if ch == "*":
                x = HyenaAttentionBlock(self.d_model, self.n_heads,
                                        d_ff=self.d_ff, name=f"block{i}")(x)
            else:
                op = {"S": "short", "D": "medium", "H": "long"}[ch]
                groups = (self.short_groups if ch == "S"
                          else self.medium_groups if ch == "D" else None)
                x = HyenaBlock(self.d_model, order=self.order,
                               operator_type=op, groups=groups,
                               d_ff=self.d_ff, name=f"block{i}")(x)
        x = nn.RMSNorm(name="final_norm")(x)
        emb = self.variables["params"]["embed"]["embedding"]
        return x @ emb.T.astype(x.dtype)


def evo2_1b(**kw) -> HyenaLM:
    """Evo2-1B striped hybrid (reference gpt/model/hyena.py
    Hyena1bConfig:349 — pattern SDH*…, 1920×25, ffn 5120, 15 heads,
    medium/short groups 128; byte-level vocab)."""
    d = dict(vocab_size=512, d_model=1920, n_layers=25, order=2,
             pattern="SDH*SDHSDH*SDHSDH*SDHSDH*", n_heads=15, d_ff=5120,
             short_groups=128, medium_groups=128)
    d.update(kw)
    return HyenaLM(**d)


def evo2_7b(**kw) -> HyenaLM:
    """(reference Hyena7bConfig:395 — 4096×32 striped, ffn 11008,
    32 heads, groups 256)"""
    d = dict(vocab_size=512, d_model=4096, n_layers=32, order=2,
             pattern="SDH*SDHSDH*SDHSDH*SDHSDH*SDHSDH*", n_heads=32,
             d_ff=11008, short_groups=256, medium_groups=256)
    d.update(kw)
    return HyenaLM(**d)


def evo2_40b(**kw) -> HyenaLM:
    """(reference Hyena40bConfig:444 — 8192×50 striped, ffn 21888,
    64 heads, groups 512)"""
    d = dict(vocab_size=512, d_model=8192, n_layers=50, order=2,
             pattern="SDH*SDHSDH*SDHSDH*SDHSDH*SDHSDH*SDH*SDHSDH*SDHSDH*",
             n_heads=64, d_ff=21888, short_groups=512, medium_groups=512)
    d.update(kw)
    return HyenaLM(**d)
