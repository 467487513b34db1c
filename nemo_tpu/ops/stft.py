"""Complex STFT / inverse STFT as MXU matmuls (for enhancement models).

Reference parity: the torch.stft/istft pair used by the audio collection
(`nemo/collections/audio/` masking-based enhancement operates on complex
STFTs). Same matmul-DFT approach as the mel frontend; ISTFT is the
transposed basis + windowed overlap-add with COLA normalization.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nemo_tpu.ops.audio import hann_window


def _bases(n_fft: int, window: np.ndarray):
    n_freq = n_fft // 2 + 1
    t = np.arange(n_fft).reshape(-1, 1)
    k = np.arange(n_freq).reshape(1, -1)
    ang = 2.0 * np.pi * t * k / n_fft
    cos = (np.cos(ang) * window.reshape(-1, 1)).astype(np.float32)
    sin = (-np.sin(ang) * window.reshape(-1, 1)).astype(np.float32)
    # inverse basis: x[t] = (1/n) Σ_k w_k (re cos + im(-sin)·(-1)...) with
    # hermitian weights 1 for k=0,n/2 else 2
    wk = np.full(n_freq, 2.0, np.float64)
    wk[0] = 1.0
    if n_fft % 2 == 0:
        wk[-1] = 1.0
    icos = (np.cos(ang) * wk / n_fft).astype(np.float32)  # [n_fft, n_freq]
    isin = (np.sin(ang) * wk / n_fft).astype(np.float32)
    return cos, sin, icos, isin


@partial(jax.jit, static_argnames=("n_fft", "hop"))
def stft(signal: jnp.ndarray, n_fft: int = 512, hop: int = 128) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B, T] → (re, im) [B, F, n_freq]; hann window, center-padded."""
    win = hann_window(n_fft, periodic=True)
    cos, sin, _, _ = _bases(n_fft, win)
    pad = n_fft // 2
    x = jnp.pad(signal.astype(jnp.float32), ((0, 0), (pad, pad)), mode="reflect")
    B, Tp = x.shape
    F = (Tp - n_fft) // hop + 1
    idx = (jnp.arange(F) * hop)[:, None] + jnp.arange(n_fft)[None, :]
    frames = x[:, idx]
    re = jnp.einsum("bfn,nk->bfk", frames, jnp.asarray(cos), precision="highest")
    im = jnp.einsum("bfn,nk->bfk", frames, jnp.asarray(sin), precision="highest")
    return re, im


@partial(jax.jit, static_argnames=("n_fft", "hop", "length"))
def istft(re: jnp.ndarray, im: jnp.ndarray, n_fft: int = 512, hop: int = 128,
          length: int = None) -> jnp.ndarray:
    """(re, im) [B, F, n_freq] → [B, length] via windowed overlap-add."""
    win = hann_window(n_fft, periodic=True)
    _, _, icos, isin = _bases(n_fft, win)
    # frame_t = IDFT(X); note stft sin basis has the -sin folded in
    frames = (
        jnp.einsum("bfk,nk->bfn", re, jnp.asarray(icos), precision="highest")
        - jnp.einsum("bfk,nk->bfn", im, jnp.asarray(isin), precision="highest")
    )
    w = jnp.asarray(win)
    frames = frames * w[None, None, :]  # synthesis window
    B, F, _ = frames.shape
    Tp = (F - 1) * hop + n_fft
    out = jnp.zeros((B, Tp), jnp.float32)
    norm = jnp.zeros((Tp,), jnp.float32)
    idx = (jnp.arange(F) * hop)[:, None] + jnp.arange(n_fft)[None, :]
    out = out.at[:, idx.reshape(-1)].add(frames.reshape(B, -1))
    norm = norm.at[idx.reshape(-1)].add(jnp.tile(w * w, (F,)))
    out = out / jnp.maximum(norm, 1e-8)[None]
    pad = n_fft // 2
    out = out[:, pad:]
    if length is not None:
        out = out[:, :length]
    return out


def si_snr(estimate: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Scale-invariant SNR in dB, per batch item (reference audio/metrics)."""
    t = target - jnp.mean(target, axis=-1, keepdims=True)
    e = estimate - jnp.mean(estimate, axis=-1, keepdims=True)
    s = jnp.sum(e * t, -1, keepdims=True) * t / (jnp.sum(t * t, -1, keepdims=True) + eps)
    noise = e - s
    return 10.0 * jnp.log10(
        (jnp.sum(s * s, -1) + eps) / (jnp.sum(noise * noise, -1) + eps)
    )
