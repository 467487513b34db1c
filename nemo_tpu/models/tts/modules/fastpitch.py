"""FastPitch modules (TPU-native).

Reference parity: `nemo/collections/tts/modules/fastpitch.py` (FastPitchModule:
symbol embedding → FFT encoder → duration/pitch predictors → pitch embedding
→ length regulator → FFT decoder → mel linear) with FastSpeech-style FFT
blocks (`tts/modules/transformer.py`: MHA + kernel-3 conv FF, sinusoidal
absolute positions).

TPU-first: the length regulator is a searchsorted gather over cumulative
durations (static max_mel_len, no dynamic shapes), so synthesis jits into a
single program.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nemo_tpu.core.neural_types import (
    LengthsType, MelSpectrogramType, NeuralType, TokenIndex, typecheck,
)


def sinusoidal_positions(max_len: int, dim: int) -> np.ndarray:
    pos = np.arange(max_len, dtype=np.float32)
    inv = np.exp(np.arange(0, dim, 2, np.float32) * -(math.log(10000.0) / dim))
    pe = np.zeros((max_len, dim), np.float32)
    pe[:, 0::2] = np.sin(pos[:, None] * inv[None])
    pe[:, 1::2] = np.cos(pos[:, None] * inv[None])
    return pe


class FFTBlock(nn.Module):
    """Self-attention + conv feed-forward (FastSpeech FFT block)."""

    d_model: int
    n_heads: int
    d_ff: int
    kernel_size: int = 3
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, pad_mask, *, train: bool = False):
        B, T, D = x.shape
        H = self.n_heads
        dh = D // H
        h = nn.LayerNorm(name="norm1")(x)
        q = nn.Dense(D, name="q")(h).reshape(B, T, H, dh)
        k = nn.Dense(D, name="k")(h).reshape(B, T, H, dh)
        v = nn.Dense(D, name="v")(h).reshape(B, T, H, dh)
        scores = jnp.einsum("bihd,bjhd->bhij", q, k, preferred_element_type=jnp.float32)
        scores = scores / math.sqrt(dh)
        scores = jnp.where(pad_mask[:, None, None, :], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(self.dropout, deterministic=not train)(probs)
        att = jnp.einsum("bhij,bjhd->bihd", probs.astype(v.dtype), v).reshape(B, T, D)
        x = x + nn.Dropout(self.dropout, deterministic=not train)(nn.Dense(D, name="o")(att))

        h = nn.LayerNorm(name="norm2")(x)
        pad = (self.kernel_size - 1) // 2
        h = nn.Conv(self.d_ff, (self.kernel_size,), padding=[(pad, pad)], name="ff1")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(self.d_model, (self.kernel_size,), padding=[(pad, pad)], name="ff2")(h)
        x = x + nn.Dropout(self.dropout, deterministic=not train)(h)
        return jnp.where(pad_mask[..., None], x, 0.0)


class FFTransformer(nn.Module):
    n_layers: int
    d_model: int
    n_heads: int
    d_ff: int
    kernel_size: int = 3
    dropout: float = 0.1
    max_len: int = 4096

    @nn.compact
    def __call__(self, x, pad_mask, *, train: bool = False):
        T = x.shape[1]
        pe = jnp.asarray(sinusoidal_positions(self.max_len, self.d_model))
        x = x + pe[None, :T]
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        for i in range(self.n_layers):
            x = FFTBlock(
                self.d_model, self.n_heads, self.d_ff, self.kernel_size,
                self.dropout, name=f"layer{i}",
            )(x, pad_mask, train=train)
        return x


class TemporalPredictor(nn.Module):
    """Duration/pitch/energy predictor: 2× [conv k3 → relu → LN → dropout] → linear.
    (reference fastpitch.py TemporalPredictor)"""

    filter_size: int = 256
    kernel_size: int = 3
    dropout: float = 0.1
    n_layers: int = 2

    @nn.compact
    def __call__(self, x, pad_mask, *, train: bool = False):
        pad = (self.kernel_size - 1) // 2
        h = x
        for i in range(self.n_layers):
            h = jnp.where(pad_mask[..., None], h, 0.0)
            h = nn.Conv(self.filter_size, (self.kernel_size,), padding=[(pad, pad)], name=f"conv{i}")(h)
            h = nn.relu(h)
            h = nn.LayerNorm(name=f"norm{i}")(h)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        out = nn.Dense(1, name="fc")(h)[..., 0]
        return jnp.where(pad_mask, out, 0.0)


def regulate_length(
    durations: jnp.ndarray,  # [B, U] int32 frames per symbol
    enc: jnp.ndarray,  # [B, U, D]
    max_mel_len: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Repeat each symbol enc[u] durations[u] times along time (static output
    length; valid length returned). TPU-native: searchsorted gather instead
    of dynamic repeats."""
    csum = jnp.cumsum(durations, axis=1)  # [B, U]
    mel_len = csum[:, -1]
    t = jnp.arange(max_mel_len)
    # src index for output frame t = #{u : csum[u] <= t}
    src = jax.vmap(lambda c: jnp.searchsorted(c, t, side="right"))(csum)
    src = jnp.minimum(src, enc.shape[1] - 1)
    out = jnp.take_along_axis(enc, src[..., None], axis=1)
    mask = t[None, :] < mel_len[:, None]
    return jnp.where(mask[..., None], out, 0.0), mel_len


class FastPitchModule(nn.Module):
    """Full FastPitch net (reference modules/fastpitch.py FastPitchModule)."""

    n_symbols: int
    n_mels: int = 80
    d_model: int = 384
    n_heads: int = 1
    d_ff: int = 1536
    enc_layers: int = 6
    dec_layers: int = 6
    kernel_size: int = 3
    dropout: float = 0.1
    max_mel_len: int = 2048
    pitch_embedding_kernel: int = 3

    # semantic ports (reference: modules/fastpitch.py FastPitchModule
    # input_types/output_types); trace-time validation via @typecheck
    @property
    def input_types(self):
        return {
            "tokens": NeuralType(("B", "T"), TokenIndex()),
            "token_len": NeuralType(("B",), LengthsType()),
        }

    @property
    def output_types(self):
        return {
            "mel": NeuralType(("B", "D", "T"), MelSpectrogramType()),
            "mel_len": NeuralType(("B",), LengthsType()),
        }

    @typecheck
    @nn.compact
    def __call__(
        self,
        tokens: jnp.ndarray,  # [B, U]
        token_len: jnp.ndarray,  # [B]
        *,
        durations: Optional[jnp.ndarray] = None,  # [B, U] (training: ground truth)
        pitch: Optional[jnp.ndarray] = None,  # [B, U] (training: ground truth, normalized)
        pace: float = 1.0,
        train: bool = False,
    ):
        B, U = tokens.shape
        tok_mask = jnp.arange(U)[None, :] < token_len[:, None]

        emb = nn.Embed(self.n_symbols, self.d_model, name="symbol_emb")(tokens)
        enc = FFTransformer(
            self.enc_layers, self.d_model, self.n_heads, self.d_ff,
            self.kernel_size, self.dropout, name="encoder",
        )(emb, tok_mask, train=train)

        log_dur_pred = TemporalPredictor(name="duration_predictor")(enc, tok_mask, train=train)
        pitch_pred = TemporalPredictor(name="pitch_predictor")(enc, tok_mask, train=train)

        use_pitch = pitch if pitch is not None else pitch_pred
        pad = (self.pitch_embedding_kernel - 1) // 2
        pitch_emb = nn.Conv(
            self.d_model, (self.pitch_embedding_kernel,), padding=[(pad, pad)],
            name="pitch_emb",
        )(use_pitch[..., None])
        enc = enc + pitch_emb

        if durations is not None:
            dur = durations
        else:
            dur = jnp.round(jnp.clip(jnp.exp(log_dur_pred) - 1.0, 0.0, None) / pace)
            dur = jnp.where(tok_mask, jnp.maximum(dur, 0.0), 0.0).astype(jnp.int32)
        dec_in, mel_len = regulate_length(dur, enc, self.max_mel_len)
        mel_mask = jnp.arange(self.max_mel_len)[None, :] < mel_len[:, None]

        dec = FFTransformer(
            self.dec_layers, self.d_model, self.n_heads, self.d_ff,
            self.kernel_size, self.dropout, name="decoder",
        )(dec_in, mel_mask, train=train)
        mel = nn.Dense(self.n_mels, name="mel_proj")(dec)  # [B, T, n_mels]
        return {
            "mel": jnp.transpose(mel, (0, 2, 1)),  # [B, n_mels, T]
            "mel_len": mel_len,
            "log_dur_pred": log_dur_pred,
            "pitch_pred": pitch_pred,
            "durations": dur,
        }
