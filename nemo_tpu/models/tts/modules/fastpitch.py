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
    """Self-attention + conv feed-forward (FastSpeech FFT block).

    norm_style="pre" (default, the TPU-native layout) or "post" — the
    reference layout (`tts/modules/transformer.py` MultiHeadAttn /
    PositionwiseConvFF with pre_lnorm=False: residual THEN LayerNorm,
    fused-qkv-equivalent projections with attention width n_heads·d_head
    decoupled from d_model, o-projection without bias). "post" exists so
    reference `.nemo` FastPitch weights import with output parity."""

    d_model: int
    n_heads: int
    d_ff: int
    kernel_size: int = 3
    dropout: float = 0.1
    norm_style: str = "pre"  # "pre" | "post" (reference pre_lnorm=False)
    d_head: Optional[int] = None  # None → d_model // n_heads

    @nn.compact
    def __call__(self, x, pad_mask, *, train: bool = False):
        B, T, D = x.shape
        H = self.n_heads
        dh = self.d_head or D // H
        post = self.norm_style == "post"
        h = x if post else nn.LayerNorm(name="norm1")(x)
        q = nn.Dense(H * dh, name="q")(h).reshape(B, T, H, dh)
        k = nn.Dense(H * dh, name="k")(h).reshape(B, T, H, dh)
        v = nn.Dense(H * dh, name="v")(h).reshape(B, T, H, dh)
        scores = jnp.einsum("bihd,bjhd->bhij", q, k, preferred_element_type=jnp.float32)
        scores = scores / math.sqrt(dh)
        scores = jnp.where(pad_mask[:, None, None, :], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(self.dropout, deterministic=not train)(probs)
        att = jnp.einsum("bhij,bjhd->bihd", probs.astype(v.dtype), v).reshape(B, T, H * dh)
        att = nn.Dropout(self.dropout, deterministic=not train)(
            nn.Dense(D, name="o", use_bias=not post)(att))
        if post:
            x = nn.LayerNorm(name="norm1")(x + att)
            x = jnp.where(pad_mask[..., None], x, 0.0)
        else:
            x = x + att

        h = x if post else nn.LayerNorm(name="norm2")(x)
        pad = (self.kernel_size - 1) // 2
        h = nn.Conv(self.d_ff, (self.kernel_size,), padding=[(pad, pad)], name="ff1")(h)
        h = nn.relu(h)
        # zero the FF intermediate at padded frames so ff2's boundary taps
        # read zeros regardless of pad length. The reference CoreNet leaves
        # relu(bias) at materialized pad frames, making its outputs depend
        # on the batch pad length (batch-composition-dependent mels); with
        # this mask ours are pad-invariant and equal to the reference's
        # canonical unpadded (B=1, T=exact) inference.
        h = jnp.where(pad_mask[..., None], h, 0.0)
        if not post:  # reference CoreNet has no dropout between convs
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(self.d_model, (self.kernel_size,), padding=[(pad, pad)], name="ff2")(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        x = nn.LayerNorm(name="norm2")(x + h) if post else x + h
        return jnp.where(pad_mask[..., None], x, 0.0)


class FFTransformer(nn.Module):
    n_layers: int
    d_model: int
    n_heads: int
    d_ff: int
    kernel_size: int = 3
    dropout: float = 0.1
    max_len: int = 4096
    norm_style: str = "pre"
    d_head: Optional[int] = None
    # False (default): interleaved sin/cos. True: reference layout
    # (`transformer.py:46` torch.cat([sin, cos], dim=1), masked at pads).
    pos_concat: bool = False

    @nn.compact
    def __call__(self, x, pad_mask, *, train: bool = False):
        T = x.shape[1]
        if self.pos_concat:
            pos = jnp.arange(self.max_len, dtype=jnp.float32)
            inv = jnp.exp(jnp.arange(0, self.d_model, 2, dtype=jnp.float32)
                          * -(math.log(10000.0) / self.d_model))
            ang = pos[:, None] * inv[None]
            pe = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=1)
            x = x + jnp.where(pad_mask[..., None], pe[None, :T], 0.0)
        else:
            pe = jnp.asarray(sinusoidal_positions(self.max_len, self.d_model))
            x = x + pe[None, :T]
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        for i in range(self.n_layers):
            x = FFTBlock(
                self.d_model, self.n_heads, self.d_ff, self.kernel_size,
                self.dropout, norm_style=self.norm_style, d_head=self.d_head,
                name=f"layer{i}",
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
    # Inference duration clamp (reference modules/fastpitch.py:84,172-198,304:
    # `torch.clamp(torch.exp(log_dur) - 1, min_token_duration, max_token_duration)`).
    # Keeps untrained/miscalibrated duration predictors from collapsing the mel
    # to 0 frames or exploding past max_mel_len.
    min_token_duration: int = 0
    max_token_duration: int = 75
    # reference-compat knobs (see FFTBlock): set norm_style="post",
    # pos_concat=True, d_head=<yaml d_head> when importing `.nemo` weights
    norm_style: str = "pre"
    d_head: Optional[int] = None
    pos_concat: bool = False
    predictor_filter_size: int = 256
    predictor_kernel_size: int = 3
    predictor_n_layers: int = 2

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

    def _encode(self, tokens, token_len, durations, pitch, pace, train):
        """Symbol embedding → FFT encoder → predictors → pitch embedding →
        final durations. Everything up to (but excluding) length regulation."""
        B, U = tokens.shape
        tok_mask = jnp.arange(U)[None, :] < token_len[:, None]

        emb = nn.Embed(self.n_symbols, self.d_model, name="symbol_emb")(tokens)
        enc = FFTransformer(
            self.enc_layers, self.d_model, self.n_heads, self.d_ff,
            self.kernel_size, self.dropout, norm_style=self.norm_style,
            d_head=self.d_head, pos_concat=self.pos_concat, name="encoder",
        )(emb, tok_mask, train=train)

        pred_kw = dict(filter_size=self.predictor_filter_size,
                       kernel_size=self.predictor_kernel_size,
                       n_layers=self.predictor_n_layers)
        log_dur_pred = TemporalPredictor(
            name="duration_predictor", **pred_kw)(enc, tok_mask, train=train)
        pitch_pred = TemporalPredictor(
            name="pitch_predictor", **pred_kw)(enc, tok_mask, train=train)

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
            # reference :84: clamp(exp(log_dur)-1, min_dur, max_dur); pace is
            # applied after the clamp and rounding is floor(x+0.5) to match
            # `(reps + 0.5).long()` in the torch regulate_len.
            dur = jnp.clip(
                jnp.exp(log_dur_pred) - 1.0,
                float(self.min_token_duration),
                float(self.max_token_duration),
            )
            dur = jnp.floor(dur / pace + 0.5)
            dur = jnp.where(tok_mask, jnp.maximum(dur, 0.0), 0.0).astype(jnp.int32)
        return enc, dur, log_dur_pred, pitch_pred

    def _decode(self, enc, dur, max_mel_len, train):
        """Length-regulate at a STATIC output length, then FFT decoder → mel.
        Split out so inference can pick a bucketed max_mel_len after fetching
        the (tiny) mel_len — the decoder then runs over ~the real length
        instead of the full training pad (4-8× less decoder compute)."""
        dec_in, mel_len = regulate_length(dur, enc, max_mel_len)
        mel_mask = jnp.arange(max_mel_len)[None, :] < mel_len[:, None]
        dec = FFTransformer(
            self.dec_layers, self.d_model, self.n_heads, self.d_ff,
            self.kernel_size, self.dropout, norm_style=self.norm_style,
            d_head=self.d_head, pos_concat=self.pos_concat, name="decoder",
        )(dec_in, mel_mask, train=train)
        mel = nn.Dense(self.n_mels, name="mel_proj")(dec)  # [B, T, n_mels]
        return jnp.transpose(mel, (0, 2, 1)), mel_len  # [B, n_mels, T]

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
        stage: str = "full",  # "full" | "encode" | "decode"
        mel_max_len: Optional[int] = None,  # static decode length override
        enc: Optional[jnp.ndarray] = None,  # [B, U, D] (stage="decode")
        dur: Optional[jnp.ndarray] = None,  # [B, U] int32 (stage="decode")
    ):
        if stage == "decode":
            # bucketed two-phase inference: encoder ran separately, host
            # fetched mel_len and chose a static bucket ≥ the real length
            mel, mel_len = self._decode(enc, dur, mel_max_len or self.max_mel_len, train)
            return {"mel": mel, "mel_len": mel_len}
        enc, dur, log_dur_pred, pitch_pred = self._encode(
            tokens, token_len, durations, pitch, pace, train
        )
        if stage == "encode":
            return {
                "enc": enc,
                "durations": dur,
                "mel_len": jnp.sum(dur, axis=1),
                "log_dur_pred": log_dur_pred,
                "pitch_pred": pitch_pred,
            }
        mel, mel_len = self._decode(enc, dur, mel_max_len or self.max_mel_len, train)
        return {
            "mel": mel,  # [B, n_mels, T]
            "mel_len": mel_len,
            "log_dur_pred": log_dur_pred,
            "pitch_pred": pitch_pred,
            "durations": dur,
        }
