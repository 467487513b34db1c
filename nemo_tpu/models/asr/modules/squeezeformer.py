"""Squeezeformer encoder (temporal U-Net conformer variant).

Reference parity: `nemo/collections/asr/modules/squeezeformer_encoder.py`
(SqueezeformerEncoder) + `parts/submodules/squeezeformer_modules.py`
(SqueezeformerLayer: post-LN blocks with learned scale/bias, MHSA→FF→
Conv→FF order — no macaron ½ halves) and `parts/submodules/subsampling.py`
TimeReductionModule: depthwise-conv ×2 downsampling mid-stack, recovered by
nearest-neighbor upsampling + skip before the final layer(s).

TPU-native: same flax building blocks as the conformer (rel-pos MHSA with
the trig-decomposed attention), static shapes throughout — the time-reduced
span is a statically-shaped half-length segment, and recovery is a gather.
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from nemo_tpu.models.asr.modules.conformer import (
    ConformerConvolution,
    ConformerFeedForward,
    ConvSubsampling,
    RelPositionalEncoding,
    RelPositionMultiHeadAttention,
    subsampled_length,
)


class _ScaleBias(nn.Module):
    """Squeezeformer's learned preLN scale+bias (squeezeformer_modules.py
    ScaleBiasLayer)."""

    d_model: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.d_model,))
        bias = self.param("bias", nn.initializers.zeros, (self.d_model,))
        return x * scale + bias


class SqueezeformerLayer(nn.Module):
    """MHSA → FF → Conv → FF, each post-LN with residual (reference layer
    ordering; no 0.5 macaron scaling)."""

    d_model: int
    n_heads: int
    ff_expansion_factor: int = 4
    conv_kernel_size: int = 31
    dropout: float = 0.0
    dropout_att: float = 0.0
    att_impl: str = "decomposed"

    @nn.compact
    def __call__(self, x, pos_emb, pad_mask, *, train: bool = False):
        drop = lambda h: nn.Dropout(self.dropout, deterministic=not train)(h)
        ln = lambda name: (lambda v: nn.LayerNorm(dtype=jnp.float32, name=name)(v))

        h = _ScaleBias(self.d_model, name="attn_scale")(x)
        h = RelPositionMultiHeadAttention(
            self.d_model, self.n_heads, self.dropout_att, impl=self.att_impl,
            name="attn")(h, pos_emb, pad_mask, train=train)
        x = ln("norm_attn")(x + drop(h))

        h = _ScaleBias(self.d_model, name="ff1_scale")(x)
        h = ConformerFeedForward(self.d_model, self.ff_expansion_factor,
                                 self.dropout, name="ff1")(h, train=train)
        x = ln("norm_ff1")(x + drop(h))

        h = _ScaleBias(self.d_model, name="conv_scale")(x)
        h = ConformerConvolution(self.d_model, self.conv_kernel_size,
                                 norm_type="batch_norm", name="conv")(
            h, pad_mask, train=train)
        x = ln("norm_conv")(x + drop(h))

        h = _ScaleBias(self.d_model, name="ff2_scale")(x)
        h = ConformerFeedForward(self.d_model, self.ff_expansion_factor,
                                 self.dropout, name="ff2")(h, train=train)
        return ln("norm_ff2")(x + drop(h))


class TimeReduction(nn.Module):
    """Depthwise-conv ×2 temporal downsampling (TimeReductionModule)."""

    d_model: int
    kernel_size: int = 5

    @nn.compact
    def __call__(self, x, pad_mask):
        k = self.kernel_size
        h = jnp.where(pad_mask[..., None], x, 0.0)
        h = nn.Conv(self.d_model, (k,), strides=(2,),
                    padding=[((k - 1) // 2, (k - 1) // 2)],
                    feature_group_count=self.d_model, name="dw")(h)
        h = nn.Conv(self.d_model, (1,), name="pw")(h)
        return h


class SqueezeformerEncoder(nn.Module):
    """U-Net-in-time Squeezeformer (squeezeformer_encoder.py:36).

    Layers [0, reduce_layer) run at the subsampled rate; layers
    [reduce_layer, n_layers-1) run ×2 downsampled; the last layer runs at
    the recovered rate on upsampled + skip features.
    Input [B, D_mel, T] → [B, d_model, T'].
    """

    feat_in: int
    n_layers: int
    d_model: int
    n_heads: int
    subsampling_factor: int = 4
    ff_expansion_factor: int = 4
    conv_kernel_size: int = 31
    dropout: float = 0.1
    dropout_att: float = 0.1
    reduce_layer: int = -1  # default n_layers // 2
    pos_emb_max_len: int = 5000
    att_impl: str = "decomposed"

    @nn.compact
    def __call__(self, audio_signal: jnp.ndarray, length: jnp.ndarray,
                 *, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = jnp.transpose(audio_signal, (0, 2, 1))
        x, length = ConvSubsampling(
            d_model=self.d_model, feat_in=self.feat_in,
            subsampling_factor=self.subsampling_factor, name="pre_encode",
        )(x, length)
        x, pos_emb = RelPositionalEncoding(
            d_model=self.d_model, max_len=self.pos_emb_max_len,
            xscale=math.sqrt(self.d_model), name="pos_enc")(x, train=train)

        T = x.shape[1]
        pad_mask = jnp.arange(T)[None, :] < length[:, None]
        reduce_at = self.reduce_layer if self.reduce_layer >= 0 else self.n_layers // 2

        def make_layer(i):
            return SqueezeformerLayer(
                d_model=self.d_model, n_heads=self.n_heads,
                ff_expansion_factor=self.ff_expansion_factor,
                conv_kernel_size=self.conv_kernel_size, dropout=self.dropout,
                dropout_att=self.dropout_att, att_impl=self.att_impl,
                name=f"layer{i}")

        for i in range(reduce_at):
            x = make_layer(i)(x, pos_emb, pad_mask, train=train)

        skip = x
        x = TimeReduction(self.d_model, name="time_reduce")(x, pad_mask)
        red_len = (length - 1) // 2 + 1
        Tr = x.shape[1]
        red_mask = jnp.arange(Tr)[None, :] < red_len[:, None]
        pe_red = RelPositionalEncoding(
            d_model=self.d_model, max_len=self.pos_emb_max_len,
            xscale=None, name="pos_enc_red")
        _, pos_emb_red = pe_red(x, train=train)

        for i in range(reduce_at, self.n_layers - 1):
            x = make_layer(i)(x, pos_emb_red, red_mask, train=train)

        # time recovery: nearest-neighbor ×2 upsample + skip (reference
        # squeezeformer_encoder.py recovery_activation path)
        up = jnp.repeat(x, 2, axis=1)[:, :T]
        x = nn.Dense(self.d_model, name="recovery_proj")(up) + skip
        x = make_layer(self.n_layers - 1)(x, pos_emb, pad_mask, train=train)

        x = nn.LayerNorm(dtype=jnp.float32, name="norm_out")(x)
        x = jnp.where(pad_mask[..., None], x, 0.0)
        return jnp.transpose(x, (0, 2, 1)), length


class RNNEncoder(nn.Module):
    """Stacked (bi)LSTM encoder (reference `asr/modules/rnn_encoder.py`:
    RNNEncoder with proj layers). lax.scan-based LSTM per layer.

    Input [B, D_mel, T] → [B, d_model, T'] (optional ×stride subsample by
    frame stacking, reference's `subsampling: stacking`).
    """

    feat_in: int
    n_layers: int
    d_model: int
    bidirectional: bool = True
    subsampling_factor: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(self, audio_signal: jnp.ndarray, length: jnp.ndarray,
                 *, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = jnp.transpose(audio_signal, (0, 2, 1))  # [B, T, F]
        B, T, F = x.shape
        s = self.subsampling_factor
        Tp = (T // s) * s
        x = x[:, :Tp].reshape(B, Tp // s, F * s)  # frame stacking
        length = jnp.maximum(length // s, 1)
        Ts = x.shape[1]
        mask = jnp.arange(Ts)[None, :] < length[:, None]

        for i in range(self.n_layers):
            cell = nn.OptimizedLSTMCell(self.d_model, name=f"lstm{i}_f")
            fwd = nn.RNN(cell, name=f"rnn{i}_f")(x)
            if self.bidirectional:
                cell_b = nn.OptimizedLSTMCell(self.d_model, name=f"lstm{i}_b")
                # reverse within valid length: flip, run, flip back
                rev = jnp.flip(x, axis=1)
                bwd = jnp.flip(nn.RNN(cell_b, name=f"rnn{i}_b")(rev), axis=1)
                h = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                h = fwd
            x = nn.Dense(self.d_model, name=f"proj{i}")(h)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)

        x = jnp.where(mask[..., None], x, 0.0)
        return jnp.transpose(x, (0, 2, 1)), length
