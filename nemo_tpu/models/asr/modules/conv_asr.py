"""1-D convolutional ASR encoders/decoders (Jasper / QuartzNet / Citrinet).

TPU-native re-design of the reference ConvASREncoder / ConvASRDecoder
(`nemo/collections/asr/modules/conv_asr.py`, block impl
`nemo/collections/asr/parts/submodules/jasper.py` JasperBlock).

Design notes (TPU-first):
- Data layout is [B, T, C] (time-major features last) so XLA lowers the 1-D
  convs to MXU-friendly convolutions without layout transposes.
- Variable lengths are handled by masking activations before every conv
  (the reference's MaskedConv1d semantics) — shapes stay static under jit.
- BatchNorm uses running stats at inference; train mode computes batch stats.

Config schema matches the reference YAML `encoder.jasper` list: each entry
{filters, repeat, kernel, stride, dilation, dropout, residual, separable,
 se, se_reduction_ratio, stride_last, activation, ...}.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from nemo_tpu.core.neural_types import (
    EncodedRepresentation, LengthsType, LogprobsType, NeuralType,
    SpectrogramType, typecheck,
)


def _activation(name: str):
    return {
        "relu": nn.relu,
        "swish": nn.silu,
        "silu": nn.silu,
        "gelu": nn.gelu,
        "tanh": jnp.tanh,
    }[name]


def conv_out_length(length: jnp.ndarray, kernel: int, stride: int, dilation: int) -> jnp.ndarray:
    """'same'-padded conv output length (reference MaskedConv1d.get_seq_len)."""
    pad = (dilation * (kernel - 1)) // 2
    return (length + 2 * pad - dilation * (kernel - 1) - 1) // stride + 1


def _length_mask(x: jnp.ndarray, length: jnp.ndarray) -> jnp.ndarray:
    """[B, T, C] zero out beyond per-batch length."""
    t = jnp.arange(x.shape[1])
    mask = (t[None, :] < length[:, None])[..., None]
    return jnp.where(mask, x, 0.0)


class MaskedConv1d(nn.Module):
    """'same'-padded 1-D conv that masks padded time steps first."""

    features: int
    kernel: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, length: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = _length_mask(x, length)
        pad = (self.dilation * (self.kernel - 1)) // 2
        y = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel,),
            strides=(self.stride,),
            kernel_dilation=(self.dilation,),
            padding=[(pad, pad)],
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        return y, conv_out_length(length, self.kernel, self.stride, self.dilation)


class SqueezeExcite(nn.Module):
    """Global-context squeeze-excite (reference jasper.py SqueezeExcite,
    context_window=-1 global average over valid frames)."""

    channels: int
    reduction_ratio: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, length: jnp.ndarray) -> jnp.ndarray:
        t = jnp.arange(x.shape[1])
        mask = (t[None, :] < length[:, None])[..., None].astype(x.dtype)
        denom = jnp.maximum(length, 1).astype(x.dtype)[:, None]
        pooled = jnp.sum(x * mask, axis=1) / denom  # [B, C]
        h = nn.Dense(self.channels // self.reduction_ratio, name="fc1")(pooled)
        h = nn.relu(h)
        h = nn.Dense(self.channels, name="fc2")(h)
        gate = jax.nn.sigmoid(h)[:, None, :]
        return x * gate


class JasperBlock(nn.Module):
    """One Jasper/QuartzNet block: R repeats of (sep-)conv→BN→act→drop, with
    optional pointwise-BN residual added before the final activation."""

    in_filters: int
    filters: int
    repeat: int = 1
    kernel: int = 11
    stride: int = 1
    dilation: int = 1
    dropout: float = 0.0
    residual: bool = False
    separable: bool = False
    se: bool = False
    se_reduction_ratio: int = 16
    stride_last: bool = False
    residual_mode: str = "add"  # add | stride_add
    activation: str = "relu"
    dtype: Any = jnp.float32

    def _conv_bn(self, x, length, out_ch, in_ch, stride, *, train: bool, idx: int):
        if self.separable:
            x, length = MaskedConv1d(
                features=in_ch,
                kernel=self.kernel,
                stride=stride,
                dilation=self.dilation,
                groups=in_ch,
                dtype=self.dtype,
                name=f"dw{idx}",
            )(x, length)
            x, length = MaskedConv1d(
                features=out_ch, kernel=1, dtype=self.dtype, name=f"pw{idx}"
            )(x, length)
        else:
            x, length = MaskedConv1d(
                features=out_ch,
                kernel=self.kernel,
                stride=stride,
                dilation=self.dilation,
                dtype=self.dtype,
                name=f"conv{idx}",
            )(x, length)
        # BN statistics/params in fp32 (numerical island), output back in dtype
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-3,
            dtype=jnp.float32, name=f"bn{idx}"
        )(x).astype(self.dtype)
        return x, length

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, length: jnp.ndarray, *, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        act = _activation(self.activation)
        inp, inp_len = x, length
        for r in range(self.repeat):
            # reference jasper.py:745-775: with stride_last, only the final
            # repeat strides; otherwise every repeat uses the block stride
            if self.stride_last:
                stride = self.stride if r == self.repeat - 1 else 1
            else:
                stride = self.stride
            in_ch = self.in_filters if r == 0 else self.filters
            x, length = self._conv_bn(
                x, length, self.filters, in_ch, stride, train=train, idx=r
            )
            if r < self.repeat - 1:
                x = act(x)
                x = nn.Dropout(self.dropout, deterministic=not train)(x)

        if self.residual:
            res = inp
            res_len = inp_len
            if self.residual_mode == "stride_add" and self.stride > 1:
                res, res_len = MaskedConv1d(
                    features=self.filters, kernel=1, stride=self.stride,
                    dtype=self.dtype, name="res_pw"
                )(res, res_len)
            else:
                res, res_len = MaskedConv1d(
                    features=self.filters, kernel=1, dtype=self.dtype, name="res_pw"
                )(res, res_len)
            res = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-3,
                dtype=jnp.float32, name="res_bn"
            )(res).astype(self.dtype)
            if res.shape[1] != x.shape[1]:
                res = res[:, : x.shape[1]]
            x = x + res

        if self.se:
            x = SqueezeExcite(self.filters, self.se_reduction_ratio, name="se")(x, length)

        x = act(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x, length


class ConvASREncoder(nn.Module):
    """Stack of JasperBlocks from a reference-style `jasper` config list.

    Reference parity: ConvASREncoder (modules/conv_asr.py). Input is
    [B, D, T] features (as produced by the mel frontend) — internally we use
    [B, T, C].
    """

    feat_in: int
    jasper: Sequence[Any]  # list of block config dicts
    activation: str = "relu"
    dtype: Any = jnp.float32

    # semantic ports (reference: conv_asr.py ConvASREncoder input_types);
    # validated at trace time by @typecheck
    @property
    def input_types(self):
        return {
            "audio_signal": NeuralType(("B", "D", "T"), SpectrogramType()),
            "length": NeuralType(("B",), LengthsType()),
        }

    @property
    def output_types(self):
        return {
            "outputs": NeuralType(("B", "D", "T"), EncodedRepresentation()),
            "encoded_lengths": NeuralType(("B",), LengthsType()),
        }

    @typecheck
    @nn.compact
    def __call__(
        self, audio_signal: jnp.ndarray, length: jnp.ndarray, *, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = jnp.transpose(audio_signal, (0, 2, 1)).astype(self.dtype)  # [B, T, D]
        in_filters = self.feat_in
        for i, blk in enumerate(self.jasper):
            blk = dict(blk)
            x, length = JasperBlock(
                in_filters=in_filters,
                filters=int(blk["filters"]),
                repeat=int(blk.get("repeat", 1)),
                kernel=int(_scalar(blk.get("kernel", 11))),
                stride=int(_scalar(blk.get("stride", 1))),
                dilation=int(_scalar(blk.get("dilation", 1))),
                dropout=float(blk.get("dropout", 0.0)),
                residual=bool(blk.get("residual", False)),
                separable=bool(blk.get("separable", False)),
                se=bool(blk.get("se", False)),
                se_reduction_ratio=int(blk.get("se_reduction_ratio", 8)),
                stride_last=bool(blk.get("stride_last", False)),
                residual_mode=str(blk.get("residual_mode", "add")),
                activation=str(blk.get("activation", self.activation)),
                dtype=self.dtype,
                name=f"block{i}",
            )(x, length, train=train)
            in_filters = int(blk["filters"])
        # return [B, C, T] to match reference encoder output contract
        return jnp.transpose(x, (0, 2, 1)), length


def _scalar(v):
    if isinstance(v, (list, tuple)):
        return v[0]
    return v


class ConvASRDecoder(nn.Module):
    """1×1 conv decoder → per-frame log-probs over vocab+blank.

    Reference parity: ConvASRDecoder (modules/conv_asr.py); blank is the
    LAST index (num_classes), matching the reference CTC convention.
    """

    feat_in: int
    num_classes: int  # vocab size WITHOUT blank

    @property
    def input_types(self):
        return {"encoder_output": NeuralType(("B", "D", "T"),
                                             EncodedRepresentation())}

    @property
    def output_types(self):
        return {"logprobs": NeuralType(("B", "T", "D"), LogprobsType())}

    @typecheck
    @nn.compact
    def __call__(self, encoder_output: jnp.ndarray) -> jnp.ndarray:
        x = jnp.transpose(encoder_output, (0, 2, 1))  # [B, T, C]
        logits = nn.Conv(self.num_classes + 1, kernel_size=(1,), use_bias=True, name="proj")(x)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
