"""Conformer encoder (TPU-native).

Reference parity: ConformerEncoder (`nemo/collections/asr/modules/conformer_encoder.py:62`)
and submodules (`asr/parts/submodules/conformer_modules.py`,
`multi_head_attention.py:212` RelPositionMultiHeadAttention,
`subsampling.py:62` ConvSubsampling).

Structure per layer (conformer_modules.py:35):
  x += ½·FF(LN x); x += MHSA(LN x, rel-pos); x += Conv(LN x); x += ½·FF(LN x); x = LN x
Conv module: pointwise(2d) → GLU → depthwise(k) → BN/LN → swish → pointwise(d).

TPU-first notes:
- Layout is [B, T, D] throughout; masks keep shapes static under jit.
- Attention is batched einsum (MXU) with an fp32 softmax island; a Pallas
  flash-attention kernel with rel-pos bias plugs in behind the same
  interface (nemo_tpu/ops/attention.py).
- The Transformer-XL relative-position term uses the classic pad-reshape
  shift, computed in the same fused attention context.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nemo_tpu.core.neural_types import (
    EncodedRepresentation, LengthsType, NeuralType, SpectrogramType, typecheck,
)


def subsampled_length(length: jnp.ndarray, num_layers: int) -> jnp.ndarray:
    """Each conv layer: k=3, s=2, p=1 → L = floor((L-1)/2)+1."""
    for _ in range(num_layers):
        length = (length - 1) // 2 + 1
    return length


class ConvSubsampling(nn.Module):
    """'striding' / 'dw_striding' 2-D conv subsampling (subsampling.py:62).

    Input [B, T, F] → [B, T/2^n, d_model].
    """

    d_model: int
    feat_in: int
    subsampling: str = "striding"  # striding | dw_striding
    subsampling_factor: int = 4
    conv_channels: int = -1
    causal: bool = False  # streaming: left-only time padding (reference
    #                       causal_downsampling, subsampling.py is_causal)
    fused_kernel: bool = False  # experimental Pallas conv-relu-conv
    #   (ops/subsampling_kernel.py): keeps conv1's output in VMEM. Measured
    #   on v5e at [8, 3001, 80]/C=512: 16.3 ms vs 14.6 ms XLA pair — the 9
    #   skinny conv1 GEMMs still stall the MXU, so OFF by default; the flag
    #   keeps the kernel wired/testable end-to-end (requires F≈80-class
    #   shapes; Mosaic rejects tiny F lane layouts).
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, length: jnp.ndarray,
                 cache: Any = None) -> Tuple[jnp.ndarray, ...]:
        """cache (streaming, causal only): list of [B, 2, F_i, C_i] per conv —
        the last two input rows at that conv's rate. Returns (+ new cache)."""
        n_layers = int(math.log2(self.subsampling_factor))
        ch = self.conv_channels if self.conv_channels > 0 else self.d_model
        h = x[..., None].astype(self.dtype)  # [B, T, F, 1]
        if (self.fused_kernel and cache is None and not self.causal
                and self.subsampling == "striding" and n_layers == 2):
            return self._fused_x4(x, length, ch)
        tpad = (2, 0) if self.causal else (1, 1)
        new_cache = []
        for i in range(n_layers):
            if cache is not None:
                # history supplied explicitly; conv runs VALID in time
                new_cache.append(h[:, -2:])
                h = jnp.concatenate([cache[i].astype(h.dtype), h], axis=1)
                pad_i = (0, 0)
            else:
                pad_i = tpad
            if self.subsampling == "dw_striding" and i > 0:
                h = nn.Conv(
                    h.shape[-1], (3, 3), strides=(2, 2), padding=(pad_i, (1, 1)),
                    feature_group_count=h.shape[-1], dtype=self.dtype, name=f"dw{i}",
                )(h)
                h = nn.Conv(ch, (1, 1), dtype=self.dtype, name=f"pw{i}")(h)
            else:
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding=(pad_i, (1, 1)),
                            dtype=self.dtype, name=f"conv{i}")(h)
            h = nn.relu(h)
        B, T, F, C = h.shape
        h = h.reshape(B, T, F * C)
        out = nn.Dense(self.d_model, dtype=self.dtype, name="out")(h)
        if cache is not None:
            return out, subsampled_length(length, n_layers), new_cache
        return out, subsampled_length(length, n_layers)

    def _fused_x4(self, x, length, ch):
        """Pallas conv-relu-conv path (same params/names as the XLA pair:
        conv0/conv1/out — checkpoint compatible, parity tested)."""
        from nemo_tpu.ops.subsampling_kernel import fused_subsampling_x4

        F = x.shape[2]
        conv0 = nn.Conv(ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name="conv0")
        _ = conv0(jnp.zeros((1, 4, F, 1), self.dtype))
        F2 = (F - 1) // 2 + 1
        conv1 = nn.Conv(ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name="conv1")
        _ = conv1(jnp.zeros((1, 4, F2, ch), self.dtype))
        p0 = conv0.variables["params"]
        p1 = conv1.variables["params"]
        h = fused_subsampling_x4(
            x.astype(self.dtype),
            p0["kernel"].astype(self.dtype), p0["bias"].astype(self.dtype),
            p1["kernel"].astype(self.dtype), p1["bias"].astype(self.dtype),
        )
        T4 = (((x.shape[1] - 1) // 2 + 1) - 1) // 2 + 1
        out = nn.Dense(self.d_model, dtype=self.dtype, name="out")(h[:, :T4])
        return out, subsampled_length(length, 2)


class RelPositionalEncoding(nn.Module):
    """Transformer-XL style relative positional embeddings
    (multi_head_attention.py:1056): returns pe[k] for relative positions
    T-1, T-2, …, 0, …, -(T-1) and the (optionally xscaled) input."""

    d_model: int
    max_len: int = 5000
    xscale: Optional[float] = None
    dropout_emb: float = 0.0

    def setup(self):
        # sinusoidal table for relative positions max_len-1 .. -(max_len-1)
        pos = np.arange(self.max_len - 1, -self.max_len, -1, dtype=np.float32)
        inv = np.exp(np.arange(0, self.d_model, 2, np.float32) * -(math.log(10000.0) / self.d_model))
        pe = np.zeros((len(pos), self.d_model), np.float32)
        pe[:, 0::2] = np.sin(pos[:, None] * inv[None, :])
        pe[:, 1::2] = np.cos(pos[:, None] * inv[None, :])
        self.pe = jnp.asarray(pe)

    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        T = x.shape[1]
        if self.xscale:
            x = x * self.xscale
        center = self.max_len - 1
        pos_emb = jax.lax.dynamic_slice_in_dim(self.pe, center - (T - 1), 2 * T - 1, axis=0)
        return x, pos_emb[None]  # [1, 2T-1, D]


def rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, T, 2T-1] raw q·pos scores → [B, H, T, T] aligned so that
    out[..., i, j] = x[..., i, T-1-i+j] (relative distance i-j)."""
    B, H, T, L = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))  # [B,H,T,2T]
    x = x.reshape(B, H, 2 * T, T)
    x = x[:, :, 1:, :].reshape(B, H, T, L)
    return x[:, :, :, :T]


class _PosKernel(nn.Module):
    """Holds the linear_pos kernel [D, D] so both attention impls share the
    checkpoint path `linear_pos/kernel`."""

    d_model: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(), (self.d_model, self.d_model)
        )


class RelPositionMultiHeadAttention(nn.Module):
    """Rel-pos MHSA (multi_head_attention.py:212) with learned global biases
    pos_bias_u / pos_bias_v (Transformer-XL).

    impl:
      "decomposed" (default) — TPU-native trig decomposition
        (ops/attention.py): the rel-pos term becomes extra MXU contraction
        dims; no [T,2T-1] intermediate, no pad-reshape shift.
      "shift" — the reference pad-reshape formulation (parity testing).
    """

    d_model: int
    n_heads: int
    dropout_att: float = 0.0
    impl: str = "decomposed"
    att_context_size: Any = (-1, -1)  # (left, right); -1 = unlimited
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        pos_emb: jnp.ndarray,
        pad_mask: jnp.ndarray,  # [B, T] True=valid
        *,
        train: bool = False,
        kv_cache: Any = None,  # streaming: {"k","v" [B,L,H,dh], "valid" [B]}
    ) -> jnp.ndarray:
        B, T, D = x.shape
        H = self.n_heads
        dh = D // H

        q = nn.Dense(D, dtype=self.dtype, name="linear_q")(x).reshape(B, T, H, dh)
        k = nn.Dense(D, dtype=self.dtype, name="linear_k")(x).reshape(B, T, H, dh)
        v = nn.Dense(D, dtype=self.dtype, name="linear_v")(x).reshape(B, T, H, dh)
        w_pos = _PosKernel(D, name="linear_pos")()  # [D, D] (in, out)

        u = self.param("pos_bias_u", nn.initializers.zeros, (H, dh))
        vb = self.param("pos_bias_v", nn.initializers.zeros, (H, dh))

        if kv_cache is not None:
            return self._stream_attend(q, k, v, w_pos, u, vb, pad_mask, kv_cache)

        q = jnp.transpose(q, (0, 2, 1, 3))  # [B,H,T,dh]
        k = jnp.transpose(k, (0, 2, 1, 3))
        v = jnp.transpose(v, (0, 2, 1, 3))

        qu = (q + u[None, :, None, :].astype(q.dtype))
        qv = (q + vb[None, :, None, :].astype(q.dtype))

        left, right = self.att_context_size
        ctx_mask = None
        if left >= 0 or right >= 0:
            i = jnp.arange(T)[:, None]
            j = jnp.arange(T)[None, :]
            ctx_mask = jnp.ones((T, T), bool)
            if left >= 0:
                ctx_mask &= (i - j) <= left
            if right >= 0:
                ctx_mask &= (j - i) <= right

        if self.impl in ("decomposed", "decomposed_flash"):
            from nemo_tpu.ops.attention import relpos_attention

            out = relpos_attention(
                qu, qv, k, v,
                w_pos.reshape(D, H, dh),
                pad_mask,
                d_model=D,
                scale=1.0 / math.sqrt(dh),
                ctx_mask=ctx_mask,
                use_flash=(self.impl == "decomposed_flash"),
            )
        else:
            p = jnp.einsum(
                "xjm,md->xjd", pos_emb.astype(self.dtype), w_pos.astype(self.dtype)
            ).reshape(1, -1, H, dh)
            p = jnp.transpose(p, (0, 2, 1, 3))  # [1,H,2T-1,dh]
            ac = jnp.einsum("bhid,bhjd->bhij", qu, k, preferred_element_type=jnp.float32)
            bd = jnp.einsum("bhid,xhjd->bhij", qv, p, preferred_element_type=jnp.float32)
            bd = rel_shift(bd)
            scores = (ac + bd) / math.sqrt(dh)
            mask = pad_mask[:, None, None, :]  # [B,1,1,T] keys
            scores = jnp.where(mask, scores, -1e30)
            if ctx_mask is not None:
                scores = jnp.where(ctx_mask[None, None], scores, -1e30)
            attn = jax.nn.softmax(scores, axis=-1)
            attn = jnp.where(pad_mask[:, None, :, None], attn, 0.0)
            attn = nn.Dropout(self.dropout_att, deterministic=not train)(attn)
            out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)

        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, T, D)
        return nn.Dense(D, dtype=self.dtype, name="linear_out")(out)

    def _stream_attend(self, q, k, v, w_pos, u, vb, pad_mask, kv_cache):
        """Cache-aware streaming attention (reference: ConformerEncoder
        cache_last_channel path, conformer_encoder.py streaming_forward).

        Keys/values = [cached L frames | chunk]; queries = chunk only, with
        a right-aligned KV cache and rel-pos distances d = i + L − j ≥ 0
        (fully causal — att_context_size right must be 0). Exactness vs the
        offline limited-context encoder is tested chunk-size-independently.
        """
        B, T, H, dh = q.shape
        D = H * dh
        L = kv_cache["k"].shape[1]
        left = self.att_context_size[0]

        K = jnp.concatenate([kv_cache["k"].astype(k.dtype), k], axis=1)
        V = jnp.concatenate([kv_cache["v"].astype(v.dtype), v], axis=1)
        new_cache = {
            "k": K[:, -L:] if L else K[:, :0],
            "v": V[:, -L:] if L else V[:, :0],
            "valid": jnp.minimum(kv_cache["valid"] + T, L),
        }

        qu = q + u[None, None].astype(q.dtype)
        qv = q + vb[None, None].astype(q.dtype)
        ac = jnp.einsum("bihd,bjhd->bhij", qu, K,
                        preferred_element_type=jnp.float32)
        # sinusoidal embeddings for distances 0..L+T-1, projected
        n_d = L + T
        dist = jnp.arange(n_d, dtype=jnp.float32)
        inv = jnp.exp(jnp.arange(0, D, 2, dtype=jnp.float32)
                      * -(math.log(10000.0) / D))
        ang = dist[:, None] * inv[None, :]
        pe = jnp.zeros((n_d, D), jnp.float32)
        pe = pe.at[:, 0::2].set(jnp.sin(ang)).at[:, 1::2].set(jnp.cos(ang))
        P = (pe.astype(self.dtype) @ w_pos.astype(self.dtype)).reshape(n_d, H, dh)
        bd_all = jnp.einsum("bihd,jhd->bhij", qv, P,
                            preferred_element_type=jnp.float32)  # [B,H,T,n_d]
        i = jnp.arange(T)
        j = jnp.arange(L + T)
        idx = i[:, None] + L - j[None, :]  # relative key distance
        bd = jnp.take_along_axis(
            bd_all, jnp.clip(idx, 0, n_d - 1)[None, None], axis=-1)
        scores = (ac + bd) / math.sqrt(dh)

        # valid keys: no future (idx>=0), within left window, cache filled,
        # chunk frames unpadded
        ok = (idx >= 0)
        if left >= 0:
            ok &= idx <= left
        cache_ok = j[None, :] >= (L - kv_cache["valid"][:, None])  # [B, L+T]
        chunk_ok = jnp.concatenate(
            [jnp.ones((B, L), bool), pad_mask], axis=1)
        key_ok = cache_ok & chunk_ok  # [B, L+T]
        scores = jnp.where(ok[None, None] & key_ok[:, None, None], scores, -1e30)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhij,bjhd->bihd", attn.astype(V.dtype), V)
        out = out.reshape(B, T, D)
        return nn.Dense(D, dtype=self.dtype, name="linear_out")(out), new_cache


class ConformerFeedForward(nn.Module):
    d_model: int
    expansion_factor: int = 4
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        h = nn.Dense(self.d_model * self.expansion_factor, dtype=self.dtype, name="linear1")(x)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(h)
        return h


class ConformerConvolution(nn.Module):
    """pointwise(2d) → GLU → depthwise(k) → BN|LN → swish → pointwise(d)
    (conformer_modules.py:236)."""

    d_model: int
    kernel_size: int = 31
    norm_type: str = "batch_norm"  # batch_norm | layer_norm
    causal: bool = False  # streaming: left-only padding
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, pad_mask: jnp.ndarray, *, train: bool = False,
        cache: Any = None,  # streaming: [B, k-1, D] GLU-output history
    ) -> jnp.ndarray:
        h = nn.Dense(2 * self.d_model, dtype=self.dtype, name="pointwise1")(x)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.sigmoid(b)  # GLU
        h = jnp.where(pad_mask[..., None], h, 0.0)
        new_cache = None
        if cache is not None:
            # causal depthwise with explicit history (reference
            # cache_last_time): prepend k−1 cached frames, VALID conv
            h = jnp.concatenate([cache.astype(h.dtype), h], axis=1)
            new_cache = h[:, -(self.kernel_size - 1):]
            pad_l = pad_r = 0
        elif self.causal:
            pad_l, pad_r = self.kernel_size - 1, 0
        else:
            pad_l = pad_r = (self.kernel_size - 1) // 2
        h = nn.Conv(
            self.d_model,
            (self.kernel_size,),
            padding=[(pad_l, pad_r)],
            feature_group_count=self.d_model,
            dtype=self.dtype,
            name="depthwise",
        )(h)
        if self.norm_type == "batch_norm":
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                             dtype=jnp.float32, name="norm")(h).astype(self.dtype)
        else:
            h = nn.LayerNorm(dtype=jnp.float32, name="norm")(h).astype(self.dtype)
        h = nn.silu(h)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="pointwise2")(h)
        if cache is not None:
            return h, new_cache
        return h


class ConformerLayer(nn.Module):
    d_model: int
    n_heads: int
    ff_expansion_factor: int = 4
    conv_kernel_size: int = 31
    conv_norm_type: str = "batch_norm"
    dropout: float = 0.0
    dropout_att: float = 0.0
    att_impl: str = "decomposed"
    att_context_size: Any = (-1, -1)
    causal_conv: bool = False
    dtype: Any = jnp.float32
    adapter_dim: int = 0  # >0 → houlsby bottleneck adapter per layer
    #                       (reference: adapter_mixins.py injection)

    @nn.compact
    def __call__(self, x, pos_emb, pad_mask, *, train: bool = False,
                 cache: Any = None):
        drop = lambda h: nn.Dropout(self.dropout, deterministic=not train)(h)
        # LayerNorms compute in fp32 (islands), outputs back to compute dtype
        ln = lambda name: (lambda v: nn.LayerNorm(dtype=jnp.float32, name=name)(v).astype(self.dtype))

        h = ln("norm_ff1")(x)
        h = ConformerFeedForward(self.d_model, self.ff_expansion_factor, self.dropout,
                                 dtype=self.dtype, name="ff1")(h, train=train)
        x = x + 0.5 * drop(h)

        h = ln("norm_attn")(x)
        attn = RelPositionMultiHeadAttention(
            self.d_model, self.n_heads, self.dropout_att, impl=self.att_impl,
            att_context_size=tuple(self.att_context_size),
            dtype=self.dtype, name="attn"
        )
        new_cache = None
        if cache is not None:
            h, new_kv = attn(h, pos_emb, pad_mask, train=train,
                             kv_cache=cache["kv"])
        else:
            h = attn(h, pos_emb, pad_mask, train=train)
        x = x + drop(h)

        h = ln("norm_conv")(x)
        conv = ConformerConvolution(
            self.d_model, self.conv_kernel_size, self.conv_norm_type,
            causal=self.causal_conv, dtype=self.dtype, name="conv"
        )
        if cache is not None:
            h, new_conv = conv(h, pad_mask, train=train, cache=cache["conv"])
            new_cache = {"kv": new_kv, "conv": new_conv}
        else:
            h = conv(h, pad_mask, train=train)
        x = x + drop(h)

        h = ln("norm_ff2")(x)
        h = ConformerFeedForward(self.d_model, self.ff_expansion_factor, self.dropout,
                                 dtype=self.dtype, name="ff2")(h, train=train)
        x = x + 0.5 * drop(h)

        if self.adapter_dim > 0:
            # houlsby residual bottleneck at the layer output (reference:
            # AdapterModuleMixin.forward_enabled_adapters at the end of
            # ConformerLayer; zero-init up-proj → identity at insertion)
            a = nn.LayerNorm(dtype=jnp.float32, name="adapter_norm")(x).astype(self.dtype)
            a = nn.Dense(self.adapter_dim, name="adapter_down")(a)
            a = nn.silu(a)
            a = nn.Dense(self.d_model, kernel_init=nn.initializers.zeros,
                         name="adapter_up")(a)
            x = x + a

        out = nn.LayerNorm(dtype=jnp.float32, name="norm_out")(x).astype(self.dtype)
        if cache is not None:
            return out, new_cache
        return out


class ConformerEncoder(nn.Module):
    """Reference-config-compatible Conformer encoder (conformer_encoder.py:62).

    Accepts the canonical YAML knobs (examples/asr/conf/conformer/*.yaml):
    feat_in, n_layers, d_model, n_heads, subsampling, subsampling_factor,
    subsampling_conv_channels, ff_expansion_factor, conv_kernel_size,
    conv_norm_type, dropout, dropout_att, xscaling, pos_emb_max_len.
    Input [B, D, T] (mel features), output [B, d_model, T'].
    """

    feat_in: int
    n_layers: int
    d_model: int
    n_heads: int
    subsampling: str = "striding"
    subsampling_factor: int = 4
    subsampling_conv_channels: int = -1
    ff_expansion_factor: int = 4
    conv_kernel_size: int = 31
    conv_norm_type: str = "batch_norm"
    dropout: float = 0.1
    dropout_emb: float = 0.0
    dropout_att: float = 0.1
    xscaling: bool = True
    pos_emb_max_len: int = 5000
    att_impl: str = "decomposed"
    att_context_size: Any = (-1, -1)  # (left, right) frames; -1 = unlimited
    causal_downsampling: bool = False
    fused_subsampling: bool = False  # Pallas conv-relu-conv (experimental)
    adapter_dim: int = 0  # houlsby adapters in every layer (PEFT; reference
    #                       adapter_mixins.py add_adapter on ConformerLayer)
    interctc_layers: Any = ()  # layer indices to capture (reference InterCTC,
    #                            conformer_encoder.py:725-736) — sown as
    #                            intermediates['interctc_<i>']
    compute_dtype: str = "float32"

    # semantic port declarations (reference: conformer_encoder.py
    # input_types/output_types via nemo.core Typing, common.py:213);
    # @typecheck validates at TRACE time — free under jit
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
        self, audio_signal: jnp.ndarray, length: jnp.ndarray, *, train: bool = False,
        cache: Any = None,
    ) -> Tuple[jnp.ndarray, ...]:
        """Offline: (mel [B, D, T], lens) → (enc [B, d_model, T'], lens').

        Streaming (`cache` from `init_stream_cache`): processes one fixed
        chunk and returns (+ new_cache); exact vs offline for fully-causal
        configs (att right 0, causal_downsampling). Reference:
        conformer_encoder.py streaming_forward / cache_last_channel+time.
        """
        dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.compute_dtype]
        x = jnp.transpose(audio_signal, (0, 2, 1)).astype(dtype)  # [B, T, D]
        sub = ConvSubsampling(
            d_model=self.d_model,
            feat_in=self.feat_in,
            subsampling=self.subsampling,
            subsampling_factor=self.subsampling_factor,
            conv_channels=self.subsampling_conv_channels,
            causal=self.causal_downsampling,
            fused_kernel=self.fused_subsampling,
            dtype=dtype,
            name="pre_encode",
        )
        if cache is not None:
            x, length, new_sub = sub(x, length, cache=cache["sub"])
        else:
            x, length = sub(x, length)

        xscale = math.sqrt(self.d_model) if self.xscaling else None
        x, pos_emb = RelPositionalEncoding(
            d_model=self.d_model, max_len=self.pos_emb_max_len, xscale=xscale, name="pos_enc"
        )(x, train=train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)

        T = x.shape[1]
        pad_mask = jnp.arange(T)[None, :] < length[:, None]

        new_layers = []
        for i in range(self.n_layers):
            layer = ConformerLayer(
                d_model=self.d_model,
                n_heads=self.n_heads,
                ff_expansion_factor=self.ff_expansion_factor,
                conv_kernel_size=self.conv_kernel_size,
                conv_norm_type=self.conv_norm_type,
                dropout=self.dropout,
                dropout_att=self.dropout_att,
                att_impl=self.att_impl,
                att_context_size=tuple(self.att_context_size),
                causal_conv=self.causal_downsampling or tuple(self.att_context_size)[1] == 0,
                dtype=dtype,
                adapter_dim=self.adapter_dim,
                name=f"layer{i}",
            )
            if cache is not None:
                x, nc = layer(x, pos_emb, pad_mask, train=train,
                              cache=cache["layers"][i])
                new_layers.append(nc)
            else:
                x = layer(x, pos_emb, pad_mask, train=train)
            if i in tuple(self.interctc_layers):
                self.sow("intermediates", f"interctc_{i}", jnp.transpose(x, (0, 2, 1)))

        x = jnp.where(pad_mask[..., None], x, 0.0)
        if cache is not None:
            return jnp.transpose(x, (0, 2, 1)), length, \
                {"sub": new_sub, "layers": new_layers}
        return jnp.transpose(x, (0, 2, 1)), length

    def init_stream_cache(self, batch: int) -> Any:
        """Zero caches for `stream` calls: per-subsampling-conv input rows,
        per-layer right-aligned KV windows (size = left att context) and
        depthwise-conv history. Requires att_context_size=(L≥0, 0)."""
        left, right = tuple(self.att_context_size)
        if right != 0 or left < 0:
            raise ValueError(
                "cache-aware streaming needs att_context_size=(L>=0, 0)")
        if not self.causal_downsampling:
            raise ValueError("cache-aware streaming needs causal_downsampling")
        n_sub = int(math.log2(self.subsampling_factor))
        ch = (self.subsampling_conv_channels
              if self.subsampling_conv_channels > 0 else self.d_model)
        f = self.feat_in
        sub = []
        for i in range(n_sub):
            cin = 1 if i == 0 else ch
            sub.append(jnp.zeros((batch, 2, f, cin), jnp.float32))
            f = (f - 1) // 2 + 1
        dh = self.d_model // self.n_heads
        layers = [
            {
                "kv": {
                    "k": jnp.zeros((batch, left, self.n_heads, dh), jnp.float32),
                    "v": jnp.zeros((batch, left, self.n_heads, dh), jnp.float32),
                    "valid": jnp.zeros((batch,), jnp.int32),
                },
                "conv": jnp.zeros((batch, self.conv_kernel_size - 1,
                                   self.d_model), jnp.float32),
            }
            for _ in range(self.n_layers)
        ]
        return {"sub": sub, "layers": layers}
