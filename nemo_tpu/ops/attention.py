"""Attention ops: trig-decomposed relative-position attention (TPU-native).

The reference computes Transformer-XL rel-pos scores as
  bd[i,j] = (q[i]+v_bias) · linear_pos(pe(i-j))
via a [T, 2T-1] matmul + pad-reshape shift (multi_head_attention.py:212).
On TPU the shift materializes large awkward intermediates and breaks MXU
tiling.

TPU-native reformulation (exact, up to fp rounding): since pe is sinusoidal,
  pe(i-j) = trig expansion in sin/cos(ω·i) and sin/cos(ω·j),
so with g[i] = W_posᵀ (q[i]+v_bias)  (per head),
  bd[i,j] = a[i]·cos(ωj) + b[i]·sin(ωj)
  a[i,f] = g_sin[i,f]·sin(ω_f i) + g_cos[i,f]·cos(ω_f i)
  b[i,f] = g_cos[i,f]·sin(ω_f i) − g_sin[i,f]·cos(ω_f i)
i.e. TWO dense matmuls over F=d_model/2 frequencies — or equivalently ONE
attention matmul with the per-head key/query vectors augmented to
[dh + d_model]. No shift, no gather, flash-attention compatible (the bias
term rides inside the q·k contraction).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def relpos_frequencies(d_model: int) -> np.ndarray:
    """ω_f used by the sinusoidal table (RelPositionalEncoding)."""
    return np.exp(
        np.arange(0, d_model, 2, np.float32) * -(math.log(10000.0) / d_model)
    )


def decompose_relpos_q(
    qv: jnp.ndarray,  # [B, H, T, dh] = q + pos_bias_v
    w_pos: jnp.ndarray,  # [d_model, H, dh] linear_pos kernel (flax layout)
    positions: jnp.ndarray,  # [T] int32 absolute positions (0..T-1)
    d_model: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (a, b, cosW, sinW):
    a, b: [B, H, T, F];  cosW, sinW: [T, F]  with F = d_model/2,
    such that bd[b,h,i,j] = a[b,h,i]·cosW[j] + b[b,h,i]·sinW[j]."""
    omega = jnp.asarray(relpos_frequencies(d_model))  # [F]
    ang = positions.astype(jnp.float32)[:, None] * omega[None, :]  # [T, F]
    sinP, cosP = jnp.sin(ang), jnp.cos(ang)

    # Slice the WEIGHT into its sin/cos frequency rows (small, folded at
    # compile) and run one einsum per component. The former single einsum
    # produced a [B,H,T,d_model] fp32 tensor that was then STRIDE-2 sliced
    # — on TPU that strided slice of a ~400 MB minor-dim tensor forces
    # layout copies that cost more than the whole attention matmul
    # (measured 42 ms/layer at the ASR bench shape; this form ~2 ms).
    w_sin = w_pos[0::2]  # [F, H, dh]
    w_cos = w_pos[1::2]
    g_sin = jnp.einsum("bhtd,fhd->bhtf", qv, w_sin.astype(qv.dtype),
                       preferred_element_type=jnp.float32)
    g_cos = jnp.einsum("bhtd,fhd->bhtf", qv, w_cos.astype(qv.dtype),
                       preferred_element_type=jnp.float32)
    a = g_sin * sinP + g_cos * cosP
    b = g_cos * sinP - g_sin * cosP
    return a, b, cosP, sinP


def relpos_attention(
    qu: jnp.ndarray,  # [B, H, T, dh] = q + pos_bias_u
    qv: jnp.ndarray,  # [B, H, T, dh] = q + pos_bias_v
    k: jnp.ndarray,  # [B, H, T, dh]
    v: jnp.ndarray,  # [B, H, T, dh]
    w_pos: jnp.ndarray,  # [d_model, H, dh]
    pad_mask: jnp.ndarray,  # [B, T] True = valid
    *,
    d_model: int,
    scale: float,
    ctx_mask: Optional[jnp.ndarray] = None,  # [T, T] limited-context mask
    use_flash: bool = False,
) -> jnp.ndarray:
    """Full (non-causal) rel-pos attention via the trig decomposition.

    scores = qu·k^T + a·cosW^T + b·sinW^T, softmax in fp32, masked.
    Returns [B, H, T, dh]."""
    B, H, T, dh = qu.shape
    positions = jnp.arange(T)
    a, b, cosW, sinW = decompose_relpos_q(qv, w_pos, positions, d_model)

    dtype = qu.dtype
    # augmented contraction: concat over feature dim, one MXU matmul
    q_aug = jnp.concatenate(
        [qu.astype(jnp.float32), a, b], axis=-1
    )  # [B,H,T,dh+2F]
    k_aug = jnp.concatenate(
        [
            k.astype(jnp.float32),
            jnp.broadcast_to(cosW[None, None], (B, H, T, cosW.shape[-1])),
            jnp.broadcast_to(sinW[None, None], (B, H, T, sinW.shape[-1])),
        ],
        axis=-1,
    )
    if use_flash and ctx_mask is None and jax.default_backend() != "cpu":
        # pad the time dim to the kernel's 128-lane tile; padded KEYS are
        # masked by the folded bias feature, padded QUERY rows are sliced
        # off below (their garbage never escapes)
        pad_t = (-T) % 128
        if pad_t:
            def padt(x):
                return jnp.concatenate(
                    [x, jnp.zeros(x.shape[:2] + (pad_t,) + x.shape[3:],
                                  x.dtype)], axis=2)

            m_p = jnp.concatenate(
                [pad_mask, jnp.zeros((pad_mask.shape[0], pad_t), bool)], axis=1)
            return _relpos_flash(padt(q_aug), padt(k_aug), padt(v), m_p,
                                 scale, dtype)[:, :, :T]
        return _relpos_flash(q_aug, k_aug, v, pad_mask, scale, dtype)

    scores = jnp.einsum(
        "bhid,bhjd->bhij",
        q_aug.astype(dtype),
        k_aug.astype(dtype),
        preferred_element_type=jnp.float32,
    )
    scores = scores * scale
    # ONE combined key mask → one [B,H,T,T] where pass instead of two
    # (each pass is a full HBM round-trip of the score tensor)
    keep = pad_mask[:, None, None, :]
    if ctx_mask is not None:
        keep = keep & ctx_mask[None, None]
    scores = jnp.where(keep, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    # NO query-side zeroing pass (a full fp32 [B,H,T,T] HBM round-trip per
    # layer): padded-QUERY rows carry garbage that never reaches valid rows
    # — keys are masked above, and the conv module masks its input before
    # the only time-mixing op — exactly the flash path's semantics.
    return jnp.einsum("bhij,bhjd->bhid", probs.astype(v.dtype), v)


def _relpos_flash(q_aug, k_aug, v, pad_mask, scale, dtype):
    """Decomposed rel-pos attention through the Pallas flash kernel.

    Pad masking folds into ONE extra augmented feature: q gets a constant 1,
    k gets 0 (valid) / -BIG (padded) — the score contribution becomes the
    mask bias inside the same MXU contraction. Padded-QUERY rows produce
    garbage that downstream masking (encoder output/conv masks) zeroes,
    matching the XLA path's semantics."""
    from nemo_tpu.ops.flash_attention import flash_attention

    B, H, T, da = q_aug.shape
    big = jnp.float32(-1e9 / scale)
    q_ext = jnp.concatenate([q_aug, jnp.ones((B, H, T, 1), q_aug.dtype)], -1)
    kbias = jnp.where(pad_mask, 0.0, big)[:, None, :, None]
    k_ext = jnp.concatenate(
        [k_aug, jnp.broadcast_to(kbias, (B, H, T, 1)).astype(k_aug.dtype)], -1
    )
    # pad feature dim to a lane multiple for clean Mosaic tiling
    pad_to = (-q_ext.shape[-1]) % 128
    if pad_to:
        zq = jnp.zeros((B, H, T, pad_to), q_ext.dtype)
        q_ext = jnp.concatenate([q_ext, zq], -1)
        k_ext = jnp.concatenate([k_ext, zq], -1)
    bq = 256 if T % 256 == 0 else 128
    bkv = 512 if T % 512 == 0 else (256 if T % 256 == 0 else 128)
    out = flash_attention(
        q_ext.astype(dtype), k_ext.astype(dtype), v.astype(dtype),
        float(scale), False, None, bq, bkv, 0,
    )
    return out
