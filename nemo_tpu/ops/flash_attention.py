"""Pallas TPU flash attention (causal, GQA, sliding-window) — fwd + bwd.

Reference parity: TransformerEngine fused attention, the reference's
attention backend for training AND its flash backward (SURVEY.md §2.9) —
reimplemented as Pallas TPU kernels:

- forward: online-softmax with KV tiled across grid steps (Pallas
  double-buffers the KV block DMAs), so VMEM use is O(block_q·d + block_kv·d)
  regardless of sequence length; saves the per-row logsumexp for the
  backward. Causal/window blocks that are fully masked are skipped on both
  compute (pl.when) and bandwidth (index-map clamping: a repeated block
  index means Pallas re-uses the resident block instead of re-fetching).
- backward: two kernels — dq (grid over q blocks, scan kv blocks) and a
  fused dk/dv (grid over kv blocks, scan q heads × q blocks for GQA
  accumulation) — recomputing p = exp(s·scale − lse) per tile. Training
  memory is O(T) (q, k, v, o, lse residuals); no [T,T] materialization.

Math (FlashAttention-2): with s̃ = s·scale, p = softmax(s̃),
delta = rowsum(dO ∘ O):
  dV = pᵀ dO;  dS̃ = p ∘ (dO Vᵀ − delta);  dQ = scale·dS̃ K;  dK = scale·dS̃ᵀ Q.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _mask_block(s, q_start, kv_start, causal, window):
    """Apply causal/sliding-window mask to one [bq, bkv] score tile.
    q_start/kv_start are absolute positions of the tile origin."""
    bq, bkv = s.shape
    qpos = q_start + jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 0)
    kpos = kv_start + jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1)
    mask = jnp.ones((bq, bkv), jnp.bool_)
    if causal:
        mask = mask & (kpos <= qpos)
    if window is not None:
        mask = mask & (kpos > qpos - window)
    return jnp.where(mask, s, NEG_INF)


def _block_active(q_start, kv_start, bq, bkv, causal, window):
    """True when the [bq, bkv] tile at (q_start, kv_start) has any
    unmasked (q, k) pair."""
    run = True
    if causal:
        run = kv_start <= q_start + bq - 1
    if window is not None:
        run = jnp.logical_and(run, kv_start + bkv - 1 > q_start - window)
    return run


def _needs_mask(q_start, kv_start, bq, bkv, causal, window):
    """True when the tile is only PARTIALLY unmasked (boundary tile)."""
    need = False
    if causal:
        need = kv_start + bkv - 1 > q_start
    if window is not None:
        need = jnp.logical_or(need, kv_start <= q_start + bq - 1 - window)
    return need


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------


def _fwd_kernel(
    q_ref,  # [1, 1, bq, d]
    k_ref,  # [1, 1, bkv, d]
    v_ref,  # [1, 1, bkv, dv]
    o_ref,  # [1, 1, bq, dv]
    lse_ref,  # [1, 1, bq, 1]
    m_scr,  # VMEM [bq, 1] f32
    l_scr,  # VMEM [bq, 1] f32
    acc_scr,  # VMEM [bq, dv] f32
    *,
    scale: float,
    causal: bool,
    window: Optional[int],
    q_offset: int,
    n_kv: int,
    block_q: int,
    block_kv: int,
):
    i = pl.program_id(2)
    j = pl.program_id(3)
    q_start = i * block_q + q_offset
    kv_start = j * block_kv

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(_block_active(q_start, kv_start, block_q, block_kv, causal, window))
    def _step():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        s = (
            jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            * scale
        )
        if causal or window is not None:
            s = jax.lax.cond(
                _needs_mask(q_start, kv_start, block_q, block_kv, causal, window),
                lambda s: _mask_block(s, q_start, kv_start, causal, window),
                lambda s: s,
                s,
            )
        m_prev, l_prev = m_scr[:], l_scr[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        m_scr[:] = m_new
        l_scr[:] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == n_kv - 1)
    def _finish():
        l = jnp.maximum(l_scr[:], 1e-30)
        o_ref[0, 0] = (acc_scr[:] / l).astype(o_ref.dtype)
        lse_ref[0, 0] = (m_scr[:] + jnp.log(l)).astype(jnp.float32)


def _kv_index_map(causal, window, bq, bkv, q_offset, n_kv):
    """Clamp the kv block index so fully-masked steps repeat the previous
    index — Pallas skips the DMA for an unchanged block."""

    def index_map(b, h, i, j, *, G, H):
        q_start = i * bq + q_offset
        jj = j
        if causal:
            j_max = jnp.minimum((q_start + bq - 1) // bkv, n_kv - 1)
            jj = jnp.minimum(jj, j_max)
        if window is not None:
            j_min = jnp.maximum(q_start - window + 1, 0) // bkv
            jj = jnp.maximum(jj, j_min)
        return (b, h * G // H, jj, 0)

    return index_map


def _flash_forward(q, k, v, scale, causal, window, block_q, block_kv, q_offset):
    B, H, Tq, d = q.shape
    G, Tkv = k.shape[1], k.shape[2]
    dv = v.shape[-1]
    bq = min(block_q, Tq)
    bkv = min(block_kv, Tkv)
    assert Tq % bq == 0 and Tkv % bkv == 0, (Tq, bq, Tkv, bkv)
    assert q_offset % bq == 0 or q_offset == 0
    n_q, n_kv = Tq // bq, Tkv // bkv

    kern = functools.partial(
        _fwd_kernel,
        scale=scale, causal=causal, window=window, q_offset=q_offset,
        n_kv=n_kv, block_q=bq, block_kv=bkv,
    )
    kv_map = functools.partial(
        _kv_index_map(causal, window, bq, bkv, q_offset, n_kv), G=G, H=H
    )
    out, lse = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Tq, dv), q.dtype),
            jax.ShapeDtypeStruct((B, H, Tq, 1), jnp.float32),
        ),
        grid=(B, H, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b, h, i, j: (b, h, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv, d), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv, dv), kv_map, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, bq, dv), lambda b, h, i, j: (b, h, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, 1), lambda b, h, i, j: (b, h, i, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, dv), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(4 * B * H * Tq * Tkv * d * (0.5 if causal else 1.0)),
            bytes_accessed=int((q.size + k.size + v.size + q.size) * q.dtype.itemsize),
            transcendentals=int(B * H * Tq * Tkv * (0.5 if causal else 1.0)),
        ),
    )(q, k, v)
    return out, lse


# --------------------------------------------------------------------------
# backward
# --------------------------------------------------------------------------


def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_scr,
    *, scale, causal, window, q_offset, n_kv, block_q, block_kv,
):
    i = pl.program_id(2)
    j = pl.program_id(3)
    q_start = i * block_q + q_offset
    kv_start = j * block_kv

    @pl.when(j == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    @pl.when(_block_active(q_start, kv_start, block_q, block_kv, causal, window))
    def _step():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0]  # [bq, 1]
        delta = delta_ref[0, 0]
        s = (
            jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            * scale
        )
        if causal or window is not None:
            s = _mask_block(s, q_start, kv_start, causal, window)
        p = jnp.exp(s - lse)  # [bq, bkv]
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta) * scale
        dq_scr[:] = dq_scr[:] + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == n_kv - 1)
    def _finish():
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)


def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_scr, dv_scr,
    *, scale, causal, window, q_offset, n_q, rep, block_q, block_kv,
):
    j = pl.program_id(2)   # kv block
    r = pl.program_id(3)   # query-head-in-group (GQA)
    i = pl.program_id(4)   # q block
    q_start = i * block_q + q_offset
    kv_start = j * block_kv

    @pl.when(jnp.logical_and(r == 0, i == 0))
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    @pl.when(_block_active(q_start, kv_start, block_q, block_kv, causal, window))
    def _step():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0]  # [bq, 1]
        delta = delta_ref[0, 0]
        s = (
            jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            * scale
        )
        if causal or window is not None:
            s = _mask_block(s, q_start, kv_start, causal, window)
        p = jnp.exp(s - lse)  # [bq, bkv]
        dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta) * scale  # [bq, bkv]
        dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(jnp.logical_and(r == pl.num_programs(3) - 1, i == n_q - 1))
    def _finish():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_backward(q, k, v, o, lse, g, scale, causal, window, block_q, block_kv, q_offset):
    B, H, Tq, d = q.shape
    G, Tkv = k.shape[1], k.shape[2]
    dv_dim = v.shape[-1]
    rep = H // G
    bq = min(block_q, Tq)
    bkv = min(block_kv, Tkv)
    n_q, n_kv = Tq // bq, Tkv // bkv

    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True)  # [B,H,Tq,1]

    # ---- dq: grid (B, H, n_q, n_kv) ----
    kv_map = functools.partial(
        _kv_index_map(causal, window, bq, bkv, q_offset, n_kv), G=G, H=H
    )
    q_map = lambda b, h, i, j: (b, h, i, 0)
    row_map = lambda b, h, i, j: (b, h, i, 0)
    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel, scale=scale, causal=causal, window=window,
            q_offset=q_offset, n_kv=n_kv, block_q=bq, block_kv=bkv,
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(B, H, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv, d), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv, dv_dim), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, dv_dim), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, 1), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, 1), row_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d), q_map, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=int(6 * B * H * Tq * Tkv * d * (0.5 if causal else 1.0)),
            bytes_accessed=int(2 * (q.size + k.size + v.size) * q.dtype.itemsize),
            transcendentals=int(B * H * Tq * Tkv * (0.5 if causal else 1.0)),
        ),
    )(q, k, v, g, lse, delta)

    # ---- dk/dv fused: grid (B, G, n_kv, rep, n_q) ----
    def q_map_kv(b, gh, j, r, i):
        ii = i
        kv_start = j * bkv
        if causal:
            i_min = jnp.maximum(kv_start - q_offset, 0) // bq
            ii = jnp.maximum(ii, i_min)
        if window is not None:
            i_max = jnp.minimum(
                jnp.maximum(kv_start + bkv - 1 + window - 1 - q_offset, 0) // bq,
                n_q - 1,
            )
            ii = jnp.minimum(ii, i_max)
        return (b, gh * rep + r, ii, 0)

    def row_map_kv(b, gh, j, r, i):
        b_, h_, i_, _ = q_map_kv(b, gh, j, r, i)
        return (b_, h_, i_, 0)

    kv_map2 = lambda b, gh, j, r, i: (b, gh, j, 0)
    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel, scale=scale, causal=causal, window=window,
            q_offset=q_offset, n_q=n_q, rep=rep, block_q=bq, block_kv=bkv,
        ),
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        grid=(B, G, n_kv, rep, n_q),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), q_map_kv, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv, d), kv_map2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv, dv_dim), kv_map2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, dv_dim), q_map_kv, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, 1), row_map_kv, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, 1), row_map_kv, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, bkv, d), kv_map2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv, dv_dim), kv_map2, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((bkv, d), jnp.float32),
            pltpu.VMEM((bkv, dv_dim), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(6 * B * H * Tq * Tkv * d * (0.5 if causal else 1.0)),
            bytes_accessed=int(2 * (q.size + k.size + v.size) * q.dtype.itemsize),
            transcendentals=int(B * H * Tq * Tkv * (0.5 if causal else 1.0)),
        ),
    )(q, k, v, g, lse, delta)
    return dq, dk, dv


# --------------------------------------------------------------------------
# public API (custom_vjp)
# --------------------------------------------------------------------------


def _xla_reference(q, k, v, scale, causal, window, q_offset):
    B, H, Tq, dh = q.shape
    G, Tkv = k.shape[1], k.shape[2]
    rep = H // G
    qg = q.reshape(B, G, rep, Tq, dh)
    s = jnp.einsum("bgrid,bgjd->bgrij", qg, k, preferred_element_type=jnp.float32) * scale
    qpos = jnp.arange(Tq) + q_offset
    kpos = jnp.arange(Tkv)
    mask = jnp.ones((Tq, Tkv), bool)
    if causal:
        mask = mask & (kpos[None] <= qpos[:, None])
    if window is not None:
        mask = mask & (kpos[None] > qpos[:, None] - window)
    s = jnp.where(mask[None, None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bgrij,bgjd->bgrid", p.astype(v.dtype), v)
    return o.reshape(B, H, Tq, dh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def flash_attention(
    q, k, v,
    scale: float = 1.0,
    causal: bool = True,
    window: Optional[int] = None,
    block_q: int = 512,
    block_kv: int = 512,
    q_offset: int = 0,
):
    """[B,H,Tq,dh] × [B,G,Tkv,dh]² → [B,H,Tq,dh]; GQA when G<H."""
    out, _ = _flash_forward(q, k, v, scale, causal, window, block_q, block_kv, q_offset)
    return out


def _fwd(q, k, v, scale, causal, window, block_q, block_kv, q_offset):
    out, lse = _flash_forward(q, k, v, scale, causal, window, block_q, block_kv, q_offset)
    return out, (q, k, v, out, lse)


def _bwd(scale, causal, window, block_q, block_kv, q_offset, res, g):
    q, k, v, o, lse = res
    return _flash_backward(
        q, k, v, o, lse, g, scale, causal, window, block_q, block_kv, q_offset
    )


flash_attention.defvjp(_fwd, _bwd)


# --------------------------------------------------------------------------
# position-aware variant (ring/context-parallel building block)
#
# Masks from explicit per-token position vectors instead of block offsets,
# so arbitrary (e.g. zig-zag load-balanced) sequence chunk layouts work.
# Returns (o, lse) so partial attentions can be merged online across ring
# steps; the backward accepts a cotangent for lse (dS̃ += g_lse ∘ p, folded
# into delta' = delta − g_lse).
# --------------------------------------------------------------------------


def _pos_mask(s, qp, kp, causal, window):
    """qp: [bq,1] i32; kp: [1,bkv] i32; s: [bq,bkv] f32."""
    mask = jnp.ones(s.shape, jnp.bool_)
    if causal:
        mask = mask & (kp <= qp)
    if window is not None:
        mask = mask & (kp > qp - window)
    return jnp.where(mask, s, NEG_INF)


def _pos_active(qp, kp, causal, window):
    run = True
    if causal:
        run = jnp.min(kp) <= jnp.max(qp)
    if window is not None:
        run = jnp.logical_and(run, jnp.max(kp) > jnp.min(qp) - window)
    return run


def _fwd_pos_kernel(
    q_ref, k_ref, v_ref, qpos_ref, kpos_ref, o_ref, lse_ref,
    m_scr, l_scr, acc_scr, *, scale, causal, window, n_kv,
):
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    qp = qpos_ref[:]  # [bq, 1]
    kp = kpos_ref[:]  # [1, bkv]

    @pl.when(_pos_active(qp, kp, causal, window))
    def _step():
        q, k, v = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        s = _pos_mask(s, qp, kp, causal, window)
        m_prev, l_prev = m_scr[:], l_scr[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        m_scr[:] = m_new
        l_scr[:] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == n_kv - 1)
    def _finish():
        l = jnp.maximum(l_scr[:], 1e-30)
        o_ref[0, 0] = (acc_scr[:] / l).astype(o_ref.dtype)
        # fully-masked rows: lse = -inf surrogate (NEG_INF) so merging ignores
        lse_ref[0, 0] = jnp.where(
            m_scr[:] <= NEG_INF / 2, NEG_INF, m_scr[:] + jnp.log(l)
        ).astype(jnp.float32)


def _dq_pos_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, qpos_ref, kpos_ref,
    dq_ref, dq_scr, *, scale, causal, window, n_kv,
):
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    qp = qpos_ref[:]
    kp = kpos_ref[:]

    @pl.when(_pos_active(qp, kp, causal, window))
    def _step():
        q, k, v, do = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], do_ref[0, 0]
        lse, delta = lse_ref[0, 0], delta_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        s = _pos_mask(s, qp, kp, causal, window)
        # rows with lse == NEG_INF attended nothing: force p = 0 there
        p = jnp.where(lse > NEG_INF / 2, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta) * scale
        dq_scr[:] = dq_scr[:] + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == n_kv - 1)
    def _finish():
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)


def _dkv_pos_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, qpos_ref, kpos_ref,
    dk_ref, dv_ref, dk_scr, dv_scr, *, scale, causal, window, n_q,
):
    r = pl.program_id(3)
    i = pl.program_id(4)

    @pl.when(jnp.logical_and(r == 0, i == 0))
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    qp = qpos_ref[:]
    kp = kpos_ref[:]

    @pl.when(_pos_active(qp, kp, causal, window))
    def _step():
        q, k, v, do = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], do_ref[0, 0]
        lse, delta = lse_ref[0, 0], delta_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        s = _pos_mask(s, qp, kp, causal, window)
        p = jnp.where(lse > NEG_INF / 2, jnp.exp(s - lse), 0.0)
        dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta) * scale
        dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(jnp.logical_and(r == pl.num_programs(3) - 1, i == n_q - 1))
    def _finish():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _pos_operands(qpos, kpos):
    """qpos [Tq] i32 → [Tq,1]; kpos [Tkv] i32 → [1,Tkv]."""
    return qpos.astype(jnp.int32)[:, None], kpos.astype(jnp.int32)[None, :]


def _flash_forward_pos(q, k, v, qpos, kpos, scale, causal, window, block_q, block_kv):
    B, H, Tq, d = q.shape
    G, Tkv = k.shape[1], k.shape[2]
    dv = v.shape[-1]
    bq, bkv = min(block_q, Tq), min(block_kv, Tkv)
    assert Tq % bq == 0 and Tkv % bkv == 0
    n_q, n_kv = Tq // bq, Tkv // bkv
    qp2, kp2 = _pos_operands(qpos, kpos)

    q_map = lambda b, h, i, j: (b, h, i, 0)
    kv_map = lambda b, h, i, j: (b, h * G // H, j, 0)
    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_pos_kernel, scale=scale, causal=causal, window=window, n_kv=n_kv
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Tq, dv), q.dtype),
            jax.ShapeDtypeStruct((B, H, Tq, 1), jnp.float32),
        ),
        grid=(B, H, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv, d), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv, dv), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 1), lambda b, h, i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv), lambda b, h, i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, bq, dv), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, 1), q_map, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, dv), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(4 * B * H * Tq * Tkv * d * (0.5 if causal else 1.0)),
            bytes_accessed=int((2 * q.size + k.size + v.size) * q.dtype.itemsize),
            transcendentals=int(B * H * Tq * Tkv * (0.5 if causal else 1.0)),
        ),
    )(q, k, v, qp2, kp2)
    return out, lse


def _flash_backward_pos(q, k, v, o, lse, qpos, kpos, g, g_lse,
                        scale, causal, window, block_q, block_kv):
    B, H, Tq, d = q.shape
    G, Tkv = k.shape[1], k.shape[2]
    dv_dim = v.shape[-1]
    rep = H // G
    bq, bkv = min(block_q, Tq), min(block_kv, Tkv)
    n_q, n_kv = Tq // bq, Tkv // bkv
    qp2, kp2 = _pos_operands(qpos, kpos)

    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1,
                    keepdims=True)
    if g_lse is not None:
        delta = delta - g_lse.astype(jnp.float32)

    q_map = lambda b, h, i, j: (b, h, i, 0)
    kv_map = lambda b, h, i, j: (b, h * G // H, j, 0)
    dq = pl.pallas_call(
        functools.partial(
            _dq_pos_kernel, scale=scale, causal=causal, window=window, n_kv=n_kv
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(B, H, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv, d), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv, dv_dim), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, dv_dim), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, 1), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, 1), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 1), lambda b, h, i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv), lambda b, h, i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d), q_map, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
    )(q, k, v, g, lse, delta, qp2, kp2)

    q_map_kv = lambda b, gh, j, r, i: (b, gh * rep + r, i, 0)
    kv_map2 = lambda b, gh, j, r, i: (b, gh, j, 0)
    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_pos_kernel, scale=scale, causal=causal, window=window, n_q=n_q
        ),
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        grid=(B, G, n_kv, rep, n_q),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), q_map_kv, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv, d), kv_map2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv, dv_dim), kv_map2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, dv_dim), q_map_kv, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, 1), q_map_kv, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, 1), q_map_kv, memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 1), lambda b, gh, j, r, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv), lambda b, gh, j, r, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, bkv, d), kv_map2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv, dv_dim), kv_map2, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((bkv, d), jnp.float32),
            pltpu.VMEM((bkv, dv_dim), jnp.float32),
        ],
    )(q, k, v, g, lse, delta, qp2, kp2)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def flash_attention_positions(
    q, k, v, qpos, kpos,
    scale: float = 1.0,
    causal: bool = True,
    window: Optional[int] = None,
    block_q: int = 512,
    block_kv: int = 512,
):
    """Flash attention with explicit position vectors; returns (o, lse).

    qpos: [Tq] i32 global positions of the query rows; kpos: [Tkv] i32 of
    the key rows. Rows whose positions attend nothing get o=0, lse=NEG_INF
    (safe for online merging across ring steps)."""
    return _flash_forward_pos(q, k, v, qpos, kpos, scale, causal, window, block_q, block_kv)


def _pos_fwd(q, k, v, qpos, kpos, scale, causal, window, block_q, block_kv):
    out, lse = _flash_forward_pos(q, k, v, qpos, kpos, scale, causal, window, block_q, block_kv)
    return (out, lse), (q, k, v, out, lse, qpos, kpos)


def _pos_bwd(scale, causal, window, block_q, block_kv, res, cts):
    q, k, v, o, lse, qpos, kpos = res
    g, g_lse = cts
    dq, dk, dv = _flash_backward_pos(
        q, k, v, o, lse, qpos, kpos, g, g_lse, scale, causal, window, block_q, block_kv
    )
    return dq, dk, dv, None, None


flash_attention_positions.defvjp(_pos_fwd, _pos_bwd)


def xla_attention_positions(q, k, v, qpos, kpos, scale=1.0, causal=True, window=None):
    """XLA (einsum) counterpart of flash_attention_positions → (o, lse).
    Used as the ring-attention inner on backends without Pallas (CPU tests)
    and as the parity reference. O(T²) memory — small shapes only."""
    B, H, Tq, dh = q.shape
    G, Tkv = k.shape[1], k.shape[2]
    rep = H // G
    qg = q.reshape(B, G, rep, Tq, dh)
    s = jnp.einsum("bgrid,bgjd->bgrij", qg, k, preferred_element_type=jnp.float32) * scale
    mask = jnp.ones((Tq, Tkv), bool)
    if causal:
        mask = mask & (kpos[None, :] <= qpos[:, None])
    if window is not None:
        mask = mask & (kpos[None, :] > qpos[:, None] - window)
    s = jnp.where(mask[None, None, None], s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    msafe = jnp.maximum(m, NEG_INF / 2)
    p = jnp.exp(s - msafe)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bgrij,bgjd->bgrid", (p / jnp.maximum(l, 1e-30)).astype(v.dtype), v)
    lse = jnp.where(m <= NEG_INF / 2, NEG_INF, msafe + jnp.log(jnp.maximum(l, 1e-30)))
    return (
        o.reshape(B, H, Tq, dh).astype(q.dtype),
        lse.reshape(B, H, Tq, 1),
    )


# --------------------------------------------------------------------------
# packed-sequence variant (per-row segment ids)
#
# Masks attention to within-segment pairs so several short documents packed
# into one row train as if they were separate sequences (reference: TE fused
# attention with THD/packed qkv_format driven by PackedSeqParams,
# gpt/model/base.py:775). Segment ids are [B, S] int32, 0 = padding,
# monotonically laid out by the packer; masked-out rows get o = 0.
# --------------------------------------------------------------------------


def _seg_mask(s, qs, ks):
    """qs: [bq,1] i32, ks: [1,bkv] i32 — keep same-nonzero-segment pairs."""
    return jnp.where((qs == ks) & (ks > 0), s, NEG_INF)


def _seg_overlap(qs, ks):
    """Sound superset test: segment id ranges intersect. Never skips a
    block containing a needed pair (ids equal → ranges overlap)."""
    return jnp.logical_and(
        jnp.min(ks) <= jnp.max(qs), jnp.max(ks) >= jnp.min(qs)
    )


def _fwd_seg_kernel(
    q_ref, k_ref, v_ref, qseg_ref, kseg_ref, o_ref, lse_ref,
    m_scr, l_scr, acc_scr,
    *, scale, causal, window, n_kv, block_q, block_kv,
):
    i = pl.program_id(2)
    j = pl.program_id(3)
    q_start = i * block_q
    kv_start = j * block_kv

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    qs = qseg_ref[0]  # [bq, 1]
    ks = kseg_ref[0]  # [1, bkv]
    run = _block_active(q_start, kv_start, block_q, block_kv, causal, window)
    run = jnp.logical_and(run, _seg_overlap(qs, ks))

    @pl.when(run)
    def _step():
        q, k, v = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if causal or window is not None:
            s = _mask_block(s, q_start, kv_start, causal, window)
        s = _seg_mask(s, qs, ks)
        m_prev, l_prev = m_scr[:], l_scr[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        m_safe = jnp.maximum(m_new, NEG_INF / 2)
        p = jnp.exp(s - m_safe)
        alpha = jnp.exp(jnp.maximum(m_prev, NEG_INF / 2) - m_safe)
        m_scr[:] = m_new
        l_scr[:] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == n_kv - 1)
    def _finish():
        l = jnp.maximum(l_scr[:], 1e-30)
        o_ref[0, 0] = jnp.where(
            m_scr[:] <= NEG_INF / 2, 0.0, acc_scr[:] / l
        ).astype(o_ref.dtype)
        lse_ref[0, 0] = jnp.where(
            m_scr[:] <= NEG_INF / 2, NEG_INF,
            jnp.maximum(m_scr[:], NEG_INF / 2) + jnp.log(l),
        ).astype(jnp.float32)


def _dq_seg_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, qseg_ref, kseg_ref,
    dq_ref, dq_scr, *, scale, causal, window, n_kv, block_q, block_kv,
):
    i = pl.program_id(2)
    j = pl.program_id(3)
    q_start = i * block_q
    kv_start = j * block_kv

    @pl.when(j == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    qs = qseg_ref[0]
    ks = kseg_ref[0]
    run = _block_active(q_start, kv_start, block_q, block_kv, causal, window)
    run = jnp.logical_and(run, _seg_overlap(qs, ks))

    @pl.when(run)
    def _step():
        q, k, v, do = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], do_ref[0, 0]
        lse, delta = lse_ref[0, 0], delta_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if causal or window is not None:
            s = _mask_block(s, q_start, kv_start, causal, window)
        s = _seg_mask(s, qs, ks)
        p = jnp.where(lse > NEG_INF / 2, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta) * scale
        dq_scr[:] = dq_scr[:] + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == n_kv - 1)
    def _finish():
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)


def _dkv_seg_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, qseg_ref, kseg_ref,
    dk_ref, dv_ref, dk_scr, dv_scr,
    *, scale, causal, window, n_q, block_q, block_kv,
):
    j = pl.program_id(2)
    r = pl.program_id(3)
    i = pl.program_id(4)
    q_start = i * block_q
    kv_start = j * block_kv

    @pl.when(jnp.logical_and(r == 0, i == 0))
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    qs = qseg_ref[0]
    ks = kseg_ref[0]
    run = _block_active(q_start, kv_start, block_q, block_kv, causal, window)
    run = jnp.logical_and(run, _seg_overlap(qs, ks))

    @pl.when(run)
    def _step():
        q, k, v, do = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], do_ref[0, 0]
        lse, delta = lse_ref[0, 0], delta_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if causal or window is not None:
            s = _mask_block(s, q_start, kv_start, causal, window)
        s = _seg_mask(s, qs, ks)
        p = jnp.where(lse > NEG_INF / 2, jnp.exp(s - lse), 0.0)
        dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta) * scale
        dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(jnp.logical_and(r == pl.num_programs(3) - 1, i == n_q - 1))
    def _finish():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _seg_operands(segments, Tq, Tkv):
    """[B, S] int32 → ([B, Tq, 1], [B, 1, Tkv]) block-friendly carriers."""
    seg = segments.astype(jnp.int32)
    return seg[:, :, None], seg[:, None, :]


def _flash_forward_seg(q, k, v, segments, scale, causal, window,
                       block_q, block_kv):
    B, H, Tq, d = q.shape
    G, Tkv = k.shape[1], k.shape[2]
    dv = v.shape[-1]
    bq, bkv = min(block_q, Tq), min(block_kv, Tkv)
    assert Tq % bq == 0 and Tkv % bkv == 0
    n_q, n_kv = Tq // bq, Tkv // bkv
    qs3, ks3 = _seg_operands(segments, Tq, Tkv)

    kv_map = functools.partial(
        _kv_index_map(causal, window, bq, bkv, 0, n_kv), G=G, H=H)

    def kseg_map(b, h, i, j):
        _, _, jj, _ = kv_map(b, h, i, j)
        return (b, 0, jj)

    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_seg_kernel, scale=scale, causal=causal, window=window,
            n_kv=n_kv, block_q=bq, block_kv=bkv,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Tq, dv), q.dtype),
            jax.ShapeDtypeStruct((B, H, Tq, 1), jnp.float32),
        ),
        grid=(B, H, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b, h, i, j: (b, h, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv, d), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv, dv), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda b, h, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv), kseg_map, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, bq, dv), lambda b, h, i, j: (b, h, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, 1), lambda b, h, i, j: (b, h, i, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, dv), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(4 * B * H * Tq * Tkv * d * (0.5 if causal else 1.0)),
            bytes_accessed=int((2 * q.size + k.size + v.size) * q.dtype.itemsize),
            transcendentals=int(B * H * Tq * Tkv * (0.5 if causal else 1.0)),
        ),
    )(q, k, v, qs3, ks3)
    return out, lse


def _flash_backward_seg(q, k, v, o, lse, segments, g, scale, causal, window,
                        block_q, block_kv):
    B, H, Tq, d = q.shape
    G, Tkv = k.shape[1], k.shape[2]
    dv_dim = v.shape[-1]
    rep = H // G
    bq, bkv = min(block_q, Tq), min(block_kv, Tkv)
    n_q, n_kv = Tq // bq, Tkv // bkv
    qs3, ks3 = _seg_operands(segments, Tq, Tkv)

    delta = jnp.sum(
        g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True)

    kv_map = functools.partial(
        _kv_index_map(causal, window, bq, bkv, 0, n_kv), G=G, H=H)

    def kseg_map(b, h, i, j):
        _, _, jj, _ = kv_map(b, h, i, j)
        return (b, 0, jj)

    q_map = lambda b, h, i, j: (b, h, i, 0)
    dq = pl.pallas_call(
        functools.partial(
            _dq_seg_kernel, scale=scale, causal=causal, window=window,
            n_kv=n_kv, block_q=bq, block_kv=bkv,
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(B, H, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv, d), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv, dv_dim), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, dv_dim), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, 1), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, 1), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda b, h, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv), kseg_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d), q_map, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
    )(q, k, v, g, lse, delta, qs3, ks3)

    # dk/dv: grid (B, G, n_kv, rep, n_q) with causal q-block clamping
    def q_map_kv(b, gh, j, r, i):
        ii = i
        kv_start = j * bkv
        if causal:
            ii = jnp.maximum(ii, jnp.maximum(kv_start, 0) // bq)
        if window is not None:
            ii = jnp.minimum(
                ii,
                jnp.minimum(
                    jnp.maximum(kv_start + bkv - 1 + window - 1, 0) // bq,
                    n_q - 1,
                ),
            )
        return (b, gh * rep + r, ii, 0)

    def row_map_kv(b, gh, j, r, i):
        b_, h_, i_, _ = q_map_kv(b, gh, j, r, i)
        return (b_, h_, i_, 0)

    def qseg_map_kv(b, gh, j, r, i):
        b_, h_, i_, _ = q_map_kv(b, gh, j, r, i)
        return (b_, i_, 0)

    kv_map2 = lambda b, gh, j, r, i: (b, gh, j, 0)
    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_seg_kernel, scale=scale, causal=causal, window=window,
            n_q=n_q, block_q=bq, block_kv=bkv,
        ),
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        grid=(B, G, n_kv, rep, n_q),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), q_map_kv, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv, d), kv_map2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv, dv_dim), kv_map2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, dv_dim), q_map_kv, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, 1), row_map_kv, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, 1), row_map_kv, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), qseg_map_kv, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv), lambda b, gh, j, r, i: (b, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, bkv, d), kv_map2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv, dv_dim), kv_map2, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((bkv, d), jnp.float32),
            pltpu.VMEM((bkv, dv_dim), jnp.float32),
        ],
    )(q, k, v, g, lse, delta, qs3, ks3)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def flash_attention_packed(
    q, k, v, segments,
    scale: float = 1.0,
    causal: bool = True,
    window: Optional[int] = None,
    block_q: int = 512,
    block_kv: int = 512,
):
    """Flash attention over packed sequences: [B,H,T,dh] with [B,T]
    segment ids (0 = pad); attention stays within same-id spans."""
    out, _ = _flash_forward_seg(
        q, k, v, segments, scale, causal, window, block_q, block_kv)
    return out


def _seg_fwd(q, k, v, segments, scale, causal, window, block_q, block_kv):
    out, lse = _flash_forward_seg(
        q, k, v, segments, scale, causal, window, block_q, block_kv)
    return out, (q, k, v, out, lse, segments)


def _seg_bwd(scale, causal, window, block_q, block_kv, res, g):
    q, k, v, o, lse, segments = res
    dq, dk, dv = _flash_backward_seg(
        q, k, v, o, lse, segments, g, scale, causal, window, block_q, block_kv)
    return dq, dk, dv, None


flash_attention_packed.defvjp(_seg_fwd, _seg_bwd)
