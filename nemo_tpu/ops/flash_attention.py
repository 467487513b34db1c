"""Pallas TPU flash attention (causal, GQA, sliding-window, segment ids).

Reference parity: TransformerEngine fused attention (the reference's
attention backend, SURVEY.md §2.9) — reimplemented as a Pallas TPU kernel:
online-softmax tiling in VMEM, zero HBM intermediates, causal block
skipping, grouped-query head mapping in the BlockSpec index maps.

Backward: custom_vjp that recomputes attention with the XLA einsum path —
equivalent memory to full rematerialization (the same trade the reference
makes with recompute + flash backward), exact gradients.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(
    q_ref,  # [bq, dh]
    k_ref,  # [Tkv, dh]
    v_ref,  # [Tkv, dh]
    o_ref,  # [bq, dh]
    *,
    scale: float,
    block_kv: int,
    causal: bool,
    window: Optional[int],
    q_offset_blocks: int,
):
    bq = q_ref.shape[-2]
    dv = v_ref.shape[-1]
    Tkv = k_ref.shape[-2]
    i = pl.program_id(2)  # query block index

    q = q_ref[0, 0]  # keep input dtype (bf16): MXU-native, fp32 accumulate

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, dv), jnp.float32)

    n_kv = Tkv // block_kv
    # causal: only kv blocks whose start <= last query position
    q_start = (i + q_offset_blocks) * bq

    def body(j, carry):
        m, l, acc = carry
        kv_start = j * block_kv
        k_blk = k_ref[0, 0, pl.ds(kv_start, block_kv), :]
        v_blk = v_ref[0, 0, pl.ds(kv_start, block_kv), :]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [bq, block_kv] fp32 accumulators

        def masked(s):
            qpos = q_start + jax.lax.broadcasted_iota(jnp.int32, (bq, block_kv), 0)
            kpos = kv_start + jax.lax.broadcasted_iota(jnp.int32, (bq, block_kv), 1)
            mask = jnp.ones((bq, block_kv), jnp.bool_)
            if causal:
                mask = mask & (kpos <= qpos)
            if window is not None:
                mask = mask & (kpos > qpos - window)
            return jnp.where(mask, s, NEG_INF)

        if causal or window is not None:
            # mask only boundary blocks; interior blocks skip the VPU work
            on_diag = (kv_start + block_kv - 1) > q_start
            near_win = (
                (kv_start <= q_start + bq - 1 - (window or 0) + block_kv)
                if window is not None
                else False
            )
            s = jax.lax.cond(on_diag | near_win if window is not None else on_diag,
                             masked, lambda s: s, s)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    if causal:
        upper = jnp.minimum((q_start + bq + block_kv - 1) // block_kv, n_kv)
    else:
        upper = n_kv
    lower = 0
    if window is not None:
        lower = jnp.maximum((q_start - window) // block_kv, 0)
    m, l, acc = jax.lax.fori_loop(lower, upper, body, (m0, l0, acc0))
    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_forward(
    q: jnp.ndarray,  # [B, H, Tq, dh]
    k: jnp.ndarray,  # [B, G, Tkv, dh]
    v: jnp.ndarray,
    scale: float,
    causal: bool,
    window: Optional[int],
    block_q: int,
    block_kv: int,
    q_offset: int,
) -> jnp.ndarray:
    B, H, Tq, dh = q.shape
    G, Tkv = k.shape[1], k.shape[2]
    dv = v.shape[-1]
    bq = min(block_q, Tq)
    bkv = min(block_kv, Tkv)
    assert Tq % bq == 0 and Tkv % bkv == 0, (Tq, bq, Tkv, bkv)
    assert q_offset % bq == 0 or q_offset == 0

    kernel = functools.partial(
        _flash_kernel,
        scale=scale,
        block_kv=bkv,
        causal=causal,
        window=window,
        q_offset_blocks=q_offset // bq,
    )
    grid = (B, H, Tq // bq)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, Tq, dv), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, dh), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tkv, dh), lambda b, h, i: (b, h * G // H, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tkv, dv), lambda b, h, i: (b, h * G // H, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, dv), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * B * H * Tq * Tkv * dh * (0.5 if causal else 1.0)),
            bytes_accessed=int((q.size + k.size + v.size + q.size) * q.dtype.itemsize),
            transcendentals=int(B * H * Tq * Tkv),
        ),
    )(q, k, v)


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


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8)
)
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
    return _flash_forward(q, k, v, scale, causal, window, block_q, block_kv, q_offset)


def _fwd(q, k, v, scale, causal, window, block_q, block_kv, q_offset):
    out = _flash_forward(q, k, v, scale, causal, window, block_q, block_kv, q_offset)
    return out, (q, k, v)


def _bwd(scale, causal, window, block_q, block_kv, q_offset, res, g):
    q, k, v = res
    # recompute-based exact backward through the XLA formulation
    def f(q, k, v):
        return _xla_reference(q, k, v, scale, causal, window, q_offset)

    _, vjp = jax.vjp(f, q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
