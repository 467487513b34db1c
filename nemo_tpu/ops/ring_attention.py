"""Ring attention for context parallelism (CP).

Reference parity (SURVEY.md §2.10 CP row): TE fused attention with p2p ring
KV exchange (`cp_comm_type="p2p"`), the long-context axis of the reference
(128K–1M tokens via CP=4..32). TPU-native: `shard_map` over the `cp` mesh
axis; each step computes a local attention block with online-softmax
merging while `ppermute` rotates the KV shard around the ICI ring —
communication overlaps compute under XLA's latency-hiding scheduler.

Zig-zag load balancing (reference: chunk i + 2cp−1−i per rank,
`get_batch_on_this_cp_rank` gpt/model/base.py:110) is provided by
`zigzag_shard/zigzag_unshard` on the sequence dim before/after.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


def ring_attention(
    q: jnp.ndarray,  # [B, H, Tl, dh] local query shard
    k: jnp.ndarray,  # [B, G, Tl, dh] local key shard
    v: jnp.ndarray,
    *,
    axis_name: str = "cp",
    scale: float = 1.0,
    causal: bool = True,
    chunk_ids: Optional[jnp.ndarray] = None,  # [n_local_chunks] global chunk ids
) -> jnp.ndarray:
    """Run inside shard_map with the sequence dim sharded over `axis_name`.

    Without `chunk_ids`, rank r holds contiguous chunk r. With zig-zag
    balancing, pass the global chunk ids this rank holds (concatenated
    equal-size chunks along the seq dim).
    """
    cp = jax.lax.axis_size(axis_name)
    r = jax.lax.axis_index(axis_name)
    B, H, Tl, dh = q.shape
    G = k.shape[1]
    rep = H // G

    if chunk_ids is None:
        n_chunks = 1
        chunk_len = Tl
        my_chunks = r[None]
    else:
        n_chunks = chunk_ids.shape[0]
        chunk_len = Tl // n_chunks
        my_chunks = chunk_ids

    # global positions of the local queries
    off = jnp.repeat(my_chunks * chunk_len, chunk_len) + jnp.tile(
        jnp.arange(chunk_len), n_chunks
    )
    qpos = off  # [Tl]

    qg = q.reshape(B, G, rep, Tl, dh)

    def step(carry, i):
        m, l, acc, k_i, v_i, kpos_i = carry
        s = jnp.einsum(
            "bgrid,bgjd->bgrij", qg, k_i, preferred_element_type=jnp.float32
        ) * scale
        if causal:
            mask = kpos_i[None, :] <= qpos[:, None]
            s = jnp.where(mask[None, None, None], s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.einsum(
            "bgrij,bgjd->bgrid", p.astype(v_i.dtype), v_i
        )
        perm = [(j, (j + 1) % cp) for j in range(cp)]
        k_nxt = jax.lax.ppermute(k_i, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_i, axis_name, perm)
        kpos_nxt = jax.lax.ppermute(kpos_i, axis_name, perm)
        return (m_new, l_new, acc_new, k_nxt, v_nxt, kpos_nxt), None

    # mark accumulators device-varying over the ring axis (shard_map vma rule)
    m0 = jax.lax.pvary(jnp.full((B, G, rep, Tl, 1), NEG_INF, jnp.float32), axis_name)
    l0 = jax.lax.pvary(jnp.zeros((B, G, rep, Tl, 1), jnp.float32), axis_name)
    acc0 = jax.lax.pvary(jnp.zeros((B, G, rep, Tl, dh), jnp.float32), axis_name)
    kpos0 = qpos  # local kv shard covers same chunks as local q
    (m, l, acc, *_), _ = jax.lax.scan(
        step, (m0, l0, acc0, k, v, kpos0), jnp.arange(cp)
    )
    out = acc / jnp.maximum(l, 1e-30)
    return out.reshape(B, H, Tl, dh).astype(q.dtype)


def zigzag_chunk_ids(cp: int) -> np.ndarray:
    """[cp, 2]: rank r gets chunks (r, 2cp−1−r) — causal load balance
    (reference parallelisms.rst:365, TE load-balanced CP)."""
    return np.stack([np.arange(cp), 2 * cp - 1 - np.arange(cp)], axis=1)


def zigzag_shard(x: jnp.ndarray, cp: int, seq_axis: int = 1) -> jnp.ndarray:
    """Reorder a GLOBAL sequence so contiguous cp-sharding yields zig-zag
    chunk assignment: output shard r = concat(chunk r, chunk 2cp−1−r)."""
    ids = zigzag_chunk_ids(cp).reshape(-1)
    chunks = jnp.split(x, 2 * cp, axis=seq_axis)
    return jnp.concatenate([chunks[i] for i in ids], axis=seq_axis)


def zigzag_unshard(x: jnp.ndarray, cp: int, seq_axis: int = 1) -> jnp.ndarray:
    ids = zigzag_chunk_ids(cp).reshape(-1)
    inv = np.argsort(ids)
    chunks = jnp.split(x, 2 * cp, axis=seq_axis)
    return jnp.concatenate([chunks[i] for i in inv], axis=seq_axis)


def ring_flash_attention(
    q: jnp.ndarray,  # [B, H, Tl, dh] local query shard
    k: jnp.ndarray,  # [B, G, Tl, dh] local key shard
    v: jnp.ndarray,
    qpos: jnp.ndarray,  # [Tl] i32 global positions of local rows
    *,
    axis_name: str = "cp",
    scale: float = 1.0,
    causal: bool = True,
    window: int | None = None,
    block_q: int = 512,
    block_kv: int = 512,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Ring attention with the Pallas flash kernel as the per-step block
    compute: O(block) VMEM and O(Tl) HBM per step, exact online-softmax
    merging of (o, lse) partials across ring steps. Run inside shard_map
    with the sequence dim sharded over `axis_name`; `qpos` carries global
    positions so zig-zag (causal load-balanced) layouts mask correctly
    (reference: TE CP p2p ring + get_batch_on_this_cp_rank,
    gpt/model/base.py:110)."""
    from nemo_tpu.ops.flash_attention import (
        NEG_INF,
        flash_attention_positions,
        xla_attention_positions,
    )

    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"
    cp = jax.lax.axis_size(axis_name)
    B, H, Tl, dh = q.shape
    perm = [(j, (j + 1) % cp) for j in range(cp)]

    def step(carry, _):
        o, lse, k_i, v_i, kpos_i = carry
        if use_pallas:
            o_i, lse_i = flash_attention_positions(
                q, k_i, v_i, qpos, kpos_i, scale, causal, window, block_q, block_kv
            )
        else:
            o_i, lse_i = xla_attention_positions(
                q, k_i, v_i, qpos, kpos_i, scale, causal, window
            )
        o_i = o_i.astype(jnp.float32)
        lse_new = jnp.logaddexp(lse, lse_i)
        w_prev = jnp.exp(lse - lse_new)
        w_new = jnp.exp(lse_i - lse_new)
        o = o * w_prev + o_i * w_new
        k_n = jax.lax.ppermute(k_i, axis_name, perm)
        v_n = jax.lax.ppermute(v_i, axis_name, perm)
        kpos_n = jax.lax.ppermute(kpos_i, axis_name, perm)
        return (o, lse_new, k_n, v_n, kpos_n), None

    o0 = jax.lax.pvary(jnp.zeros((B, H, Tl, dh), jnp.float32), axis_name)
    lse0 = jax.lax.pvary(jnp.full((B, H, Tl, 1), NEG_INF, jnp.float32), axis_name)
    (o, lse, *_), _ = jax.lax.scan(step, (o0, lse0, k, v, qpos), None, length=cp)
    return o.astype(q.dtype)
