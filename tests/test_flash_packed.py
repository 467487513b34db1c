"""Packed-sequence (segment-id) Pallas flash attention vs XLA reference.

Reference behavior: TE fused attention in THD/packed format driven by
PackedSeqParams (gpt/model/base.py:775) — attention confined to same-id
spans, pads (id 0) attend nothing.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from nemo_tpu.ops.flash_attention import NEG_INF, flash_attention_packed


def _xla_packed_ref(q, k, v, segments, scale, causal, window):
    B, H, Tq, dh = q.shape
    G, Tkv = k.shape[1], k.shape[2]
    rep = H // G
    qg = q.reshape(B, G, rep, Tq, dh)
    s = jnp.einsum("bgrid,bgjd->bgrij", qg, k,
                   preferred_element_type=jnp.float32) * scale
    qpos, kpos = jnp.arange(Tq), jnp.arange(Tkv)
    mask = (segments[:, :, None] == segments[:, None, :]) & (
        segments[:, None, :] > 0)
    if causal:
        mask = mask & (kpos[None, None] <= qpos[None, :, None])
    if window is not None:
        mask = mask & (kpos[None, None] > qpos[None, :, None] - window)
    s = jnp.where(mask[:, None, None], s, NEG_INF)
    dead = ~mask.any(-1)  # rows that attend nothing (pads)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bgrij,bgjd->bgrid", p.astype(v.dtype), v)
    o = o.reshape(B, H, Tq, dh)
    return jnp.where(dead[:, None, :, None], 0.0, o)


def _mk(B=2, H=4, G=2, T=256, dh=64, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, H, T, dh).astype(np.float32))
    k = jnp.asarray(rng.randn(B, G, T, dh).astype(np.float32))
    v = jnp.asarray(rng.randn(B, G, T, dh).astype(np.float32))
    return q, k, v


def _segments(B, T, seed=1):
    """Random per-row packing: 2-4 docs then pad tail (id 0)."""
    rng = np.random.RandomState(seed)
    seg = np.zeros((B, T), np.int32)
    for b in range(B):
        n_docs = rng.randint(2, 5)
        cuts = np.sort(rng.choice(np.arange(8, T - 8), n_docs, replace=False))
        start, sid = 0, 1
        for c in list(cuts[:-1]) + [int(cuts[-1])]:
            seg[b, start:c] = sid
            start, sid = c, sid + 1
        # pad tail after the last cut stays 0
    return jnp.asarray(seg)


@pytest.mark.parametrize("causal,window", [(True, None), (False, None), (True, 64)])
def test_packed_forward_vs_reference(causal, window):
    q, k, v = _mk()
    seg = _segments(2, 256)
    scale = 1.0 / np.sqrt(64)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention_packed(q, k, v, seg, scale, causal, window, 128, 128)
    ref = _xla_packed_ref(q, k, v, seg, scale, causal, window)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_packed_gradients_match():
    q, k, v = _mk(B=1, H=2, G=2, T=128)
    seg = _segments(1, 128, seed=3)
    scale = 1.0 / np.sqrt(64)

    def f_flash(q, k, v):
        return jnp.sum(
            flash_attention_packed(q, k, v, seg, scale, True, None, 64, 64) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(_xla_packed_ref(q, k, v, seg, scale, True, None) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3)


def test_packed_matches_unpacked_per_document():
    """Packing two docs into one row == attending each doc separately."""
    rng = np.random.RandomState(5)
    dh, H = 64, 2
    d1, d2 = 128, 128
    T = d1 + d2
    q = jnp.asarray(rng.randn(1, H, T, dh).astype(np.float32))
    k = jnp.asarray(rng.randn(1, H, T, dh).astype(np.float32))
    v = jnp.asarray(rng.randn(1, H, T, dh).astype(np.float32))
    seg = jnp.asarray(np.concatenate(
        [np.full(d1, 1), np.full(d2, 2)])[None], jnp.int32)
    scale = 1.0 / np.sqrt(dh)
    with pltpu.force_tpu_interpret_mode():
        packed = flash_attention_packed(q, k, v, seg, scale, True, None, 64, 64)
        from nemo_tpu.ops.flash_attention import flash_attention

        a = flash_attention(q[:, :, :d1], k[:, :, :d1], v[:, :, :d1],
                            scale, True, None, 64, 64, 0)
        b = flash_attention(q[:, :, d1:], k[:, :, d1:], v[:, :, d1:],
                            scale, True, None, 64, 64, 0)
    np.testing.assert_allclose(
        np.asarray(packed[:, :, :d1]), np.asarray(a), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(packed[:, :, d1:]), np.asarray(b), atol=2e-5, rtol=1e-4)
