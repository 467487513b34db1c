"""Ring attention (CP) vs full attention on an 8-device CPU mesh."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from nemo_tpu.ops.flash_attention import _xla_reference
from nemo_tpu.ops.ring_attention import (
    ring_attention,
    zigzag_chunk_ids,
    zigzag_shard,
    zigzag_unshard,
)


def _mesh(cp):
    devs = np.array(jax.devices()[:cp]).reshape(cp)
    return Mesh(devs, ("cp",))


@pytest.mark.parametrize("causal", [True, False])
def test_ring_attention_matches_full(causal):
    cp = 4
    B, H, G, T, dh = 2, 4, 2, 64, 16
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, T, dh).astype(np.float32))
    k = jnp.asarray(rng.randn(B, G, T, dh).astype(np.float32))
    v = jnp.asarray(rng.randn(B, G, T, dh).astype(np.float32))
    scale = 1.0 / np.sqrt(dh)

    mesh = _mesh(cp)
    spec = P(None, None, "cp", None)
    fn = shard_map(
        functools.partial(ring_attention, axis_name="cp", scale=scale, causal=causal),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )
    out = jax.jit(fn)(q, k, v)
    ref = _xla_reference(q, k, v, scale, causal, None, 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_ring_attention_zigzag():
    cp = 4
    B, H, G, T, dh = 1, 2, 2, 64, 16
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(B, H, T, dh).astype(np.float32))
    k = jnp.asarray(rng.randn(B, G, T, dh).astype(np.float32))
    v = jnp.asarray(rng.randn(B, G, T, dh).astype(np.float32))
    scale = 1.0 / np.sqrt(dh)

    qz = zigzag_shard(q, cp, seq_axis=2)
    kz = zigzag_shard(k, cp, seq_axis=2)
    vz = zigzag_shard(v, cp, seq_axis=2)

    mesh = _mesh(cp)
    spec = P(None, None, "cp", None)
    ids_all = jnp.asarray(zigzag_chunk_ids(cp))  # [cp, 2]

    def body(q, k, v, ids):
        return ring_attention(q, k, v, axis_name="cp", scale=scale, causal=True,
                              chunk_ids=ids[0])

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(spec, spec, spec, P("cp", None)),
        out_specs=spec,
    )
    out_z = jax.jit(fn)(qz, kz, vz, ids_all)
    out = zigzag_unshard(out_z, cp, seq_axis=2)
    ref = _xla_reference(q, k, v, scale, True, None, 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_zigzag_roundtrip():
    x = jnp.arange(32.0).reshape(1, 32)
    z = zigzag_shard(x, 4, seq_axis=1)
    back = zigzag_unshard(z, 4, seq_axis=1)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
