"""Conformer encoder unit tests: rel_shift math, shapes, masking invariance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu.models.asr.modules.conformer import (
    ConformerEncoder,
    RelPositionalEncoding,
    rel_shift,
    subsampled_length,
)


def test_rel_shift_matches_gather():
    B, H, T = 1, 2, 7
    rng = np.random.RandomState(0)
    raw = rng.randn(B, H, T, 2 * T - 1).astype(np.float32)
    out = np.asarray(rel_shift(jnp.asarray(raw)))
    # out[i, j] should be raw[i, T-1-i+j]
    for i in range(T):
        for j in range(T):
            np.testing.assert_allclose(out[0, 0, i, j], raw[0, 0, i, T - 1 - i + j], rtol=1e-6)


def test_subsampled_length():
    lens = jnp.array([100, 101, 7, 1])
    out = subsampled_length(lens, 2)
    np.testing.assert_array_equal(np.asarray(out), [25, 26, 2, 1])


@pytest.fixture(scope="module")
def tiny_encoder():
    enc = ConformerEncoder(
        feat_in=32, n_layers=2, d_model=64, n_heads=4, subsampling_factor=4, dropout=0.0, dropout_att=0.0
    )
    feats = jnp.zeros((2, 32, 64), jnp.float32)
    lens = jnp.array([64, 40], jnp.int32)
    variables = enc.init(jax.random.PRNGKey(0), feats, lens, train=False)
    return enc, variables


def test_conformer_shapes(tiny_encoder):
    enc, variables = tiny_encoder
    feats = jnp.asarray(np.random.RandomState(0).randn(2, 32, 64), jnp.float32)
    lens = jnp.array([64, 40], jnp.int32)
    out, out_len = enc.apply(variables, feats, lens, train=False)
    assert out.shape == (2, 64, 16)
    np.testing.assert_array_equal(np.asarray(out_len), [16, 10])


def test_padding_invariance(tiny_encoder):
    """Output at valid positions must not depend on padding content."""
    enc, variables = tiny_encoder
    rng = np.random.RandomState(1)
    base = rng.randn(1, 32, 64).astype(np.float32)
    lens = jnp.array([40], jnp.int32)

    a = base.copy()
    b = base.copy()
    b[:, :, 40:] = 99.0  # garbage in padding
    oa, la = enc.apply(variables, jnp.asarray(a), lens, train=False)
    ob, _ = enc.apply(variables, jnp.asarray(b), lens, train=False)
    valid = int(la[0])
    np.testing.assert_allclose(
        np.asarray(oa)[:, :, :valid], np.asarray(ob)[:, :, :valid], atol=2e-5
    )


def test_spec_augment():
    from nemo_tpu.ops.spec_augment import spec_augment

    spec = jnp.ones((2, 80, 100), jnp.float32)
    lens = jnp.array([100, 60], jnp.int32)
    out = spec_augment(jax.random.PRNGKey(0), spec, lens)
    out = np.asarray(out)
    assert out.shape == spec.shape
    assert (out == 0.0).any()  # some masking happened
    assert (out == 1.0).any()  # not everything masked


def test_limited_context_attention():
    """att_context_size=(L,0): output at frame t must not depend on frames > t."""
    enc = ConformerEncoder(
        feat_in=32, n_layers=1, d_model=64, n_heads=4, subsampling_factor=4,
        dropout=0.0, dropout_att=0.0, att_context_size=(4, 0),
    )
    feats = jnp.zeros((1, 32, 64), jnp.float32)
    lens = jnp.array([64], jnp.int32)
    variables = enc.init(jax.random.PRNGKey(0), feats, lens)

    rng = np.random.RandomState(0)
    a = rng.randn(1, 32, 64).astype(np.float32)
    b = a.copy()
    b[:, :, 48:] += 5.0  # change the future
    oa, _ = enc.apply(variables, jnp.asarray(a), lens)
    ob, _ = enc.apply(variables, jnp.asarray(b), lens)
    # after x4 subsampling, frame 48 → subsampled idx 12; early frames
    # (idx < 8, allowing conv k=31 receptive field... causal convs: none)
    np.testing.assert_allclose(
        np.asarray(oa)[:, :, :8], np.asarray(ob)[:, :, :8], atol=1e-4
    )
