"""TTS aligner: forward-sum loss + Viterbi durations."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu.models.tts.modules.aligner import (
    AlignmentEncoder,
    forward_sum_loss,
    viterbi_durations,
)


def _diag_attn(B, T, U, text_len, mel_len, noise=0.0, seed=0):
    """Log-attn peaked on the proportional diagonal."""
    rng = np.random.RandomState(seed)
    logits = np.full((B, T, U), -10.0, np.float32)
    for b in range(B):
        for t in range(mel_len[b]):
            u = min(int(t * text_len[b] / mel_len[b]), text_len[b] - 1)
            logits[b, t, u] = 0.0
    logits += noise * rng.randn(B, T, U).astype(np.float32)
    return jnp.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))


def test_forward_sum_finite_and_grad():
    B, T, U = 2, 20, 6
    text_len = np.array([6, 4], np.int32)
    mel_len = np.array([20, 14], np.int32)
    la = _diag_attn(B, T, U, text_len, mel_len, noise=0.5)
    loss = forward_sum_loss(la, jnp.asarray(text_len), jnp.asarray(mel_len))
    assert np.isfinite(np.asarray(loss)).all()
    g = jax.grad(lambda x: jnp.sum(forward_sum_loss(x, jnp.asarray(text_len), jnp.asarray(mel_len))))(la)
    assert np.isfinite(np.asarray(g)).all()
    # diagonal-aligned attention scores better than anti-diagonal
    bad = la[:, ::-1, :]
    loss_bad = forward_sum_loss(bad, jnp.asarray(text_len), jnp.asarray(mel_len))
    assert float(loss[0]) < float(loss_bad[0])


def test_viterbi_durations_sum_and_shape():
    B, T, U = 2, 20, 6
    text_len = np.array([6, 4], np.int32)
    mel_len = np.array([20, 14], np.int32)
    la = _diag_attn(B, T, U, text_len, mel_len)
    dur = np.asarray(viterbi_durations(la, jnp.asarray(text_len), jnp.asarray(mel_len)))
    for b in range(B):
        assert dur[b].sum() == mel_len[b], dur[b]
        assert (dur[b, : text_len[b]] > 0).all()
        assert (dur[b, text_len[b]:] == 0).all()
    # proportional diagonal → near-uniform durations
    assert abs(int(dur[0].max()) - int(dur[0].min())) <= 2


def test_alignment_encoder_shapes():
    B, T, U = 2, 16, 5
    enc = AlignmentEncoder(d_att=32)
    text = jnp.asarray(np.random.RandomState(0).randn(B, U, 8), jnp.float32)
    mel = jnp.asarray(np.random.RandomState(1).randn(B, T, 12), jnp.float32)
    tm = jnp.ones((B, U), bool)
    mm = jnp.ones((B, T), bool)
    v = enc.init(jax.random.PRNGKey(0), text, mel, tm, mm)
    la = enc.apply(v, text, mel, tm, mm)
    assert la.shape == (B, T, U)
    # normalized over text dim
    s = np.exp(np.asarray(la[0, 0])).sum()
    assert abs(s - 1.0) < 1e-4
