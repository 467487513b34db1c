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


def test_beta_binomial_prior_matches_scipy():
    from scipy.stats import betabinom
    from nemo_tpu.models.tts.modules.aligner import beta_binomial_prior

    B, T, U = 2, 12, 5
    text_len = np.array([5, 3], np.int32)
    mel_len = np.array([12, 9], np.int32)
    prior = np.asarray(beta_binomial_prior(
        jnp.asarray(text_len), jnp.asarray(mel_len), U, T, 1.0))
    for b in range(B):
        N, M = int(text_len[b]), int(mel_len[b])
        for t in range(1, M + 1):
            ref = betabinom(N - 1, t, M + 1 - t).logpmf(np.arange(N))
            np.testing.assert_allclose(prior[b, t - 1, :N], ref, atol=1e-4)
        # outside valid region: -inf-ish
        assert (prior[b, M:, :] < -1e29).all()
        assert (prior[b, :, N:] < -1e29).all()


def test_binarization_loss_prefers_peaked_attention():
    from nemo_tpu.models.tts.modules.aligner import binarization_loss

    B, T, U = 1, 12, 4
    text_len = np.array([4], np.int32)
    mel_len = np.array([12], np.int32)
    la = _diag_attn(B, T, U, text_len, mel_len)
    dur = viterbi_durations(la, jnp.asarray(text_len), jnp.asarray(mel_len))
    sharp = binarization_loss(la, dur, jnp.asarray(mel_len))
    flat = jnp.full((B, T, U), -np.log(U), jnp.float32)
    diffuse = binarization_loss(flat, dur, jnp.asarray(mel_len))
    assert float(sharp) < float(diffuse)
    assert np.isfinite(float(sharp))


def test_aligner_model_trains_and_aligns():
    from nemo_tpu.core.config import ConfigDict
    from nemo_tpu.models.tts.aligner_model import AlignerModel

    m = AlignerModel(ConfigDict(n_mels=8, d_text=16, d_att=16, total_steps=10))
    step_fn, opt_state = m.make_train_step(lr=2e-3)
    rng = np.random.RandomState(0)
    B, U, T = 2, 6, 24
    tokens = jnp.asarray(rng.randint(1, 20, (B, U)), jnp.int32)
    token_len = jnp.asarray([6, 4], jnp.int32)
    mels = jnp.asarray(rng.randn(B, T, 8), jnp.float32)
    mel_len = jnp.asarray([24, 18], jnp.int32)
    v = m.variables
    losses, fs = [], []
    for i in range(8):
        v, opt_state, total, parts = step_fn(
            v, opt_state, tokens, token_len, mels, mel_len, jnp.asarray(i))
        losses.append(float(total))
        fs.append(float(parts["forward_sum"]))
    assert all(np.isfinite(losses))
    # the bin loss ramps in after bin_loss_start so the total is not monotone;
    # the forward-sum alignment NLL itself must improve
    assert fs[-1] < fs[0]
    m.variables = v
    dur = np.asarray(m.get_durations(tokens, token_len, mels, mel_len))
    assert dur.shape == (B, U)
    assert dur[0].sum() == 24 and dur[1].sum() == 18
