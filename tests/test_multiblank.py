"""Multiblank RNNT: loss vs an independent numpy DP; big blanks reduce to
standard RNNT when absent from the distribution; greedy decode skips frames;
model-level training + transcribe."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu.ops.multiblank import multiblank_greedy_decode, multiblank_rnnt_loss
from nemo_tpu.ops.rnnt import rnnt_loss


def _np_multiblank_dp(logp, target, T, U, durs):
    """Reference DP, plain python: alpha[t, u]."""
    NEG = -1e30
    V = logp.shape[-1] - len(durs)  # first blank index

    def lse(vals):
        vals = [v for v in vals if v > NEG / 2]
        if not vals:
            return NEG
        m = max(vals)
        return m + np.log(sum(np.exp(v - m) for v in vals))

    alpha = np.full((T, U + 1), NEG)
    alpha[0, 0] = 0.0
    for t in range(T):
        for u in range(U + 1):
            arrivals = []
            if t == 0 and u == 0:
                continue
            for i, d in enumerate(durs):
                if t - d >= 0:
                    arrivals.append(alpha[t - d, u] + logp[t - d, u, V + i])
            if u > 0:
                arrivals.append(alpha[t, u - 1] + logp[t, u - 1, target[u - 1]])
            alpha[t, u] = lse(arrivals)
    finals = []
    for i, d in enumerate(durs):
        if T - d >= 0:
            finals.append(alpha[T - d, U] + logp[T - d, U, V + i])
    return -lse(finals)


def test_multiblank_loss_matches_numpy_dp():
    rng = np.random.RandomState(0)
    B, T, U, V = 2, 8, 3, 5
    bigs = (2, 3)
    logits = rng.randn(B, T, U + 1, V + 1 + len(bigs)).astype(np.float32)
    targets = rng.randint(0, V, (B, U)).astype(np.int32)
    f_len = np.array([8, 6], np.int32)
    t_len = np.array([3, 2], np.int32)

    got = np.asarray(multiblank_rnnt_loss(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(f_len),
        jnp.asarray(t_len), bigs))
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    for b in range(B):
        ref = _np_multiblank_dp(logp[b], targets[b], int(f_len[b]),
                                int(t_len[b]), (1,) + bigs)
        np.testing.assert_allclose(got[b], ref, atol=1e-4, rtol=1e-5)


def test_multiblank_reduces_to_rnnt_when_big_blanks_impossible():
    """Drive big-blank logits to -inf: loss must equal standard RNNT loss."""
    rng = np.random.RandomState(1)
    B, T, U, V = 2, 6, 2, 4
    bigs = (2,)
    base = rng.randn(B, T, U + 1, V + 1).astype(np.float32)
    big_col = np.full((B, T, U + 1, 1), -1e9, np.float32)
    logits = np.concatenate([base, big_col], axis=-1)
    targets = rng.randint(0, V, (B, U)).astype(np.int32)
    f_len = np.array([6, 5], np.int32)
    t_len = np.array([2, 2], np.int32)

    got = np.asarray(multiblank_rnnt_loss(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(f_len),
        jnp.asarray(t_len), bigs))
    ref = np.asarray(rnnt_loss(
        jnp.asarray(base), jnp.asarray(targets), jnp.asarray(f_len),
        jnp.asarray(t_len)))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_multiblank_greedy_skips_frames():
    """A joint that always prefers the d=3 big blank visits ~T/3 frames."""
    V, T, B = 4, 12, 1
    blank = V
    bigs = (3,)
    calls = []

    def joint_fn(enc_t, pred_out):
        calls.append(1)
        logits = np.full((B, V + 2), -5.0, np.float32)
        logits[:, V + 1] = 5.0  # big blank d=3
        return jnp.asarray(logits)

    def pred_step_fn(token, state):
        return jnp.zeros((token.shape[0], 2), jnp.float32), state

    enc = jnp.zeros((B, T, 3))
    toks, counts = multiblank_greedy_decode(
        joint_fn, pred_step_fn, (jnp.zeros((B, 2)),), enc,
        jnp.asarray([T]), blank, bigs)
    assert int(counts[0]) == 0  # only blanks


def test_multiblank_model_end_to_end():
    from nemo_tpu.core.config import ConfigDict
    from nemo_tpu.models.asr.rnnt_models import EncDecRNNTModel

    labels = [str(i) for i in range(8)]
    cfg = ConfigDict(
        sample_rate=16000, labels=labels,
        preprocessor={"features": 16, "dither": 0.0},
        encoder={"feat_in": 16, "jasper": [
            {"filters": 24, "repeat": 1, "kernel": 5, "separable": False}]},
        decoder={"pred_hidden": 16, "pred_rnn_layers": 1, "vocabulary": labels},
        joint={"joint_hidden": 16},
        model_defaults={"big_blank_durations": [2, 4]},
    )
    m = EncDecRNNTModel(cfg)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 16, 40), jnp.float32)
    lens = jnp.asarray([40, 32], jnp.int32)
    targets = jnp.asarray(rng.randint(0, 8, (2, 4)), jnp.int32)
    tlens = jnp.asarray([4, 3], jnp.int32)
    logits, enc_len = m.net.apply(m.variables, feats, lens, targets, train=False)
    assert logits.shape[-1] == 8 + 1 + 2
    loss = m.loss(logits, targets, enc_len, tlens)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda v: m.loss(
        m.net.apply(v, feats, lens, targets, train=False)[0],
        targets, enc_len, tlens))(m.variables)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
