"""TDT loss vs numpy reference DP + frame-skipping greedy decode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu.ops.tdt import tdt_greedy_decode, tdt_loss


def numpy_tdt_nll(lp_tok, lp_dur, target, T, U, blank, durations):
    NEG = -1e30
    alpha = np.full((T, U + 1), NEG)
    alpha[0, 0] = 0.0
    # iterate in topological order: t ascending, u ascending (d=0 token moves u)
    for t in range(T):
        for u in range(U + 1):
            cands = [alpha[t, u]] if not (t == 0 and u == 0) else [alpha[0, 0]]
            val = alpha[t, u]
            for di, d in enumerate(durations):
                ts = t - d
                if ts < 0:
                    continue
                # token emission from (ts, u-1)
                if u > 0 and not (d == 0 and ts != t):
                    v = alpha[ts, u - 1] + lp_tok[ts, u - 1, target[u - 1]] + lp_dur[ts, u - 1, di]
                    val = np.logaddexp(val, v)
                # blank from (ts, u), d >= 1
                if d >= 1:
                    v = alpha[ts, u] + lp_tok[ts, u, blank] + lp_dur[ts, u, di]
                    val = np.logaddexp(val, v)
            alpha[t, u] = val
    exit_dur = np.logaddexp.reduce(
        [lp_dur[T - 1, U, di] for di, d in enumerate(durations) if d >= 1]
    )
    return -(alpha[T - 1, U] + lp_tok[T - 1, U, blank] + exit_dur)


@pytest.mark.parametrize("seed", [0, 1])
def test_tdt_loss_vs_numpy(seed):
    rng = np.random.RandomState(seed)
    B, T, U, V, durations = 2, 10, 4, 6, (0, 1, 2)
    tok = rng.randn(B, T, U + 1, V).astype(np.float32)
    dur = rng.randn(B, T, U + 1, len(durations)).astype(np.float32)
    targets = rng.randint(0, V - 1, (B, U)).astype(np.int32)
    f_len = np.array([T, T - 3], np.int32)
    t_len = np.array([U, U - 2], np.int32)

    ours = np.asarray(tdt_loss(
        jnp.asarray(tok), jnp.asarray(dur), jnp.asarray(targets),
        jnp.asarray(f_len), jnp.asarray(t_len), durations,
    ))

    lp_tok = np.asarray(jax.nn.log_softmax(jnp.asarray(tok), axis=-1))
    lp_dur = np.asarray(jax.nn.log_softmax(jnp.asarray(dur), axis=-1))
    for b in range(B):
        ref = numpy_tdt_nll(lp_tok[b], lp_dur[b], targets[b],
                            int(f_len[b]), int(t_len[b]), V - 1, durations)
        np.testing.assert_allclose(ours[b], ref, rtol=1e-4, atol=1e-4)


def test_tdt_greedy_skips_frames():
    """A joint that always emits blank with duration 2 visits T/2 frames."""
    B, T, H, V, D = 2, 16, 4, 3, 3  # durations (0,1,2); blank=3

    calls = []

    def joint_fn(enc_t, pred):
        calls.append(1)
        tok = jnp.full((B, V + 1), -5.0).at[:, V].set(5.0)
        dur = jnp.full((B, D), -5.0).at[:, 2].set(5.0)  # always d=2
        return tok, dur

    def pred_step_fn(token, state):
        return jnp.zeros((B, H)), state

    enc = jnp.zeros((B, T, H))
    tokens, counts = tdt_greedy_decode(
        joint_fn, pred_step_fn, (), enc, jnp.array([T, T]), blank=V,
        durations=(0, 1, 2),
    )
    assert np.asarray(counts).tolist() == [0, 0]


def test_tdt_model_end_to_end():
    from nemo_tpu.core.config import ConfigDict
    from nemo_tpu.models.asr.rnnt_models import EncDecRNNTModel

    labels = [" "] + [chr(ord("a") + i) for i in range(26)] + ["'"]
    cfg = ConfigDict(
        sample_rate=16000, labels=labels,
        preprocessor=dict(features=32, dither=0.0),
        encoder=dict(feat_in=32, jasper=[
            dict(filters=32, repeat=1, kernel=33, stride=2, separable=True),
            dict(filters=48, repeat=1, kernel=1)]),
        decoder=dict(pred_hidden=32, pred_rnn_layers=1),
        joint=dict(joint_hidden=32),
        model_defaults=dict(tdt_durations=[0, 1, 2, 3]),
    )
    model = EncDecRNNTModel(cfg)
    sig = jnp.asarray(np.random.RandomState(0).randn(2, 16000).astype(np.float32) * 0.05)
    lens = jnp.array([16000, 9000], jnp.int32)
    targets = jnp.asarray(np.random.RandomState(1).randint(0, 27, (2, 5)), jnp.int32)
    tlen = jnp.array([5, 3], jnp.int32)
    logits, enc_len = model._jit_logits(model.variables, sig, lens, targets)
    assert isinstance(logits, tuple) and logits[1].shape[-1] == 4
    loss = model.loss(logits, targets, enc_len, tlen)
    assert np.isfinite(float(loss))
    out = model.transcribe([np.zeros(8000, np.float32)])
    assert isinstance(out[0], str)
