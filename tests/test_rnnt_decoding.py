"""RNNT decoding: label-looping == frame-loop, beam ≥ greedy likelihood."""

import numpy as np

import jax
import jax.numpy as jnp

from nemo_tpu.models.asr.modules.rnnt import (
    rnnt_beam_decode,
    rnnt_greedy_decode,
    rnnt_greedy_decode_label_looping,
)


def _random_transducer(V=5, He=8, Hp=8, seed=0):
    """A tiny stateless 'model': joint = linear(enc)+linear(pred); the
    prediction 'network' is an embedding-averaging recurrence."""
    rng = np.random.RandomState(seed)
    Wj_e = jnp.asarray(rng.randn(He, V + 1) * 0.7, jnp.float32)
    Wj_p = jnp.asarray(rng.randn(Hp, V + 1) * 0.7, jnp.float32)
    emb = jnp.asarray(rng.randn(V + 1, Hp), jnp.float32)

    def joint_fn(enc_t, pred_out):
        return enc_t @ Wj_e + pred_out @ Wj_p

    def pred_step_fn(token, state):
        (h,) = state
        e = emb[jnp.maximum(token, 0)]
        e = jnp.where((token >= 0)[:, None], e, 0.0)
        h = 0.6 * h + 0.4 * e
        return h, (h,)

    def initial_state(B):
        return (jnp.zeros((B, Hp), jnp.float32),)

    return joint_fn, pred_step_fn, initial_state, V


def test_label_looping_matches_frame_loop_token_exact():
    joint_fn, pred_step_fn, init_state, V = _random_transducer()
    rng = np.random.RandomState(1)
    B, T, He = 3, 12, 8
    enc = jnp.asarray(rng.randn(B, T, He), jnp.float32)
    enc_len = jnp.asarray([12, 7, 10], jnp.int32)
    a_tok, a_n = rnnt_greedy_decode(
        joint_fn, pred_step_fn, init_state(B), enc, enc_len, blank=V, max_symbols=4
    )
    b_tok, b_n = rnnt_greedy_decode_label_looping(
        joint_fn, pred_step_fn, init_state(B), enc, enc_len, blank=V, max_symbols=4
    )
    a_tok, a_n = np.asarray(a_tok), np.asarray(a_n)
    b_tok, b_n = np.asarray(b_tok), np.asarray(b_n)
    np.testing.assert_array_equal(a_n, b_n)
    for b in range(B):
        np.testing.assert_array_equal(a_tok[b, : a_n[b]], b_tok[b, : b_n[b]])


def test_beam_size_one_matches_greedy():
    joint_fn, pred_step_fn, init_state, V = _random_transducer(seed=2)
    rng = np.random.RandomState(3)
    B, T, He = 2, 10, 8
    enc = jnp.asarray(rng.randn(B, T, He), jnp.float32)
    enc_len = jnp.asarray([10, 6], jnp.int32)
    g_tok, g_n = rnnt_greedy_decode_label_looping(
        joint_fn, pred_step_fn, init_state(B), enc, enc_len, blank=V, max_symbols=4
    )
    b_tok, b_n, _ = rnnt_beam_decode(
        joint_fn, pred_step_fn, init_state(B), enc, enc_len, blank=V,
        beam_size=1, max_symbols=4,
    )
    g_tok, g_n, b_tok, b_n = map(np.asarray, (g_tok, g_n, b_tok, b_n))
    np.testing.assert_array_equal(g_n, b_n)
    for b in range(B):
        np.testing.assert_array_equal(g_tok[b, : g_n[b]], b_tok[b, : b_n[b]])


def _greedy_alignment_logprob(joint_fn, pred_step_fn, init_state, enc, enc_len,
                              blank, max_symbols):
    """Replay greedy decoding for one utterance, summing the log-prob of the
    alignment greedy actually takes (emit while argmax≠blank, ≤max_symbols
    per frame, then blank)."""
    total = 0.0
    state = init_state(1)
    pred_out, state = pred_step_fn(jnp.full((1,), -1, jnp.int32), state)
    T = int(enc_len[0])
    for t in range(T):
        for _ in range(max_symbols + 1):
            logits = joint_fn(enc[:, t], pred_out)
            logp = jax.nn.log_softmax(logits, -1)
            k = int(jnp.argmax(logp[0]))
            if k == blank or _ == max_symbols:
                total += float(logp[0, blank])
                break
            total += float(logp[0, k])
            pred_out, state = pred_step_fn(jnp.asarray([k], jnp.int32), state)
    return total


def test_beam_finds_higher_likelihood_than_greedy():
    """On random transducers, beam-4's best path log-prob must never be worse
    than greedy's, and must be strictly better for at least one seed."""
    strictly_better = 0
    for seed in range(8):
        joint_fn, pred_step_fn, init_state, V = _random_transducer(V=4, seed=seed)
        rng = np.random.RandomState(100 + seed)
        T, He = 6, 8
        enc = jnp.asarray(rng.randn(1, T, He) * 0.5, jnp.float32)
        enc_len = jnp.asarray([T], jnp.int32)
        _, _, b_score = rnnt_beam_decode(
            joint_fn, pred_step_fn, init_state(1), enc, enc_len, blank=V,
            beam_size=4, max_symbols=3,
        )
        lp_b = float(b_score[0])
        lp_g = _greedy_alignment_logprob(
            joint_fn, pred_step_fn, init_state, enc, enc_len, V, 3
        )
        assert lp_b >= lp_g - 1e-4, (seed, lp_b, lp_g)
        if lp_b > lp_g + 1e-4:
            strictly_better += 1
    assert strictly_better >= 1


def test_rnnt_model_beam_strategy():
    """EncDecRNNTModel with decoding.strategy=beam transcribes."""
    from nemo_tpu.core.config import ConfigDict
    from nemo_tpu.models.asr.rnnt_models import EncDecRNNTModel

    cfg = ConfigDict(
        dict(
            labels=list("ab "),
            preprocessor=dict(features=32),
            encoder=dict(
                _target_="ConvASREncoder",
                feat_in=32,
                jasper=[dict(filters=32, repeat=1, kernel=[11], stride=[2],
                             dilation=[1], dropout=0.0, residual=False)],
            ),
            decoder=dict(pred_hidden=16, pred_rnn_layers=1),
            joint=dict(joint_hidden=16),
            decoding=dict(strategy="beam", max_symbols=3),
        )
    )
    m = EncDecRNNTModel(cfg)
    audio = np.random.RandomState(0).randn(8000).astype(np.float32) * 0.1
    out = m.transcribe([audio], batch_size=1)
    assert isinstance(out[0], str)


def test_maes_beam_matches_greedy_at_beam1():
    """mAES with beam 1 and a permissive expansion budget reduces to
    greedy decoding (each expansion keeps exactly the argmax)."""
    from nemo_tpu.models.asr.modules.rnnt import rnnt_beam_decode_maes

    joint_fn, pred_step_fn, init_state, V = _random_transducer(seed=4)
    rng = np.random.RandomState(5)
    B, T, He = 3, 12, 8
    enc = jnp.asarray(rng.randn(B, T, He), jnp.float32)
    enc_len = jnp.asarray([12, 7, 10], jnp.int32)
    g_tok, g_n = rnnt_greedy_decode(
        joint_fn, pred_step_fn, init_state(B), enc, enc_len, blank=V,
        max_symbols=4)
    m_tok, m_n, m_score = rnnt_beam_decode_maes(
        joint_fn, pred_step_fn, init_state(B), enc, enc_len, blank=V,
        beam_size=1, maes_num_steps=4, maes_expansion_beta=1,
        maes_expansion_gamma=1e9)
    for b in range(B):
        gt = [int(x) for x in np.asarray(g_tok[b])[: int(g_n[b])]]
        mt = [int(x) for x in np.asarray(m_tok[b])[: int(m_n[b])]]
        assert gt == mt, (b, gt, mt)
    assert np.isfinite(np.asarray(m_score)).all()


def test_maes_beam_score_not_worse_than_beam1():
    from nemo_tpu.models.asr.modules.rnnt import rnnt_beam_decode_maes

    joint_fn, pred_step_fn, init_state, V = _random_transducer(seed=6)
    rng = np.random.RandomState(7)
    B, T, He = 2, 10, 8
    enc = jnp.asarray(rng.randn(B, T, He), jnp.float32)
    enc_len = jnp.asarray([10, 6], jnp.int32)
    _, _, s1 = rnnt_beam_decode_maes(
        joint_fn, pred_step_fn, init_state(B), enc, enc_len, blank=V,
        beam_size=1, maes_num_steps=2)
    _, _, s4 = rnnt_beam_decode_maes(
        joint_fn, pred_step_fn, init_state(B), enc, enc_len, blank=V,
        beam_size=4, maes_num_steps=2)
    assert (np.asarray(s4) >= np.asarray(s1) - 1e-4).all(), (s1, s4)
