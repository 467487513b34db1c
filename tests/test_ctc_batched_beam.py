"""Batched on-device CTC beam == host prefix beam (token-exact), beats
greedy on merge-sensitive inputs, respects lengths."""

import numpy as np

import jax.numpy as jnp

from nemo_tpu.models.asr.parts.ctc_batched_beam import ctc_beam_search_batched
from nemo_tpu.models.asr.parts.ctc_beam import ctc_prefix_beam_search


def _rand_lp(rng, T, V1):
    x = rng.randn(T, V1).astype(np.float32) * 2
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


def test_matches_host_prefix_beam():
    rng = np.random.RandomState(0)
    V1, T, B = 6, 12, 5
    lps = np.stack([_rand_lp(rng, T, V1) for _ in range(B)])
    toks, cnts, scores = ctc_beam_search_batched(
        jnp.asarray(lps), jnp.asarray([T] * B), beam_size=8)
    for b in range(B):
        host = ctc_prefix_beam_search(lps[b], beam_size=8)
        best_host, host_score = host[0]
        got = toks[b][: int(cnts[b])].tolist()
        assert got == list(best_host), (b, got, best_host)
        np.testing.assert_allclose(float(scores[b]), host_score, atol=5e-2)


def test_beam_finds_merge_win_over_greedy():
    """Classic case: per-frame argmax is blank but summed token mass wins."""
    V1 = 3  # tokens {0,1}, blank=2
    lp = np.log(np.array([
        [0.35, 0.05, 0.60],
        [0.35, 0.05, 0.60],
    ], np.float32))
    toks, cnts, _ = ctc_beam_search_batched(
        jnp.asarray(lp[None]), jnp.asarray([2]), beam_size=4)
    # greedy: blank,blank → empty; beam: prefix [0] has more mass
    host = ctc_prefix_beam_search(lp, beam_size=4)
    assert toks[0][: int(cnts[0])].tolist() == list(host[0][0])
    assert host[0][0] == [0]


def test_respects_lengths():
    rng = np.random.RandomState(1)
    V1, T = 5, 10
    lp_full = _rand_lp(rng, T, V1)
    short = 6
    toks_a, cnt_a, s_a = ctc_beam_search_batched(
        jnp.asarray(lp_full[None]), jnp.asarray([short]), beam_size=4)
    toks_b, cnt_b, s_b = ctc_beam_search_batched(
        jnp.asarray(lp_full[None, :short]), jnp.asarray([short]), beam_size=4)
    assert toks_a[0][: int(cnt_a[0])].tolist() == toks_b[0][: int(cnt_b[0])].tolist()
    np.testing.assert_allclose(float(s_a[0]), float(s_b[0]), atol=1e-5)


def test_batched_consistency_random_lengths():
    rng = np.random.RandomState(2)
    V1, T, B = 7, 14, 4
    lens = [14, 9, 5, 12]
    lps = np.stack([_rand_lp(rng, T, V1) for _ in range(B)])
    toks, cnts, scores = ctc_beam_search_batched(
        jnp.asarray(lps), jnp.asarray(lens), beam_size=6)
    for b in range(B):
        host = ctc_prefix_beam_search(lps[b][: lens[b]], beam_size=6)
        got = toks[b][: int(cnts[b])].tolist()
        assert got == list(host[0][0]), (b, got, host[0][0])


def test_model_transcribe_beam(tmp_path):
    from nemo_tpu.data.audio_io import write_wav
    from nemo_tpu.models.asr.configs import quartznet_tiny
    from nemo_tpu.models.asr.ctc_models import EncDecCTCModel

    m = EncDecCTCModel(quartznet_tiny())
    rng = np.random.RandomState(0)
    p = str(tmp_path / "a.wav")
    write_wav(p, (rng.randn(8000) * 0.1).astype(np.float32), 16000)
    out = m.transcribe_beam([p], beam_size=4)
    assert isinstance(out[0], str)
