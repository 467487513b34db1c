"""Sortformer diarization: PIL permutation invariance, arrival sorting,
training, diarize segments."""

import numpy as np

import jax
import jax.numpy as jnp

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.models.asr.sortformer import (
    SortformerDiarizer,
    arrival_sort_targets,
    pil_loss,
    sort_loss,
)


def test_arrival_sort_orders_by_first_activity():
    T, N = 10, 3
    tgt = np.zeros((1, T, N), np.float32)
    tgt[0, 5:, 0] = 1  # speaker 0 starts at frame 5
    tgt[0, 1:4, 1] = 1  # speaker 1 starts at frame 1
    tgt[0, 3:6, 2] = 1  # speaker 2 starts at frame 3
    out = np.asarray(arrival_sort_targets(jnp.asarray(tgt), jnp.asarray([T])))
    # sorted order: spk1 (first), spk2, spk0
    np.testing.assert_array_equal(out[0, :, 0], tgt[0, :, 1])
    np.testing.assert_array_equal(out[0, :, 1], tgt[0, :, 2])
    np.testing.assert_array_equal(out[0, :, 2], tgt[0, :, 0])


def test_pil_loss_permutation_invariant():
    rng = np.random.RandomState(0)
    B, T, N = 2, 12, 3
    logits = jnp.asarray(rng.randn(B, T, N), jnp.float32)
    tgt = (rng.rand(B, T, N) > 0.7).astype(np.float32)
    lens = jnp.asarray([12, 9])
    base = float(pil_loss(logits, jnp.asarray(tgt), lens))
    perm = tgt[:, :, [2, 0, 1]]
    permuted = float(pil_loss(logits, jnp.asarray(perm), lens))
    assert abs(base - permuted) < 1e-6


def _model():
    return SortformerDiarizer(ConfigDict(
        preprocessor={"features": 16, "dither": 0.0},
        max_speakers=3, d_model=32, n_transformer_layers=1, n_heads=4,
        encoder={"feat_in": 16, "jasper": [
            {"filters": 24, "repeat": 1, "kernel": 5, "separable": False}]},
    ))


def test_sortformer_trains():
    m = _model()
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 16, 40), jnp.float32)
    lens = jnp.asarray([40, 32])
    # target frames at encoder rate — use the model's own enc_len
    logits, enc_len = m.net.apply(m.variables, feats, lens)
    F = logits.shape[1]
    tgt = jnp.asarray((rng.rand(2, F, 3) > 0.6).astype(np.float32))
    step, opt = m.make_train_step(lr=3e-3)
    v = m.variables
    losses = []
    for _ in range(5):
        v, opt, total, parts = step(v, opt, feats, lens, tgt)
        losses.append(float(total))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_diarize_produces_segments():
    m = _model()
    rng = np.random.RandomState(1)
    audio = (rng.randn(16000) * 0.1).astype(np.float32)
    segs = m.diarize(audio, threshold=0.4)
    for s in segs:
        assert s["end_frame"] > s["start_frame"]
        assert 0 <= s["speaker"] < 3


def test_streaming_sortformer_matches_offline_when_window_covers_all():
    from nemo_tpu.models.asr.sortformer import StreamingSortformer

    m = _model()
    rng = np.random.RandomState(2)
    audio = (rng.randn(4 * 16000) * 0.1).astype(np.float32)
    # one update over the whole session (hop = session) → frames are
    # finalized with full context and must equal the offline forward.
    # (With smaller hops early frames legitimately differ: the transformer
    # is non-causal, so earlier windows saw less right-context — same
    # bounded-context trade the reference online diarizer makes.)
    s = StreamingSortformer(m, window_secs=10.0, hop_secs=4.0)
    s.push_audio(audio)
    offline, F = m.forward_activities(audio)
    got = s.activities
    assert got.shape[0] == F
    np.testing.assert_allclose(got, offline, atol=1e-4)


def test_streaming_sortformer_bounded_window_runs():
    from nemo_tpu.models.asr.sortformer import StreamingSortformer

    m = _model()
    rng = np.random.RandomState(3)
    audio = (rng.randn(6 * 16000) * 0.1).astype(np.float32)
    s = StreamingSortformer(m, window_secs=2.0, hop_secs=1.0)
    emitted = []
    for c in range(0, len(audio), 8000):
        out = s.push_audio(audio[c:c + 8000])
        emitted.append(out)
    acts = s.activities
    assert acts.shape[1] == m.max_speakers
    assert acts.shape[0] > 0
    assert np.isfinite(acts).all()
    # emitted rows concatenate to the finalized activity history
    total = np.concatenate([e for e in emitted if len(e)], axis=0)
    np.testing.assert_allclose(total, acts, atol=1e-6)
