"""Confidence ensemble + vocabulary/decoding hot-swap (reference:
asr/models/confidence_ensemble.py, ctc_models.py change_vocabulary:194,
change_decoding_strategy:265)."""

import numpy as np
import pytest

import jax.numpy as jnp

from nemo_tpu.models.asr.confidence_ensemble import (
    ConfidenceEnsembleModel,
    ConfidenceSpec,
    aggregate_confidence,
    frame_confidence,
)


def test_frame_confidence_bounds():
    V = 8
    uniform = np.log(np.full((3, V), 1.0 / V))
    onehot = np.full((3, V), -80.0)
    onehot[:, 2] = 0.0
    for method in ("max_prob", "entropy_gibbs", "entropy_tsallis",
                   "entropy_renyi"):
        lo = frame_confidence(uniform, method)
        hi = frame_confidence(onehot, method)
        if method == "max_prob":
            np.testing.assert_allclose(lo, 1.0 / V, atol=1e-6)
        else:
            np.testing.assert_allclose(lo, 0.0, atol=1e-6)
        np.testing.assert_allclose(hi, 1.0, atol=2e-4)
        assert (hi > lo).all()


def test_aggregation():
    fc = np.array([0.5, 1.0])
    assert aggregate_confidence(fc, "mean") == pytest.approx(0.75)
    assert aggregate_confidence(fc, "min") == pytest.approx(0.5)
    assert aggregate_confidence(fc, "prod") == pytest.approx(
        np.sqrt(0.5), rel=1e-6)


class _FakeDecoding:
    blank_id = 3

    def ids_to_text(self, ids):
        return "".join("abc"[i] for i in ids)


class _FakeModel:
    """EncDecCTCModel protocol: forward → (log_probs [B,T,V], enc_len)."""

    sample_rate = 16000
    decoding = _FakeDecoding()

    def __init__(self, peaked: bool, tokens=(0, 1)):
        self.peaked = peaked
        self.tokens = tokens

    def forward(self, signal, length):
        B = signal.shape[0]
        T, V = 6, 4
        lp = np.full((B, T, V), np.log(1.0 / V), np.float32)
        if self.peaked:
            for t in range(T):
                tok = self.tokens[t % len(self.tokens)] if t < 4 else 3
                row = np.full(V, -12.0)
                row[tok] = -1e-3
                lp[:, t] = row
        return jnp.asarray(lp), jnp.full((B,), T, jnp.int32)


def test_ensemble_picks_confident_member():
    confident = _FakeModel(peaked=True)       # decodes "abab"-ish, sure
    unsure = _FakeModel(peaked=False)         # uniform posteriors
    ens = ConfidenceEnsembleModel([unsure, confident])
    audio = [np.zeros(16000, np.float32), np.zeros(16000, np.float32)]
    out = ens.transcribe(audio, return_confidence=True)
    assert all(r["model"] == 1 for r in out)
    assert all(r["text"] == "abab" for r in out)
    assert all(r["confidence"] > 0.9 for r in out)


def test_change_vocabulary_keeps_encoder():
    from nemo_tpu.models.asr.configs import quartznet_tiny
    from nemo_tpu.models.asr.ctc_models import EncDecCTCModel

    m = EncDecCTCModel(quartznet_tiny())
    import jax

    flat_before = {
        "/".join(str(p) for p in path): np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(
            m.variables["params"]["encoder"])
    }
    new_vocab = list("xyz0123456789")
    m.change_vocabulary(new_vocab)
    assert m.labels == new_vocab
    flat_after = {
        "/".join(str(p) for p in path): np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(
            m.variables["params"]["encoder"])
    }
    for k in flat_before:
        np.testing.assert_array_equal(flat_before[k], flat_after[k])
    # forward runs with the new head size
    sig = jnp.zeros((1, 16000), jnp.float32)
    lp, _ = m.forward(sig, jnp.asarray([16000], jnp.int32))
    assert lp.shape[-1] == len(new_vocab) + 1
    out = m.transcribe([np.zeros(8000, np.float32)])
    assert isinstance(out[0], str)


def test_change_decoding_strategy_routes_to_beam():
    from nemo_tpu.models.asr.configs import quartznet_tiny
    from nemo_tpu.models.asr.ctc_models import EncDecCTCModel

    m = EncDecCTCModel(quartznet_tiny())
    m.change_decoding_strategy("beam", beam_size=4)
    called = {}
    orig = m.transcribe_beam

    def spy(audio, **kw):
        called.update(kw)
        return orig(audio, **kw)

    m.transcribe_beam = spy
    out = m.transcribe([np.zeros(8000, np.float32)])
    assert called.get("beam_size") == 4
    assert isinstance(out[0], str)
    with pytest.raises(ValueError):
        m.change_decoding_strategy("nope")


def test_transcribe_buffered_long_audio():
    """Buffered long-audio path (FrameBatchASR analog): short input equals
    plain transcribe; long input runs windowed with one compile shape and
    stays close to offline."""
    import jax.numpy as jnp  # noqa: F401
    from nemo_tpu.models.asr.configs import quartznet_tiny
    from nemo_tpu.models.asr.ctc_models import EncDecCTCModel
    from nemo_tpu.models.asr.metrics import word_error_rate

    cfg = quartznet_tiny()
    # utterance-level normalization is the one thing windowing can't
    # reproduce (same caveat as the reference's FrameBatchASR) — use
    # 'none' so interior frames are comparable bit-for-bit
    cfg.preprocessor.normalize = "none"
    m = EncDecCTCModel(cfg)
    rng = np.random.RandomState(0)
    short = rng.randn(16000).astype(np.float32) * 0.1
    assert m.transcribe_buffered([short]) == m.transcribe([short])

    t = np.arange(16000 * 12) / 16000.0
    long_sig = (0.3 * np.sin(2 * np.pi * (220 + 40 * np.sin(2 * np.pi * 0.3 * t)) * t)
                ).astype(np.float32)
    buf = m.transcribe_buffered([long_sig], chunk_secs=4.0, context_secs=1.0,
                                batch_size=2)[0]
    assert isinstance(buf, str) and len(buf) > 0
    # frame-level agreement: with 1 s of acoustic context on each side,
    # windowed middle-frame argmax ids should match the offline forward on
    # the interior (seams may differ — an untrained model has no margins)
    import jax.numpy as jnp
    off_ids, off_len = m._jit_infer_ids(
        m.variables,
        jnp.asarray(long_sig[None]), jnp.asarray([len(long_sig)]))
    off_ids = np.asarray(off_ids)[0][: int(off_len[0])]
    mid_ids = m._buffered_frame_ids(long_sig, chunk_secs=4.0,
                                    context_secs=1.0, batch_size=2)
    n = min(len(off_ids), len(mid_ids))
    agree = np.mean(np.asarray(mid_ids[:n]) == off_ids[:n])
    assert agree > 0.8, agree
