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
