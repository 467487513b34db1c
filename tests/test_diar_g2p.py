"""Diarization + G2P tests."""

import numpy as np
import pytest

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.models.asr.diarization import (
    ClusteringDiarizer,
    DiarizationConfig,
    energy_vad,
    spectral_cluster,
)
from nemo_tpu.models.asr.label_models import EncDecSpeakerLabelModel
from nemo_tpu.models.tts.g2p import EnglishG2p, PhonemeTokenizer


def test_energy_vad():
    sr = 16000
    x = np.zeros(sr, np.float32)
    x[4000:8000] = 0.5 * np.sin(2 * np.pi * 440 * np.arange(4000) / sr)
    vad = energy_vad(x, sr)
    assert vad[6:9].all()  # speech frames
    assert not vad[:4].any()  # silence


def test_spectral_cluster_two_blobs():
    rng = np.random.RandomState(0)
    a = rng.randn(10, 8) * 0.05 + np.array([1.0] + [0.0] * 7)
    b = rng.randn(10, 8) * 0.05 + np.array([0.0, 1.0] + [0.0] * 6)
    E = np.concatenate([a, b])
    E = E / np.linalg.norm(E, axis=1, keepdims=True)
    aff = np.clip(E @ E.T, 0, 1)
    labels = spectral_cluster(aff, max_speakers=8)
    assert len(set(labels[:10])) == 1 and len(set(labels[10:])) == 1
    assert labels[0] != labels[10]


def test_diarizer_end_to_end():
    cfg = ConfigDict(
        sample_rate=16000,
        preprocessor=dict(features=32, dither=0.0),
        encoder=dict(feat_in=32, jasper=[
            dict(filters=32, repeat=1, kernel=33, stride=2, separable=True)]),
        decoder=dict(emb_sizes=32, num_classes=4),
    )
    spk = EncDecSpeakerLabelModel(cfg)
    diar = ClusteringDiarizer(spk, DiarizationConfig(num_speakers=2))
    sr = 16000
    t = np.arange(3 * sr) / sr
    audio = np.concatenate([
        0.4 * np.sin(2 * np.pi * 120 * t[:sr]),
        0.4 * np.sin(2 * np.pi * 500 * t[:sr]),
        0.4 * np.sin(2 * np.pi * 120 * t[:sr]),
    ]).astype(np.float32)
    segs = diar.diarize(audio, sr)
    assert len(segs) >= 1
    rttm = diar.to_rttm(segs)
    assert rttm.startswith("SPEAKER")


def test_g2p_and_phoneme_tokenizer():
    g2p = EnglishG2p()
    ph = g2p("hello world")
    assert "HH" in ph and "W" in ph
    # OOV falls back to graphemes
    ph2 = g2p("zxqv")
    assert ph2 == list("zxqv")
    tok = PhonemeTokenizer()
    ids = tok.text_to_ids("hello test!")
    assert len(ids) > 0
    assert all(0 <= i < tok.vocab_size for i in ids)
