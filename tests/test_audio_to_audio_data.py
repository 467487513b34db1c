"""Audio-to-audio data pipeline: paired manifests → static batches →
enhancement training (reference audio/data/audio_to_audio.py)."""

import json
import os

import numpy as np

from nemo_tpu.data.audio_io import read_wav, write_wav
from nemo_tpu.data.audio_to_audio_dataset import (
    AudioPairManifestDataset, AudioToAudioDataModule)


def _corpus(tmp_path, n=4, sr=16000, with_ref=False, channels=1):
    rng = np.random.RandomState(0)
    man = tmp_path / "man.jsonl"
    with open(man, "w") as f:
        for i in range(n):
            dur = 0.3 + 0.1 * i
            T = int(dur * sr)
            clean = 0.3 * np.sin(
                2 * np.pi * (200 + 50 * i) * np.arange(T) / sr
            ).astype(np.float32)
            noisy = clean + 0.05 * rng.randn(T).astype(np.float32)
            if channels > 1:
                noisy = np.stack([noisy] * channels, axis=1)
            cp, npth = str(tmp_path / f"c{i}.wav"), str(tmp_path / f"n{i}.wav")
            write_wav(cp, clean, sr)
            write_wav(npth, noisy, sr)
            rec = {"input_filepath": npth, "target_filepath": cp,
                   "duration": dur}
            if with_ref:
                rp = str(tmp_path / f"r{i}.wav")
                write_wav(rp, clean[:sr // 10], sr)
                rec["reference_filepath"] = rp
            f.write(json.dumps(rec) + "\n")
    return str(man)


def test_paired_batches_static_and_aligned(tmp_path):
    man = _corpus(tmp_path)
    ds = AudioPairManifestDataset(man)
    dm = AudioToAudioDataModule(ds, global_batch_size=2,
                                audio_duration=0.25, shuffle=True, seed=1)
    b = next(dm.train_batches())
    assert b["noisy"].shape == (2, 4000)
    assert b["clean"].shape == (2, 4000)
    # time alignment preserved through the shared random crop: the noisy
    # signal is clean + small noise, so they stay highly correlated
    for k in range(2):
        c, n = b["clean"][k], b["noisy"][k]
        denom = np.linalg.norm(c) * np.linalg.norm(n)
        assert denom > 0 and float(np.dot(c, n) / denom) > 0.9


def test_reference_signal_and_resume(tmp_path):
    man = _corpus(tmp_path, with_ref=True)
    ds = AudioPairManifestDataset(man, reference_key="reference_filepath")
    dm = AudioToAudioDataModule(ds, global_batch_size=2,
                                audio_duration=0.25,
                                reference_duration=0.1, shuffle=False)
    it = dm.train_batches()
    b0, b1 = next(it), next(it)
    assert b0["reference"].shape == (2, 1600)
    # start_step resume reproduces the stream
    b = next(dm.train_batches(start_step=1))
    assert np.allclose(b["noisy"], b1["noisy"])


def test_multichannel_input_kept(tmp_path):
    man = _corpus(tmp_path, channels=3)
    ds = AudioPairManifestDataset(man)
    dm = AudioToAudioDataModule(ds, global_batch_size=2,
                                audio_duration=0.25,
                                multichannel_input=True, shuffle=False)
    b = next(dm.train_batches())
    assert b["noisy"].shape == (2, 4000, 3)
    assert b["clean"].shape == (2, 4000)


def test_multichannel_wav_roundtrip(tmp_path):
    sr = 16000
    x = np.stack([0.1 * np.sin(2 * np.pi * 300 * np.arange(800) / sr),
                  0.2 * np.sin(2 * np.pi * 500 * np.arange(800) / sr)],
                 axis=1).astype(np.float32)
    p = str(tmp_path / "mc.wav")
    write_wav(p, x, sr)
    y, _ = read_wav(p, mono=False)
    assert y.shape == (800, 2)
    assert np.abs(y - x).max() < 1e-3
    ym, _ = read_wav(p)  # default downmix
    assert ym.shape == (800,)


def test_enhancement_trains_from_manifest(tmp_path):
    from nemo_tpu.models.audio.train import EnhancementTrainModule

    man = _corpus(tmp_path)
    ds = AudioPairManifestDataset(man)
    dm = AudioToAudioDataModule(ds, global_batch_size=2,
                                audio_duration=0.25)
    mod = EnhancementTrainModule()
    state = mod.init_state()
    it = dm.train_batches()
    for _ in range(2):
        state, m = mod.train_step(state, next(it))
    assert np.isfinite(float(m["loss"]))
