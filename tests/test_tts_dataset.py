"""TTSDataset sup-data: YIN pitch on synthetic tones, energy, caching,
batching with normalization, aligner-fed durations."""

import json
import os

import numpy as np

from nemo_tpu.data.audio_io import write_wav
from nemo_tpu.data.tts_dataset import TTSDataset, estimate_pitch, frame_energy


def test_yin_pitch_on_sine():
    sr = 22050
    for f0 in (110.0, 220.0, 440.0):
        t = np.arange(sr) / sr
        tone = np.sin(2 * np.pi * f0 * t).astype(np.float32)
        pitch = estimate_pitch(tone, sr)
        voiced = pitch[pitch > 0]
        assert voiced.size > 10
        err = np.abs(np.median(voiced) - f0) / f0
        assert err < 0.03, (f0, np.median(voiced))
    # silence is unvoiced
    silent = np.zeros(sr, np.float32)
    assert (estimate_pitch(silent, sr) == 0).all()


def test_energy_levels():
    sr = 22050
    loud = np.ones(sr, np.float32) * 0.5
    quiet = np.ones(sr, np.float32) * 0.05
    assert frame_energy(loud).mean() > frame_energy(quiet).mean() * 5


def _write_manifest(tmp_path, n=3):
    sr = 22050
    man = tmp_path / "man.jsonl"
    rng = np.random.RandomState(0)
    with open(man, "w") as f:
        for i in range(n):
            p = str(tmp_path / f"a{i}.wav")
            f0 = 150.0 + 50 * i
            t = np.arange(int(0.5 * sr)) / sr
            wav = (0.3 * np.sin(2 * np.pi * f0 * t)
                   + 0.01 * rng.randn(len(t))).astype(np.float32)
            write_wav(p, wav, sr)
            f.write(json.dumps({"audio_filepath": p, "text": f"hello {i}"}) + "\n")
    return str(man)


def test_dataset_items_cache_and_batches(tmp_path):
    man = _write_manifest(tmp_path)
    sup = str(tmp_path / "sup")
    ds = TTSDataset(man, sup_data_dir=sup, n_mels=20)
    it = ds[0]
    assert it["mel"].shape[0] == 20
    F = it["mel"].shape[1]
    assert it["pitch"].shape == (F,) and it["energy"].shape == (F,)
    # cache file written and served
    assert os.path.exists(os.path.join(sup, "item0.npz"))
    it2 = ds[0]
    np.testing.assert_array_equal(it["mel"], it2["mel"])

    batches = list(ds.batches(batch_size=2))
    assert len(batches) == 2
    b = batches[0]
    assert b["mel"].shape[0] == 2 and b["tokens"].shape[0] == 2
    # normalized pitch: voiced frames ~zero-mean across dataset
    allp = np.concatenate([bb["pitch"][bb["pitch"] != 0] for bb in batches])
    assert abs(allp.mean()) < 1.0


def test_dataset_durations_via_fn(tmp_path):
    man = _write_manifest(tmp_path, n=2)
    def dur_fn(tokens, mel):
        U, F = len(tokens), mel.shape[1]
        base = np.full(U, F // U, np.int32)
        base[-1] += F - base.sum()
        return base
    ds = TTSDataset(man, n_mels=20, duration_fn=dur_fn)
    b = next(ds.batches(batch_size=2))
    assert "durations" in b
    for i in range(2):
        u = b["token_len"][i]
        assert b["durations"][i, :u].sum() == b["mel_len"][i]
