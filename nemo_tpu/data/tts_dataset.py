"""TTS dataset with supplementary data (durations / pitch / energy).

Reference parity: `nemo/collections/tts/data/dataset.py` (TTSDataset):
manifest of {audio_filepath, text}, tokenized text, mel targets, and
sup-data computed once and cached to disk — pitch (librosa yin there; a
self-contained autocorrelation YIN-lite here), per-frame energy, and
optional durations binarized by the Aligner. Pitch is speaker-normalized
with dataset statistics as in the reference FastPitch pipeline.

Host-side by design (the reference computes sup-data on CPU workers too);
batches come out as padded numpy arrays ready for device upload.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from nemo_tpu.data.audio_io import read_wav
from nemo_tpu.data.text_tokenizers import EnglishCharsTTSTokenizer


def estimate_pitch(
    audio: np.ndarray,
    sr: int,
    hop: int = 256,
    win: int = 1024,
    fmin: float = 65.0,
    fmax: float = 800.0,
    threshold: float = 0.3,
) -> np.ndarray:
    """Frame-level F0 via the YIN difference function (cumulative-mean
    normalized autocorrelation); 0 = unvoiced. Vectorized numpy."""
    n_frames = max(1 + (len(audio) - win) // hop, 1)
    if len(audio) < win:
        audio = np.pad(audio, (0, win - len(audio)))
    lag_min = max(int(sr / fmax), 2)
    lag_max = min(int(sr / fmin), win - 1)
    idx = np.arange(n_frames)[:, None] * hop + np.arange(win)[None, :]
    frames = audio[np.minimum(idx, len(audio) - 1)]  # [F, win]
    # difference function d(tau) via autocorrelation identity
    f0 = np.zeros(n_frames, np.float32)
    # energy terms
    spec = np.fft.rfft(frames, n=2 * win, axis=1)
    acf = np.fft.irfft(spec * np.conj(spec), n=2 * win, axis=1)[:, :lag_max + 1]
    cumsum = np.cumsum(frames ** 2, axis=1)
    e0 = acf[:, 0]
    taus = np.arange(lag_max + 1)
    # d[tau] = e0 + e_tau - 2*acf : e_tau = sum x[tau:win]^2 approx e0
    d = e0[:, None] + e0[:, None] - 2 * acf
    d[:, 0] = 1.0
    denom = np.cumsum(d[:, 1:], axis=1)
    cmnd = d[:, 1:] * np.arange(1, lag_max + 1)[None] / np.maximum(denom, 1e-9)
    cmnd = np.concatenate([np.ones((n_frames, 1), np.float32), cmnd], axis=1)
    region = cmnd[:, lag_min:lag_max + 1]
    best = np.argmin(region, axis=1) + lag_min
    bestval = np.min(region, axis=1)
    voiced = (bestval < threshold) & (e0 > 1e-6 * win)  # energy floor
    f0[voiced] = sr / best[voiced]
    return f0


def frame_energy(audio: np.ndarray, hop: int = 256, win: int = 1024) -> np.ndarray:
    n_frames = max(1 + (len(audio) - win) // hop, 1)
    if len(audio) < win:
        audio = np.pad(audio, (0, win - len(audio)))
    idx = np.arange(n_frames)[:, None] * hop + np.arange(win)[None, :]
    frames = audio[np.minimum(idx, len(audio) - 1)]
    return np.sqrt(np.mean(frames ** 2, axis=1)).astype(np.float32)


class TTSDataset:
    """Manifest-driven dataset with cached sup-data.

    Each item: {"tokens", "mel" [n_mels, F], "pitch" [F], "energy" [F],
    "durations" [U] (if an aligner fn is provided)}.
    """

    def __init__(
        self,
        manifest_path: str,
        sup_data_dir: Optional[str] = None,
        sample_rate: int = 22050,
        n_mels: int = 80,
        hop: int = 256,
        win: int = 1024,
        tokenizer=None,
        duration_fn=None,  # (tokens [U], mel [n_mels, F]) -> [U] int
    ):
        self.entries: List[Dict] = []
        with open(manifest_path) as f:
            for line in f:
                line = line.strip()
                if line:
                    self.entries.append(json.loads(line))
        self.sup_dir = sup_data_dir
        if sup_data_dir:
            os.makedirs(sup_data_dir, exist_ok=True)
        self.sample_rate = sample_rate
        self.n_mels = n_mels
        self.hop = hop
        self.win = win
        self.tokenizer = tokenizer or EnglishCharsTTSTokenizer()
        self.duration_fn = duration_fn
        self._pitch_stats: Optional[Dict[str, float]] = None

    def __len__(self):
        return len(self.entries)

    def _mel(self, audio: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        from nemo_tpu.ops.audio import MelSpectrogramConfig, mel_spectrogram

        cfg = MelSpectrogramConfig(
            sample_rate=self.sample_rate, features=self.n_mels,
            n_window_size=self.win, n_window_stride=self.hop,
            n_fft=self.win, normalize="none", preemph=None, dither=0.0,
            pad_to=0,
        )
        feats, flen = mel_spectrogram(
            jnp.asarray(audio[None]), jnp.asarray([len(audio)]), cfg,
            training=False)
        return np.asarray(feats[0, :, : int(flen[0])])

    def _cache_path(self, i: int) -> Optional[str]:
        if not self.sup_dir:
            return None
        return os.path.join(self.sup_dir, f"item{i}.npz")

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        cp = self._cache_path(i)
        if cp and os.path.exists(cp):
            return dict(np.load(cp))
        e = self.entries[i]
        audio, sr = read_wav(e["audio_filepath"], target_sr=self.sample_rate)
        tokens = np.asarray(self.tokenizer.text_to_ids(e["text"]), np.int32)
        mel = self._mel(audio)
        F = mel.shape[1]
        pitch = estimate_pitch(audio, self.sample_rate, self.hop, self.win)[:F]
        energy = frame_energy(audio, self.hop, self.win)[:F]
        pitch = np.pad(pitch, (0, F - len(pitch)))
        energy = np.pad(energy, (0, F - len(energy)))
        item = {"tokens": tokens, "mel": mel.astype(np.float32),
                "pitch": pitch.astype(np.float32),
                "energy": energy.astype(np.float32)}
        if self.duration_fn is not None:
            item["durations"] = np.asarray(
                self.duration_fn(tokens, item["mel"]), np.int32)
        if cp:
            np.savez(cp, **item)
        return item

    # -- pitch normalization (reference: TTSDataset pitch_mean/std) ---------
    def pitch_stats(self) -> Dict[str, float]:
        if self._pitch_stats is None:
            voiced = np.concatenate(
                [self[i]["pitch"][self[i]["pitch"] > 0] for i in range(len(self))]
                or [np.zeros(1, np.float32)])
            self._pitch_stats = {
                "mean": float(voiced.mean()) if voiced.size else 0.0,
                "std": float(voiced.std() + 1e-8),
            }
        return self._pitch_stats

    def normalized_pitch(self, pitch: np.ndarray) -> np.ndarray:
        st = self.pitch_stats()
        out = (pitch - st["mean"]) / st["std"]
        out[pitch == 0] = 0.0
        return out

    # -- batching ------------------------------------------------------------
    def batches(self, batch_size: int, shuffle_seed: Optional[int] = None
                ) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self))
        if shuffle_seed is not None:
            np.random.RandomState(shuffle_seed).shuffle(order)
        for s in range(0, len(order), batch_size):
            items = [self[int(i)] for i in order[s:s + batch_size]]
            B = len(items)
            U = max(len(it["tokens"]) for it in items)
            F = max(it["mel"].shape[1] for it in items)
            out = {
                "tokens": np.zeros((B, U), np.int32),
                "token_len": np.zeros(B, np.int32),
                "mel": np.zeros((B, self.n_mels, F), np.float32),
                "mel_len": np.zeros(B, np.int32),
                "pitch": np.zeros((B, F), np.float32),
                "energy": np.zeros((B, F), np.float32),
            }
            if self.duration_fn is not None:
                out["durations"] = np.zeros((B, U), np.int32)
            for b, it in enumerate(items):
                u = len(it["tokens"])
                f = it["mel"].shape[1]
                out["tokens"][b, :u] = it["tokens"]
                out["token_len"][b] = u
                out["mel"][b, :, :f] = it["mel"]
                out["mel_len"][b] = f
                out["pitch"][b, :f] = self.normalized_pitch(it["pitch"][:f])
                out["energy"][b, :f] = it["energy"][:f]
                if "durations" in out:
                    out["durations"][b, :u] = it["durations"][:u]
            yield out
