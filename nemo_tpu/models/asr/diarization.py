"""Clustering speaker diarization.

Reference parity: ClusteringDiarizer (`asr/models/clustering_diarizer.py`) —
VAD segmentation → window speaker embeddings → affinity spectral clustering
(NME-SC style eigengap speaker counting) → merged speaker segments.
Embeddings run on-chip; clustering is host-side numpy (as in the reference).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

from nemo_tpu.data.audio_io import read_wav
from nemo_tpu.models.asr.label_models import EncDecSpeakerLabelModel


@dataclasses.dataclass
class DiarizationConfig:
    window: float = 1.5
    shift: float = 0.75
    vad_threshold_db: float = -40.0
    max_speakers: int = 8
    num_speakers: Optional[int] = None  # None = auto via eigengap


def energy_vad(x: np.ndarray, sr: int, frame: float = 0.05, threshold_db: float = -40.0):
    """Frame-energy VAD → boolean per frame (reference: simple VAD path)."""
    n = int(frame * sr)
    n_frames = len(x) // n
    frames = x[: n_frames * n].reshape(n_frames, n)
    db = 10 * np.log10(np.mean(frames**2, axis=1) + 1e-10)
    ref = db.max() if len(db) else 0.0
    return db > (ref + threshold_db)


def spectral_cluster(affinity: np.ndarray, max_speakers: int,
                     num_speakers: Optional[int] = None) -> np.ndarray:
    """Normalized-Laplacian spectral clustering with eigengap speaker count."""
    n = affinity.shape[0]
    if n == 1:
        return np.zeros(1, np.int32)
    A = affinity.copy()
    np.fill_diagonal(A, 0.0)
    d = A.sum(1)
    d_inv = 1.0 / np.sqrt(np.maximum(d, 1e-10))
    L = np.eye(n) - d_inv[:, None] * A * d_inv[None, :]
    vals, vecs = np.linalg.eigh(L)
    if num_speakers is None:
        k_max = min(max_speakers, n)
        gaps = np.diff(vals[: k_max + 1])
        num_speakers = int(np.argmax(gaps[1:k_max])) + 2 if k_max > 2 else 1
        if vals[1] > 0.95:  # no cluster structure
            num_speakers = 1
    k = max(int(num_speakers), 1)
    emb = vecs[:, :k]
    emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-10)
    # k-means (few iterations, deterministic init)
    centers = emb[np.linspace(0, n - 1, k).astype(int)]
    for _ in range(20):
        assign = np.argmax(emb @ centers.T, axis=1)
        for c in range(k):
            pts = emb[assign == c]
            if len(pts):
                centers[c] = pts.mean(0)
                centers[c] /= max(np.linalg.norm(centers[c]), 1e-10)
    return assign.astype(np.int32)


class ClusteringDiarizer:
    def __init__(self, speaker_model: EncDecSpeakerLabelModel,
                 cfg: DiarizationConfig = DiarizationConfig()):
        self.model = speaker_model
        self.cfg = cfg

    def diarize(self, audio: Union[str, np.ndarray], sr: int = 16000) -> List[Dict]:
        """→ [{"start": s, "end": e, "speaker": k}] merged segments."""
        if isinstance(audio, str):
            x, sr = read_wav(audio, target_sr=self.model.sample_rate)
        else:
            x = np.asarray(audio, np.float32)
        cfg = self.cfg
        win = int(cfg.window * sr)
        shift = int(cfg.shift * sr)
        vad = energy_vad(x, sr, threshold_db=cfg.vad_threshold_db)
        vad_frame = int(0.05 * sr)

        starts, embs = [], []
        for s in range(0, max(len(x) - win, 1), shift):
            seg = x[s : s + win]
            f0, f1 = s // vad_frame, (s + win) // vad_frame
            if vad[f0:f1].mean() < 0.3 if len(vad[f0:f1]) else True:
                continue
            if len(seg) < win:
                seg = np.pad(seg, (0, win - len(seg)))
            embs.append(self.model.get_embedding(seg))
            starts.append(s / sr)
        if not embs:
            return []
        E = np.stack(embs)
        E = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-10)
        affinity = np.clip(E @ E.T, 0.0, 1.0)
        labels = spectral_cluster(affinity, cfg.max_speakers, cfg.num_speakers)

        segments = []
        for t0, lab in zip(starts, labels):
            seg = {"start": t0, "end": t0 + cfg.window, "speaker": int(lab)}
            if segments and segments[-1]["speaker"] == seg["speaker"] and \
               seg["start"] <= segments[-1]["end"]:
                segments[-1]["end"] = seg["end"]
            else:
                segments.append(seg)
        return segments

    def to_rttm(self, segments: List[Dict], uri: str = "audio") -> str:
        lines = [
            f"SPEAKER {uri} 1 {s['start']:.3f} {s['end']-s['start']:.3f} "
            f"<NA> <NA> speaker_{s['speaker']} <NA> <NA>"
            for s in segments
        ]
        return "\n".join(lines)
