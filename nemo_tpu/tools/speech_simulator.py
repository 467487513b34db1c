"""Multispeaker speech simulator: synthetic diarization data + RTTM truth.

Reference parity: `tools/speech_data_simulator/` (NeMo multispeaker
simulator: composes single-speaker utterances into multi-speaker sessions
with silences/overlaps and emits RTTM ground truth for diarizer training
and DER evaluation).

Self-contained host tool: takes per-speaker source audio (arrays or a
callable generator), samples turn lengths/gaps/overlaps, mixes at
configured levels, returns (audio, segments) where segments are the same
{'speaker','start','end'} dicts consumed by `diarization_error_rate` and
`ClusteringDiarizer.to_rttm`.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class SimulatorConfig:
    sample_rate: int = 16000
    session_secs: float = 20.0
    turn_secs: Tuple[float, float] = (1.0, 3.0)  # min, max
    gap_secs: Tuple[float, float] = (0.05, 0.5)
    overlap_prob: float = 0.15
    overlap_secs: Tuple[float, float] = (0.1, 0.5)
    level_db: Tuple[float, float] = (-3.0, 3.0)  # per-turn gain jitter
    seed: int = 0


def simulate_session(
    speaker_audio: Dict[int, np.ndarray],
    cfg: SimulatorConfig = SimulatorConfig(),
) -> Tuple[np.ndarray, List[Dict]]:
    """speaker_audio: speaker id → long source signal to cut turns from.
    Returns (mixed mono [T], segments sorted by start)."""
    rng = np.random.RandomState(cfg.seed)
    sr = cfg.sample_rate
    T = int(cfg.session_secs * sr)
    mix = np.zeros(T, np.float32)
    segments: List[Dict] = []
    speakers = list(speaker_audio)
    cursors = {s: 0 for s in speakers}

    t = 0.0
    prev_spk = None
    while t < cfg.session_secs - cfg.turn_secs[0]:
        spk = int(rng.choice([s for s in speakers if s != prev_spk]
                             if len(speakers) > 1 else speakers))
        dur = float(rng.uniform(*cfg.turn_secs))
        dur = min(dur, cfg.session_secs - t)
        src = speaker_audio[spk]
        n = int(dur * sr)
        c = cursors[spk]
        if c + n > len(src):
            c = 0
        clip = src[c:c + n]
        cursors[spk] = c + n
        gain = 10 ** (rng.uniform(*cfg.level_db) / 20.0)
        a = int(t * sr)
        b = min(a + len(clip), T)
        mix[a:b] += gain * clip[: b - a]
        segments.append({"speaker": spk, "start": t, "end": t + (b - a) / sr})
        prev_spk = spk

        if rng.rand() < cfg.overlap_prob and len(speakers) > 1:
            # next turn starts before this one ends
            t = t + dur - float(rng.uniform(*cfg.overlap_secs))
        else:
            t = t + dur + float(rng.uniform(*cfg.gap_secs))

    peak = np.abs(mix).max()
    if peak > 1.0:
        mix = mix / peak
    segments.sort(key=lambda s: s["start"])
    return mix, segments


def segments_to_rttm(segments: Sequence[Dict], uri: str = "session") -> str:
    lines = []
    for s in segments:
        dur = s["end"] - s["start"]
        lines.append(
            f"SPEAKER {uri} 1 {s['start']:.3f} {dur:.3f} <NA> <NA> "
            f"speaker_{s['speaker']} <NA> <NA>")
    return "\n".join(lines) + "\n"
