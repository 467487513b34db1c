"""Speech data explorer: dataset statistics + problem detection.

Reference parity: `tools/speech_data_explorer/` (NeMo SDE: manifest
statistics — duration histograms, char/word rates, vocabulary coverage,
alignment mismatch flags — served as a dashboard). Here the analysis core
as a library + text report: same statistics, consumable from scripts/CI.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np


def analyze_manifest(
    manifest_path: str,
    vocab: Optional[Sequence[str]] = None,
    check_audio: bool = False,
    sample_rate: int = 16000,
) -> Dict:
    """JSONL manifest ({audio_filepath, text, duration?}) → stats dict."""
    entries: List[Dict] = []
    with open(manifest_path) as f:
        for line in f:
            line = line.strip()
            if line:
                entries.append(json.loads(line))

    durations, char_rates, word_rates = [], [], []
    missing_audio, empty_text, oov_chars = [], [], {}
    vset = set(vocab) if vocab is not None else None
    for i, e in enumerate(entries):
        text = e.get("text", "")
        dur = e.get("duration")
        if check_audio or dur is None:
            p = e.get("audio_filepath", "")
            if not os.path.exists(p):
                missing_audio.append(i)
                continue
            if dur is None:
                from nemo_tpu.data.audio_io import read_wav

                wav, sr = read_wav(p, target_sr=None)
                dur = len(wav) / sr
        durations.append(float(dur))
        if not text.strip():
            empty_text.append(i)
        elif dur > 0:
            char_rates.append(len(text) / dur)
            word_rates.append(len(text.split()) / dur)
        if vset is not None:
            for ch in text:
                if ch not in vset:
                    oov_chars[ch] = oov_chars.get(ch, 0) + 1

    d = np.asarray(durations) if durations else np.zeros(1)
    stats = {
        "num_utterances": len(entries),
        "total_hours": float(d.sum() / 3600),
        "duration": {
            "mean": float(d.mean()), "min": float(d.min()),
            "max": float(d.max()),
            "p50": float(np.percentile(d, 50)),
            "p95": float(np.percentile(d, 95)),
        },
        "char_rate_cps": float(np.mean(char_rates)) if char_rates else 0.0,
        "word_rate_wps": float(np.mean(word_rates)) if word_rates else 0.0,
        "problems": {
            "missing_audio": missing_audio,
            "empty_text": empty_text,
            # implausible speaking rates flag alignment/transcript issues
            "suspicious_char_rate": [
                i for i, (e, cr) in enumerate(zip(entries, char_rates))
                if cr > 40 or cr < 1
            ] if char_rates else [],
            "oov_chars": dict(sorted(oov_chars.items(),
                                     key=lambda kv: -kv[1])[:20]),
        },
    }
    return stats


def report(stats: Dict) -> str:
    p = stats["problems"]
    lines = [
        f"utterances : {stats['num_utterances']}",
        f"total      : {stats['total_hours']:.2f} h",
        f"duration   : mean {stats['duration']['mean']:.2f}s  "
        f"p50 {stats['duration']['p50']:.2f}s  p95 {stats['duration']['p95']:.2f}s  "
        f"range [{stats['duration']['min']:.2f}, {stats['duration']['max']:.2f}]",
        f"char rate  : {stats['char_rate_cps']:.1f} cps   "
        f"word rate: {stats['word_rate_wps']:.1f} wps",
        f"problems   : {len(p['missing_audio'])} missing audio, "
        f"{len(p['empty_text'])} empty text, "
        f"{len(p['suspicious_char_rate'])} suspicious rate, "
        f"{len(p['oov_chars'])} OOV chars",
    ]
    return "\n".join(lines)
