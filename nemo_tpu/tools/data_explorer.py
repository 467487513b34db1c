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


def _svg_hist(values, bins=24, width=480, height=120, color="#4c78a8"):
    """Inline SVG histogram (no plotting deps)."""
    v = np.asarray(values, np.float64)
    if len(v) == 0:
        return "<svg/>"
    counts, edges = np.histogram(v, bins=bins)
    peak = max(counts.max(), 1)
    bw = width / bins
    bars = []
    for i, c in enumerate(counts):
        h = height * c / peak
        bars.append(
            f'<rect x="{i * bw:.1f}" y="{height - h:.1f}" '
            f'width="{bw - 1:.1f}" height="{h:.1f}" fill="{color}">'
            f'<title>[{edges[i]:.2f}, {edges[i + 1]:.2f}): {c}</title></rect>')
    return (f'<svg width="{width}" height="{height + 18}" '
            f'xmlns="http://www.w3.org/2000/svg">' + "".join(bars) +
            f'<text x="0" y="{height + 14}" font-size="11">'
            f'{edges[0]:.2f}</text>'
            f'<text x="{width - 40}" y="{height + 14}" font-size="11">'
            f'{edges[-1]:.2f}</text></svg>')


def to_html(stats: Dict, durations: Optional[Sequence[float]] = None,
            char_rates: Optional[Sequence[float]] = None,
            title: str = "Speech Data Explorer") -> str:
    """Self-contained HTML dashboard (the reference SDE's interactive dash
    analog: stat tiles, duration/char-rate histograms, problem tables) —
    no external assets, opens from disk."""
    d = stats["duration"]
    prob = stats["problems"]

    def tile(label, value):
        return (f'<div style="display:inline-block;margin:8px;padding:12px '
                f'16px;border:1px solid #ddd;border-radius:8px">'
                f'<div style="font-size:22px;font-weight:600">{value}</div>'
                f'<div style="font-size:12px;color:#666">{label}</div></div>')

    tiles = "".join([
        tile("utterances", f"{stats['num_utterances']:,}"),
        tile("hours", f"{stats['total_hours']:.2f}"),
        tile("mean dur (s)", f"{d['mean']:.2f}"),
        tile("p95 dur (s)", f"{d['p95']:.2f}"),
        tile("chars/sec", f"{stats['char_rate_cps']:.1f}"),
        tile("words/sec", f"{stats['word_rate_wps']:.2f}"),
    ])
    sections = [f"<h1>{title}</h1>", tiles]
    if durations is not None and len(durations):
        sections.append("<h3>Duration distribution (s)</h3>"
                        + _svg_hist(durations))
    if char_rates is not None and len(char_rates):
        sections.append("<h3>Character rate (chars/sec)</h3>"
                        + _svg_hist(char_rates, color="#f58518"))
    rows = []
    for k in ("missing_audio", "empty_text", "suspicious_char_rate"):
        idx = prob.get(k, [])
        rows.append(f"<tr><td>{k}</td><td>{len(idx)}</td>"
                    f"<td>{idx[:12]}</td></tr>")
    oov = prob.get("oov_chars", {})
    rows.append(f"<tr><td>oov_chars</td><td>{len(oov)}</td>"
                f"<td>{dict(list(oov.items())[:12])}</td></tr>")
    sections.append(
        "<h3>Problems</h3><table border=1 cellpadding=6 "
        "style='border-collapse:collapse'>"
        "<tr><th>check</th><th>count</th><th>first indices</th></tr>"
        + "".join(rows) + "</table>")
    return ("<!doctype html><html><head><meta charset='utf-8'>"
            "<style>body{font-family:system-ui;margin:24px}</style>"
            "</head><body>" + "".join(sections) + "</body></html>")


def explore_to_html(manifest_path: str, out_path: str,
                    vocab: Optional[Sequence[str]] = None) -> Dict:
    """Analyze + write the HTML dashboard; returns the stats."""
    import json as _json

    entries = []
    with open(manifest_path) as f:
        for line in f:
            if line.strip():
                entries.append(_json.loads(line))
    durations = [e.get("duration") for e in entries
                 if e.get("duration") is not None]
    char_rates = [len(e.get("text", "")) / e["duration"] for e in entries
                  if e.get("duration") and e.get("text")]
    stats = analyze_manifest(manifest_path, vocab=vocab)
    html = to_html(stats, durations, char_rates)
    with open(out_path, "w") as f:
        f.write(html)
    return stats
