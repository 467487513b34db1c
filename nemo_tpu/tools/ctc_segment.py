"""CTC segmentation: cut long audio into utterance segments for dataset
creation.

Reference parity: `tools/ctc_segmentation/` (scripts/run_ctc_segmentation +
cut_audio: align a long recording against its known utterance list with a
CTC model, emit per-utterance {offset, duration, score} manifest rows, drop
low-confidence segments).

TPU-native: log-probs for arbitrarily long audio come from overlapping
fixed-shape windows (ONE jit compile, same discipline as
`transcribe_buffered`, ctc_models.py:445); the alignment itself is the
`lax.scan` constrained Viterbi from `tools/forced_align.py` run over the
concatenation of all utterances, so utterance boundaries fall out of one
pass instead of per-utterance re-decodes.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from nemo_tpu.tools.forced_align import TokenSpan, ctc_forced_align


@dataclass
class Segment:
    text: str
    start: float  # seconds
    end: float  # seconds
    score: float  # mean aligned-path frame log-prob (0 = certain)


def buffered_log_probs(
    model,
    x: np.ndarray,
    chunk_secs: float = 20.0,
    context_secs: float = 2.0,
    batch_size: int = 4,
) -> np.ndarray:
    """[T', V+1] log-probs for audio of any length: overlapping windows with
    acoustic context on both sides, middle frames kept (the FrameBatchASR
    windowing of `transcribe_buffered`, but keeping the full distribution
    instead of the argmax ids)."""
    sr = model.sample_rate
    x = np.asarray(x, np.float32)
    win = int((chunk_secs + 2 * context_secs) * sr)
    if len(x) <= win:
        lp, enc_len = model.forward(jnp.asarray(x[None]),
                                    jnp.asarray([len(x)], jnp.int32))
        return np.asarray(lp[0][: int(enc_len[0])])

    hop = int(chunk_secs * sr)
    ctx = int(context_secs * sr)
    n_audio = len(x)
    x = np.concatenate([np.zeros(ctx, np.float32), x])
    n_win = int(np.ceil((len(x) - 2 * ctx) / hop))
    pad_total = 2 * ctx + n_win * hop
    x = np.concatenate([x, np.zeros(max(0, pad_total - len(x)), np.float32)])
    windows = np.stack([x[i * hop: i * hop + win] for i in range(n_win)])

    chunks: List[np.ndarray] = []
    for s in range(0, n_win, batch_size):
        wb = windows[s: s + batch_size]
        nb = len(wb)
        if nb < batch_size:
            wb = np.concatenate(
                [wb, np.zeros((batch_size - nb, win), np.float32)])
        lp, enc_len = model.forward(
            jnp.asarray(wb), jnp.full((batch_size,), win, jnp.int32))
        lp = np.asarray(lp)
        F = int(np.asarray(enc_len)[0])  # identical across full windows
        f_ctx = int(round(F * ctx / win))
        for b in range(nb):
            chunks.append(lp[b, f_ctx: F - f_ctx])
    out = np.concatenate(chunks, axis=0)
    # trim trailing frames that came from the zero padding
    n_frames = int(round(out.shape[0] * n_audio / (n_win * hop)))
    return out[: max(n_frames, 1)]


def _tokenize_utterances(
    model, utterances: Sequence[str],
) -> Tuple[List[int], List[Tuple[int, int]]]:
    """Char-tokenize each utterance with the model's labels; returns the
    concatenated token ids and each utterance's [start, end) token range."""
    label_to_id = {c: i for i, c in enumerate(model.labels)}
    ids: List[int] = []
    ranges: List[Tuple[int, int]] = []
    for text in utterances:
        lo = len(ids)
        for ch in text:
            if ch in label_to_id:
                ids.append(label_to_id[ch])
        ranges.append((lo, len(ids)))
    return ids, ranges


def segment_long_audio(
    model,
    audio,  # path or [T] float array
    utterances: Sequence[str],
    chunk_secs: float = 20.0,
    context_secs: float = 2.0,
    batch_size: int = 4,
) -> List[Segment]:
    """Align `utterances` (in order) against one long recording; returns a
    Segment per utterance with start/end seconds and a confidence score
    (mean log-prob of the aligned token frames — 0 is certain, very
    negative means the text is not in the audio there)."""
    from nemo_tpu.data.audio_io import read_wav

    if isinstance(audio, str):
        sig, _ = read_wav(audio, target_sr=model.sample_rate)
    else:
        sig = np.asarray(audio, np.float32)

    lp = buffered_log_probs(model, sig, chunk_secs=chunk_secs,
                            context_secs=context_secs, batch_size=batch_size)
    frame_secs = (len(sig) / model.sample_rate) / max(lp.shape[0], 1)

    ids, ranges = _tokenize_utterances(model, utterances)
    if not ids:
        return []
    spans = ctc_forced_align(lp, ids, blank=model.decoding.blank_id)

    segs: List[Segment] = []
    for text, (lo, hi) in zip(utterances, ranges):
        utt = spans[lo:hi]
        if not utt:
            segs.append(Segment(text=text, start=0.0, end=0.0,
                                score=float("-inf")))
            continue
        frame_lps: List[float] = []
        for s in utt:
            for t in range(s.start_frame, s.end_frame):
                frame_lps.append(float(lp[t, s.token]))
        segs.append(Segment(
            text=text,
            start=utt[0].start_frame * frame_secs,
            end=utt[-1].end_frame * frame_secs,
            score=float(np.mean(frame_lps)) if frame_lps else float("-inf"),
        ))
    return segs


def write_segment_manifest(
    out_path: str,
    audio_filepath: str,
    segments: Sequence[Segment],
    min_score: Optional[float] = None,
) -> int:
    """Write manifest jsonl rows ({audio_filepath, offset, duration, text,
    score}); segments under `min_score` are dropped (the reference's
    cut_audio threshold). Returns the number of rows written."""
    n = 0
    with open(out_path, "w") as f:
        for s in segments:
            if min_score is not None and not (s.score >= min_score):
                continue
            f.write(json.dumps({
                "audio_filepath": audio_filepath,
                "offset": round(s.start, 3),
                "duration": round(max(s.end - s.start, 0.0), 3),
                "text": s.text,
                "score": round(s.score, 4),
            }) + "\n")
            n += 1
    return n
