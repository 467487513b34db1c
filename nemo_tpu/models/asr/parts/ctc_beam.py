"""CTC prefix beam search + timestamps + confidence.

Reference parity: `asr/parts/submodules/ctc_beam_decoding.py` (beam search),
timestamps/confidence options of AbstractCTCDecoding (`ctc_decoding.py:599,
687`). Decoding beams are host-side logic (the device produces per-frame
log-probs); this is the flashlight-free default beam decoder.
"""

from __future__ import annotations

import math
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

NEG_INF = -float("inf")


def _logsumexp(*xs):
    m = max(xs)
    if m == NEG_INF:
        return NEG_INF
    return m + math.log(sum(math.exp(x - m) for x in xs))


def ctc_prefix_beam_search(
    log_probs: np.ndarray,  # [T, V] (blank last)
    beam_size: int = 16,
    blank: Optional[int] = None,
    lm=None,  # optional callable(prefix_tuple, new_token) -> log p
    lm_weight: float = 0.0,
) -> List[Tuple[List[int], float]]:
    """Returns beam of (token ids, log prob), best first."""
    T, V = log_probs.shape
    if blank is None:
        blank = V - 1
    # beams: prefix -> (p_blank, p_nonblank)
    beams: Dict[tuple, Tuple[float, float]] = {(): (0.0, NEG_INF)}
    for t in range(T):
        lp = log_probs[t]
        # prune vocab for speed
        top_v = np.argsort(lp)[-max(beam_size * 2, 8):]
        new: Dict[tuple, Tuple[float, float]] = defaultdict(lambda: (NEG_INF, NEG_INF))
        for prefix, (pb, pnb) in beams.items():
            p_tot = _logsumexp(pb, pnb)
            for v in top_v:
                p = float(lp[v])
                if v == blank:
                    b_, nb_ = new[prefix]
                    new[prefix] = (_logsumexp(b_, p_tot + p), nb_)
                elif prefix and v == prefix[-1]:
                    # repeat collapses into the same prefix (non-blank path);
                    # the after-blank path starts a new occurrence
                    b_, nb_ = new[prefix]
                    new[prefix] = (b_, _logsumexp(nb_, pnb + p))
                    ext = prefix + (int(v),)
                    b2, nb2 = new[ext]
                    bonus = lm_weight * lm(prefix, int(v)) if lm else 0.0
                    new[ext] = (b2, _logsumexp(nb2, pb + p + bonus))
                else:
                    ext = prefix + (int(v),)
                    b2, nb2 = new[ext]
                    bonus = lm_weight * lm(prefix, int(v)) if lm else 0.0
                    new[ext] = (b2, _logsumexp(nb2, p_tot + p + bonus))
        scored = sorted(
            new.items(), key=lambda kv: -_logsumexp(*kv[1])
        )[:beam_size]
        beams = dict(scored)
    out = [
        (list(prefix), _logsumexp(pb, pnb)) for prefix, (pb, pnb) in beams.items()
    ]
    out.sort(key=lambda x: -x[1])
    return out


def ctc_greedy_with_timestamps(
    log_probs: np.ndarray,  # [T, V]
    frame_duration: float,  # seconds per encoder frame
    blank: Optional[int] = None,
) -> Dict:
    """Greedy decode with char offsets + frame confidence
    (reference ctc_decoding.py timestamps :687, confidence :599)."""
    T, V = log_probs.shape
    if blank is None:
        blank = V - 1
    ids = np.argmax(log_probs, axis=-1)
    probs = np.exp(np.max(log_probs, axis=-1))
    tokens, offsets, confs = [], [], []
    prev = -1
    for t, v in enumerate(ids):
        if v != prev and v != blank:
            tokens.append(int(v))
            offsets.append({"token": int(v), "start": t * frame_duration,
                            "end": (t + 1) * frame_duration})
            confs.append(float(probs[t]))
        elif v == prev and v != blank and offsets:
            offsets[-1]["end"] = (t + 1) * frame_duration
        prev = v
    return {
        "tokens": tokens,
        "timestamps": offsets,
        "confidence": float(np.mean(confs)) if confs else 0.0,
    }
