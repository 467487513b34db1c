"""ASR metrics: word / char error rate.

Reference parity: `nemo/collections/asr/metrics/wer.py:210` (WER torchmetric)
— here a pure-python accumulator (metrics are host-side bookkeeping; the
device only produces token ids).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple


def _edit_distance(a: Sequence, b: Sequence) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def word_error_rate(hypotheses: List[str], references: List[str], use_cer: bool = False) -> float:
    scores, words = 0, 0
    for h, r in zip(hypotheses, references):
        h_toks = list(h) if use_cer else h.split()
        r_toks = list(r) if use_cer else r.split()
        scores += _edit_distance(h_toks, r_toks)
        words += len(r_toks)
    return scores / max(words, 1)


class WER:
    """Accumulating WER metric (reference: WER torchmetric)."""

    def __init__(self, use_cer: bool = False):
        self.use_cer = use_cer
        self.reset()

    def reset(self):
        self._errors = 0
        self._words = 0

    def update(self, hypotheses: List[str], references: List[str]):
        for h, r in zip(hypotheses, references):
            h_toks = list(h) if self.use_cer else h.split()
            r_toks = list(r) if self.use_cer else r.split()
            self._errors += _edit_distance(h_toks, r_toks)
            self._words += len(r_toks)

    def compute(self) -> float:
        return self._errors / max(self._words, 1)


def diarization_error_rate(
    ref_segments,  # [{'speaker', 'start', 'end'}] seconds (or frames)
    hyp_segments,
    resolution: float = 0.01,
    collar: float = 0.0,
) -> dict:
    """Frame-based DER with optimal speaker mapping.

    Reference parity: the DER scoring used by the diarization models
    (`asr/metrics/der.py` wrapping md-eval/pyannote) — here a self-contained
    frame discretization: DER = (miss + false-alarm + confusion) / ref-speech,
    with the hyp↔ref speaker mapping chosen by maximum overlap (Hungarian on
    the small speaker-pair overlap matrix via exhaustive permutations for
    ≤8 speakers, greedy beyond).
    """
    import itertools

    import numpy as np

    def grid(segs):
        if not segs:
            return {}, 0
        end = max(s["end"] for s in segs)
        n = int(np.ceil(end / resolution)) + 1
        out = {}
        for s in segs:
            a = int(round((s["start"] + collar) / resolution))
            b = int(round((s["end"] - collar) / resolution))
            if b <= a:
                continue
            m = out.setdefault(s["speaker"], np.zeros(n, bool))
            m[a:b] = True
        return out, n

    ref, n_r = grid(ref_segments)
    hyp, n_h = grid(hyp_segments)
    n = max(n_r, n_h, 1)
    for d in (ref, hyp):
        for k in list(d):
            m = d[k]
            if len(m) < n:
                d[k] = np.pad(m, (0, n - len(m)))

    ref_ids, hyp_ids = list(ref), list(hyp)
    overlap = np.zeros((len(ref_ids), len(hyp_ids)))
    for i, r in enumerate(ref_ids):
        for j, h in enumerate(hyp_ids):
            overlap[i, j] = np.sum(ref[r] & hyp[h])
    # best mapping
    best_map = {}
    if ref_ids and hyp_ids:
        k = min(len(ref_ids), len(hyp_ids))
        if len(hyp_ids) <= 8:
            best_score = -1
            for perm in itertools.permutations(range(len(hyp_ids)), k):
                sc = sum(overlap[i, j] for i, j in zip(range(k), perm))
                if sc > best_score:
                    best_score = sc
                    best_map = {ref_ids[i]: hyp_ids[j]
                                for i, j in zip(range(k), perm)}
        else:  # greedy
            used = set()
            for i in np.argsort(-overlap.max(axis=1)):
                j = int(np.argmax([overlap[i, jj] if jj not in used else -1
                                   for jj in range(len(hyp_ids))]))
                best_map[ref_ids[i]] = hyp_ids[j]
                used.add(j)

    ref_any = np.zeros(n, bool)
    for m in ref.values():
        ref_any |= m
    hyp_any = np.zeros(n, bool)
    for m in hyp.values():
        hyp_any |= m

    miss = np.sum(ref_any & ~hyp_any)
    fa = np.sum(~ref_any & hyp_any)
    conf = 0
    both = ref_any & hyp_any
    # confusion: frames where speech matched but mapped speaker wrong
    matched = np.zeros(n, bool)
    for r, h in best_map.items():
        matched |= ref[r] & hyp[h]
    conf = np.sum(both & ~matched)
    total = max(int(np.sum(ref_any)), 1)
    der = (miss + fa + conf) / total
    return {"der": float(der), "miss": float(miss / total),
            "false_alarm": float(fa / total),
            "confusion": float(conf / total)}
