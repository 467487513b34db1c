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
