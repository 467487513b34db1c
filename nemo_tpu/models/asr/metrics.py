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


def _ngram_counts(toks: Sequence, n: int):
    from collections import Counter

    return Counter(tuple(toks[i:i + n]) for i in range(len(toks) - n + 1))


def corpus_bleu(
    hypotheses: List[str],
    references,  # List[str] or List[List[str]] (multi-reference)
    max_order: int = 4,
    smooth: bool = False,
    tokenizer=None,
    scale: float = 100.0,
) -> float:
    """Corpus BLEU (Papineni et al. 2002): clipped n-gram precision
    geometric mean × brevity penalty, reported on the SacreBLEU 0-100
    scale (pass scale=1.0 for the 0-1 convention).

    Reference parity: `nemo/collections/asr/metrics/bleu.py` (BLEU
    torchmetric wrapping SacreBLEU, used by AED/Canary translation
    validation) — here a self-contained implementation; `smooth` applies
    Lin & Och add-1 smoothing to orders > 1 (sacrebleu's 'floor'-style
    behavior for sentence-level use)."""
    if len(hypotheses) != len(references):
        raise ValueError(
            f"{len(hypotheses)} hypotheses vs {len(references)} references")
    tok = tokenizer or (lambda s: s.split())
    clipped = [0] * max_order
    totals = [0] * max_order
    hyp_len = 0
    ref_len = 0
    for h, refs in zip(hypotheses, references):
        if isinstance(refs, str):
            refs = [refs]
        h_toks = tok(h)
        r_toks = [tok(r) for r in refs]
        hyp_len += len(h_toks)
        # closest reference length (sacrebleu convention)
        ref_len += min((abs(len(r) - len(h_toks)), len(r)) for r in r_toks)[1]
        for n in range(1, max_order + 1):
            h_ng = _ngram_counts(h_toks, n)
            best = {}
            for r in r_toks:
                for g, c in _ngram_counts(r, n).items():
                    best[g] = max(best.get(g, 0), c)
            clipped[n - 1] += sum(min(c, best.get(g, 0)) for g, c in h_ng.items())
            totals[n - 1] += max(len(h_toks) - n + 1, 0)
    import math

    log_p = 0.0
    for n in range(max_order):
        num, den = clipped[n], totals[n]
        if smooth and n > 0:
            num, den = num + 1, den + 1
        if num == 0 or den == 0:
            return 0.0
        log_p += math.log(num / den)
    geo = math.exp(log_p / max_order)
    bp = 1.0 if hyp_len > ref_len else math.exp(1.0 - ref_len / max(hyp_len, 1))
    return bp * geo * scale


class BLEU:
    """Accumulating corpus-BLEU metric (reference: BLEU torchmetric)."""

    def __init__(self, max_order: int = 4, smooth: bool = False, tokenizer=None):
        self.max_order = max_order
        self.smooth = smooth
        self.tokenizer = tokenizer
        self.reset()

    def reset(self):
        self._hyps: List[str] = []
        self._refs: list = []

    def update(self, hypotheses: List[str], references):
        self._hyps.extend(hypotheses)
        self._refs.extend(references)

    def compute(self) -> float:
        return corpus_bleu(self._hyps, self._refs, self.max_order,
                           self.smooth, self.tokenizer)
