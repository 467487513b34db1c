"""CTC-based word spotting for context biasing (custom-word boosting).

Boosts recognition of rare words/phrases (names, jargon) WITHOUT
retraining: a prefix trie over the words' tokenizations is searched
against the per-frame CTC log-probs with a token-passing DP; spotted
words that beat the greedy transcript's overlapping words are spliced
into the final text.

Reference behavior: nemo/collections/asr/parts/context_biasing/
(ctc_based_word_spotter.py:265 run_word_spotter, context_graph_ctc.py,
context_biasing_utils.py:27 merge_alignment_with_ws_hyps). This
implementation differs structurally: instead of materializing blank
nodes in the graph, the DP state carries an ``after_blank`` bit per trie
node (the same CTC-topology device as ops/wfst.py), and all pruning is
done on plain (node, bit) dict states host-side — the spotter consumes
the [T, V+1] log-probs the device already produced for greedy decoding,
so biasing adds no TPU work.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "WSHyp",
    "ContextGraph",
    "build_context_graph",
    "spot_words",
    "ctc_word_alignment",
    "merge_spots_into_transcript",
    "boost_ctc_transcript",
    "compute_fscore",
]


@dataclass
class WSHyp:
    """A spotted word: accumulated log-score and frame span."""

    word: str
    score: float
    start_frame: int
    end_frame: int


class ContextGraph:
    """Prefix trie over token-id sequences of the biasing words.

    Each node stores its children (token id -> node), the token id of the
    arc that enters it (for CTC repeat/collapse handling), and whether it
    terminates a word. One word may contribute several tokenizations
    (alternative BPE segmentations improve recall).
    """

    def __init__(self) -> None:
        self.children: List[Dict[int, int]] = [{}]
        self.in_tok: List[int] = [-1]
        self.word: List[Optional[str]] = [None]

    @property
    def root(self) -> int:
        return 0

    def add(self, word: str, tokenizations: Sequence[Sequence[int]]) -> None:
        for toks in tokenizations:
            if not toks:
                continue
            node = 0
            for t in toks:
                t = int(t)
                nxt = self.children[node].get(t)
                if nxt is None:
                    nxt = len(self.children)
                    self.children[node][t] = nxt
                    self.children.append({})
                    self.in_tok.append(t)
                    self.word.append(None)
                node = nxt
            self.word[node] = word

    def num_nodes(self) -> int:
        return len(self.children)


def build_context_graph(
    words: Sequence[str],
    encode: Callable[[str], Sequence[int]],
    alt_encodes: Sequence[Callable[[str], Sequence[int]]] = (),
) -> ContextGraph:
    """Build a trie from words using a tokenizer ``encode`` function
    (e.g. ``lambda w: tok.text_to_ids(" " + w)``) plus optional
    alternative segmenters."""
    g = ContextGraph()
    for w in words:
        seqs = [list(encode(w))]
        for alt in alt_encodes:
            s = list(alt(w))
            if s and s not in seqs:
                seqs.append(s)
        g.add(w, seqs)
    return g


def spot_words(
    logprobs: np.ndarray,
    graph: ContextGraph,
    blank_id: int,
    *,
    cb_weight: float = 3.0,
    beam_threshold: float = 5.0,
    keyword_threshold: float = -5.0,
    blank_threshold: float = 0.8,
    non_blank_threshold: float = 0.001,
    intersection_threshold: float = 10.0,
) -> List[WSHyp]:
    """Token-passing word spotter over one utterance's CTC log-probs.

    State = (trie node, after_blank bit); per frame each state may
    (a) re-emit the node's incoming token (CTC repeat), (b) emit blank
    (sets the bit), or (c) advance along a child arc — advancing onto a
    token equal to the incoming token requires the blank bit (CTC
    collapse would merge them otherwise). Non-blank advances earn
    ``cb_weight``; a new root token is injected every frame so words can
    start anywhere. Returns overlap-resolved spottings above
    ``keyword_threshold``.
    """
    T, V = logprobs.shape
    assert 0 <= blank_id < V
    log_blank_thr = float(np.log(blank_threshold))
    log_nonblank_thr = float(np.log(non_blank_threshold))
    root = graph.root
    children = graph.children
    in_tok = graph.in_tok
    words = graph.word

    # state key -> (score, start_frame); key = node * 2 + after_blank
    active: Dict[int, Tuple[float, int]] = {}
    spotted: List[WSHyp] = []

    for frame in range(T):
        lp = logprobs[frame]
        nxt: Dict[int, Tuple[float, int]] = {}
        best = -np.inf

        def offer(key: int, score: float, start: int) -> None:
            cur = nxt.get(key)
            if cur is None or score > cur[0]:
                nxt[key] = (score, start)

        # fresh attempt from the root each frame (unless this frame is
        # confidently blank — cheap pre-pruning)
        root_entries: List[Tuple[int, float, int, bool]] = []
        if lp[blank_id] <= log_blank_thr:
            root_entries.append((root, 0.0, frame, True))

        items: List[Tuple[int, float, int, bool]] = [
            (key >> 1, sc, st, bool(key & 1)) for key, (sc, st) in active.items()
        ] + root_entries

        for node, score, start, after_blank in items:
            at_root = node == root
            if not at_root:
                # (a) repeat the incoming token
                s = score + float(lp[in_tok[node]])
                if s > best - beam_threshold:
                    best = max(best, s)
                    offer(node << 1, s, start)
                # (b) blank self-loop
                s = score + float(lp[blank_id])
                if s > best - beam_threshold:
                    best = max(best, s)
                    offer((node << 1) | 1, s, start)
            # (c) advance along child arcs
            for tok, child in children[node].items():
                ltok = float(lp[tok])
                if at_root and ltok < log_nonblank_thr:
                    continue
                if not at_root and tok == in_tok[node] and not after_blank:
                    continue  # CTC would collapse the repeat
                s = score + ltok + cb_weight
                if s <= best - beam_threshold:
                    continue
                best = max(best, s)
                w = words[child]
                if w is not None and s > keyword_threshold:
                    spotted.append(WSHyp(w, s, start, frame))
                if children[child]:
                    offer(child << 1, s, start)

        # beam pruning against the frame best
        active = {
            k: v for k, v in nxt.items() if v[0] > best - beam_threshold
        }

    return _resolve_overlaps(spotted, intersection_threshold)


def _overlap_pct(a: Tuple[int, int], b: Tuple[int, int]) -> float:
    """Overlap of [a0,a1] with [b0,b1] as % of b's length."""
    inter = min(a[1], b[1]) - max(a[0], b[0]) + 1
    if inter <= 0:
        return 0.0
    return 100.0 * inter / (b[1] - b[0] + 1)


def _resolve_overlaps(spots: List[WSHyp], threshold: float) -> List[WSHyp]:
    """Keep only the best-scoring spot among mutually overlapping ones
    (reference find_best_hyps semantics)."""
    kept: List[WSHyp] = []
    for hyp in sorted(spots, key=lambda h: -h.score):
        span = (hyp.start_frame, hyp.end_frame)
        clash = any(
            _overlap_pct(span, (k.start_frame, k.end_frame)) >= threshold
            or _overlap_pct((k.start_frame, k.end_frame), span) >= threshold
            for k in kept
        )
        if not clash:
            kept.append(hyp)
    kept.sort(key=lambda h: h.start_frame)
    return kept


def ctc_word_alignment(
    logprobs: np.ndarray,
    pieces: Sequence[str],
    blank_id: int,
    *,
    bow: str = "▁",
    token_weight: float = 0.5,
) -> List[Tuple[str, int, int, float]]:
    """Word-level alignment (word, start, end, score) from greedy CTC.

    Score = sum of per-token best log-probs (+ ``token_weight`` each) —
    the yardstick a spotted word must beat to replace greedy output
    (reference get_ctc_word_alignment)."""
    ids = np.argmax(logprobs, axis=1)
    toks: List[Tuple[str, int, float]] = []  # (piece, frame, logprob)
    prev = -1
    for i, idx in enumerate(ids):
        idx = int(idx)
        if idx != blank_id:
            acc = float(logprobs[i, idx])
            if idx == prev and toks:
                acc += toks.pop()[2]
            toks.append((pieces[idx] if idx < len(pieces) else "", i, acc))
        prev = idx

    out: List[Tuple[str, int, int, float]] = []
    word, l, r, sc = "", 0, 0, 0.0
    for piece, i, acc in toks:
        starts = piece.startswith(bow)
        body = piece[len(bow):] if starts else piece
        if word and starts:
            out.append((word, l, r, sc))
            word = ""
        if not word:
            word, l, r, sc = body, i, i, acc + token_weight
        else:
            word += body
            r, sc = i, sc + acc + token_weight
    if word:
        out.append((word, l, r, sc))
    return out


def _filter_spots(
    spots: List[WSHyp], alignment: List[Tuple[str, int, int, float]]
) -> List[WSHyp]:
    """Drop spots whose score loses to the greedy words they overlap
    (full weight for the first overlapped word, fractional for the
    rest — reference filter_wb_hyps semantics)."""
    if not alignment:
        return spots
    out = []
    for hyp in spots:
        span = (hyp.start_frame, hyp.end_frame)
        rival = 0.0
        first = True
        for word, l, r, sc in alignment:
            pct = _overlap_pct(span, (l, r))
            if pct <= 0:
                continue
            rival += sc if first else (pct / 100.0) * sc
            first = False
        if first or hyp.score >= rival:
            out.append(hyp)
    return out


def merge_spots_into_transcript(
    logprobs: np.ndarray,
    spots: List[WSHyp],
    pieces: Sequence[str],
    blank_id: int,
    *,
    bow: str = "▁",
    intersection_threshold: float = 30.0,
) -> str:
    """Splice spotted words into the greedy transcript: greedy words
    overlapped >= threshold%% by a spot are replaced; spots overlapping
    nothing are inserted at their start-frame position."""
    ali = ctc_word_alignment(logprobs, pieces, blank_id, bow=bow,
                             token_weight=0.0)
    if not ali:
        return " ".join(h.word for h in spots)
    slots: List[Tuple[int, str]] = []  # (start_frame, text)
    emitted = [False] * len(spots)
    for word, l, r, _ in ali:
        repl = None
        for j, hyp in enumerate(spots):
            if _overlap_pct((hyp.start_frame, hyp.end_frame), (l, r)) >= (
                intersection_threshold
            ):
                repl = j
                break
        if repl is None:
            slots.append((l, word))
        elif not emitted[repl]:
            # a spot spanning several greedy words replaces all of them
            # but is emitted once
            slots.append((spots[repl].start_frame, spots[repl].word))
            emitted[repl] = True
    for j, hyp in enumerate(spots):
        if not emitted[j]:
            slots.append((hyp.start_frame, hyp.word))
    slots.sort(key=lambda s: s[0])
    return " ".join(w for _, w in slots if w)


def boost_ctc_transcript(
    logprobs: np.ndarray,
    graph: ContextGraph,
    pieces: Sequence[str],
    blank_id: int,
    *,
    bow: str = "▁",
    cb_weight: float = 3.0,
    beam_threshold: float = 5.0,
    keyword_threshold: float = -5.0,
    ctc_ali_token_weight: float = 0.5,
    intersection_threshold: float = 30.0,
) -> Tuple[str, List[WSHyp]]:
    """One-call context biasing for a single utterance: spot → filter
    against greedy alignment → merge. Returns (boosted_text, spots)."""
    spots = spot_words(
        logprobs, graph, blank_id, cb_weight=cb_weight,
        beam_threshold=beam_threshold, keyword_threshold=keyword_threshold,
    )
    ali = ctc_word_alignment(
        logprobs, pieces, blank_id, bow=bow, token_weight=ctc_ali_token_weight
    )
    spots = _filter_spots(spots, ali)
    text = merge_spots_into_transcript(
        logprobs, spots, pieces, blank_id, bow=bow,
        intersection_threshold=intersection_threshold,
    )
    return text, spots


def compute_fscore(
    hyp_texts: Sequence[str],
    ref_texts: Sequence[str],
    keywords: Sequence[str],
) -> Dict[str, float]:
    """Keyword precision/recall/F1 over a corpus (reference
    context_biasing_utils.compute_fscore semantics: per-occurrence
    counts clipped to the reference count per utterance)."""
    tp = fp = fn = 0
    for hyp, ref in zip(hyp_texts, ref_texts):
        h, r = hyp.lower().split(), ref.lower().split()
        for kw in keywords:
            kw = kw.lower()
            nh, nr = h.count(kw), r.count(kw)
            tp += min(nh, nr)
            fp += max(0, nh - nr)
            fn += max(0, nr - nh)
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"precision": prec, "recall": rec, "f1": f1,
            "tp": float(tp), "fp": float(fp), "fn": float(fn)}
