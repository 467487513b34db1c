"""WFST-constrained CTC decoding (K2/WFST analog).

Reference parity: the K2/WFST CTC decoding stack
(`nemo/collections/asr/parts/k2/`, `asr/modules/graph_decoder.py` and the
riva WFST decoder): decode against a weighted FST built from a
lexicon/grammar so only in-graph hypotheses are produced (keyword boosting,
command grammars, contextual biasing).

Design: the reference decoders run on host (k2 CPU/GPU library, riva C++
decoder) beside the accelerator acoustic model; here the acoustic forward
stays on TPU and the token-passing Viterbi over the explicit FST is compact
vectorized numpy on host — arcs stored as flat arrays, one frame = one
gather/scatter-max over active arcs (epsilon-free token FSTs).

Graphs: `linear_fst` (single phrase), `grammar_fst` (union of phrases,
optionally looped) — built over TOKEN ids (CTC units), with the CTC
blank/self-loop handled by the decoder itself (token-passing over a CTC
trellis on FST states), so graphs stay epsilon-free and tiny.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

NEG_INF = -1e30


@dataclass
class WFST:
    """Epsilon-free acceptor over token ids.

    arcs: from_state[i] --ilabel[i]/weight[i]--> to_state[i]
    start state 0; final_weight[s] > -inf marks finals.
    """

    n_states: int
    arc_from: np.ndarray  # [A] int32
    arc_to: np.ndarray  # [A] int32
    arc_ilabel: np.ndarray  # [A] int32 (token id)
    arc_weight: np.ndarray  # [A] float32 (log domain, added to path score)
    final_weight: np.ndarray  # [S] float32 (NEG_INF = not final)

    @property
    def n_arcs(self) -> int:
        return len(self.arc_from)


def linear_fst(tokens: Sequence[int], weight: float = 0.0) -> WFST:
    """Chain accepting exactly `tokens`; `weight` spread per arc (boost)."""
    n = len(tokens)
    fw = np.full(n + 1, NEG_INF, np.float32)
    fw[n] = 0.0
    per = weight / max(n, 1)
    return WFST(
        n_states=n + 1,
        arc_from=np.arange(n, dtype=np.int32),
        arc_to=np.arange(1, n + 1, dtype=np.int32),
        arc_ilabel=np.asarray(tokens, np.int32),
        arc_weight=np.full(n, per, np.float32),
        final_weight=fw,
    )


def grammar_fst(phrases: Sequence[Sequence[int]],
                weights: Optional[Sequence[float]] = None,
                loop: bool = False) -> WFST:
    """Union of token phrases from a shared start state; `loop=True` adds
    final→start ε-free restart arcs by merging finals into the start state
    (command-grammar loop)."""
    weights = list(weights) if weights is not None else [0.0] * len(phrases)
    arc_f, arc_t, arc_i, arc_w = [], [], [], []
    n_states = 1
    finals = []
    for phrase, w in zip(phrases, weights):
        per = w / max(len(phrase), 1)
        prev = 0
        for j, tok in enumerate(phrase):
            last = j == len(phrase) - 1
            if last and loop:
                nxt = 0  # restart
            else:
                nxt = n_states
                n_states += 1
            arc_f.append(prev)
            arc_t.append(nxt)
            arc_i.append(int(tok))
            arc_w.append(per)
            prev = nxt
        finals.append(prev)
    fw = np.full(n_states, NEG_INF, np.float32)
    for s in finals:
        fw[s] = 0.0
    if loop:
        fw[0] = 0.0
    return WFST(n_states, np.asarray(arc_f, np.int32),
                np.asarray(arc_t, np.int32), np.asarray(arc_i, np.int32),
                np.asarray(arc_w, np.float32), fw)


def ctc_wfst_decode(
    log_probs: np.ndarray,  # [T, V+1] CTC posteriors, blank last unless given
    fst: WFST,
    blank: Optional[int] = None,
    acoustic_scale: float = 1.0,
) -> Tuple[List[int], float]:
    """Viterbi token-passing of CTC frames over the FST.

    CTC trellis on FST states: at each frame either (a) stay in the current
    FST state emitting blank or repeating the last token, or (b) traverse an
    arc emitting its ilabel. Returns (best in-graph token sequence, score).
    Vectorized per frame over all arcs (scatter-max), O(T·A).
    """
    T, V = log_probs.shape
    blank = V - 1 if blank is None else blank
    lp = log_probs.astype(np.float32) * acoustic_scale

    S, A = fst.n_states, fst.n_arcs
    # score[s]: best path ending in FST state s; last[s]: last emitted token
    # (for CTC repeat semantics); bp: backpointers (t, arc) per state
    score = np.full(S, NEG_INF, np.float32)
    score[0] = 0.0
    last = np.full(S, -1, np.int32)
    # traceback: for each (t, s) the arc taken (-1 = stay)
    take = np.full((T, S), -1, np.int32)
    prev_state = np.full((T, S), -1, np.int32)

    for t in range(T):
        stay = score + np.where(
            last >= 0,
            np.maximum(lp[t, blank], lp[t, np.maximum(last, 0)]),
            lp[t, blank],
        )
        # arc transitions: from -> to emitting ilabel
        cand = score[fst.arc_from] + lp[t, fst.arc_ilabel] + fst.arc_weight
        new_score = stay.copy()
        new_last = last.copy()
        new_take = np.full(S, -1, np.int32)
        new_prev = np.arange(S, dtype=np.int32)
        # scatter-max per destination state
        order = np.argsort(cand)  # ascending; later (larger) wins
        dst = fst.arc_to[order]
        c = cand[order]
        better = c > new_score[dst]
        # numpy scatter: last write wins = max since sorted ascending
        upd_idx = dst[better]
        new_score[upd_idx] = c[better]
        new_last[upd_idx] = fst.arc_ilabel[order][better]
        new_take[upd_idx] = order[better]
        new_prev[upd_idx] = fst.arc_from[order][better]
        take[t] = new_take
        prev_state[t] = np.where(new_take >= 0, new_prev, np.arange(S))
        score, last = new_score, new_last

    total = score + fst.final_weight
    best_s = int(np.argmax(total))
    best_score = float(total[best_s])
    if best_score <= NEG_INF / 2:
        return [], NEG_INF
    # traceback
    toks: List[int] = []
    s = best_s
    for t in range(T - 1, -1, -1):
        a = take[t, s]
        if a >= 0:
            toks.append(int(fst.arc_ilabel[a]))
        s = int(prev_state[t, s])
    toks.reverse()
    return toks, best_score


def lexicon_phrases(words: Sequence[str], vocab: Dict[str, int],
                    space_id: Optional[int] = None) -> List[List[int]]:
    """Character-lexicon helper: word strings → token-id phrases (reference
    lexicon FST building, simplified to char units)."""
    out = []
    for w in words:
        ids = []
        for i, ch in enumerate(w):
            if ch == " " and space_id is not None:
                ids.append(space_id)
            else:
                ids.append(vocab[ch])
        out.append(ids)
    return out
