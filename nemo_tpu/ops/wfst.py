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
    ar = np.arange(S)
    # CTC topology: duplicate the trellis into (state, after_blank) rows
    # (standard CTC token-FST composition; reference k2 CTC topology).
    # b=1 ⇔ the most recent frame was blank (or nothing emitted yet);
    # an arc whose ilabel equals the state's last emitted token is only
    # legal from a b=1 row — blank must separate repeated tokens.
    # score[s, b]: best path; last[s, b]: last emitted token on it.
    score = np.full((S, 2), NEG_INF, np.float32)
    score[0, 1] = 0.0
    last = np.full((S, 2), -1, np.int32)
    # traceback per (t, s, b): arc taken (-1 = stay) + predecessor (s, b)
    take = np.full((T, S, 2), -1, np.int32)
    prev_state = np.full((T, S, 2), -1, np.int32)
    prev_b = np.full((T, S, 2), 0, np.int32)

    for t in range(T):
        new_score = np.full((S, 2), NEG_INF, np.float32)
        new_last = np.full((S, 2), -1, np.int32)
        new_take = np.full((S, 2), -1, np.int32)
        new_prev = np.tile(ar[:, None], (1, 2)).astype(np.int32)
        new_pb = np.zeros((S, 2), np.int32)
        # stay emitting blank: (s, *) → (s, 1)
        b_src = np.argmax(score, axis=1)
        new_score[:, 1] = score[ar, b_src] + lp[t, blank]
        new_last[:, 1] = last[ar, b_src]
        new_pb[:, 1] = b_src
        # stay repeating the current emission: (s, 0) → (s, 0) only —
        # a repeat after blank would be a new (unmatched) token
        rep_ok = last[:, 0] >= 0
        new_score[:, 0] = np.where(
            rep_ok, score[:, 0] + lp[t, np.maximum(last[:, 0], 0)], NEG_INF)
        new_last[:, 0] = last[:, 0]
        # arc transitions: from → to emitting ilabel, landing in b=0
        for b in (1, 0):
            src = score[fst.arc_from, b]
            if b == 0:
                # repeated token without intervening blank is illegal
                src = np.where(
                    fst.arc_ilabel != last[fst.arc_from, 0], src, NEG_INF)
            cand = src + lp[t, fst.arc_ilabel] + fst.arc_weight
            order = np.argsort(cand)  # ascending; later (larger) wins
            dst = fst.arc_to[order]
            c = cand[order]
            better = c > new_score[dst, 0]
            upd = dst[better]
            new_score[upd, 0] = c[better]
            new_last[upd, 0] = fst.arc_ilabel[order][better]
            new_take[upd, 0] = order[better]
            new_prev[upd, 0] = fst.arc_from[order][better]
            new_pb[upd, 0] = b
        take[t] = new_take
        prev_state[t] = new_prev
        prev_b[t] = new_pb
        score, last = new_score, new_last

    total = score + fst.final_weight[:, None]
    best_flat = int(np.argmax(total))
    best_s, best_b = best_flat // 2, best_flat % 2
    best_score = float(total[best_s, best_b])
    if best_score <= NEG_INF / 2:
        return [], NEG_INF
    # traceback
    toks: List[int] = []
    s, b = best_s, best_b
    for t in range(T - 1, -1, -1):
        a = take[t, s, b]
        if a >= 0:
            toks.append(int(fst.arc_ilabel[a]))
        s, b = int(prev_state[t, s, b]), int(prev_b[t, s, b])
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
