"""CTC-WS context biasing: word spotter + transcript merge.

Reference behavior: asr/parts/context_biasing/ctc_based_word_spotter.py
and context_biasing_utils.py — a boosted trie search recovers custom
words the greedy decode fragments, without false-accepting words the
acoustics don't support.
"""

import numpy as np
import pytest

from nemo_tpu.models.asr.parts.context_biasing import (
    ContextGraph,
    boost_ctc_transcript,
    build_context_graph,
    compute_fscore,
    ctc_word_alignment,
    merge_spots_into_transcript,
    spot_words,
)

# toy BPE-ish vocab; blank = last id
PIECES = ["▁the", "▁in", "▁video", "▁nvi", "dia", "▁gpu", "x"]
BLANK = len(PIECES)
V = BLANK + 1


def frames(spec):
    """spec: list of {token_id: prob}; rest of the mass goes to blank,
    spread a floor over everything else."""
    T = len(spec)
    lp = np.full((T, V), 1e-4)
    for t, d in enumerate(spec):
        for k, v in d.items():
            lp[t, k] = v
        lp[t, BLANK] += max(0.0, 1.0 - lp[t].sum())
    lp /= lp.sum(axis=1, keepdims=True)
    return np.log(lp)


def utterance():
    # "the [nvidia] gpu" where the nvidia frames greedy-decode as
    # "in video": ▁in/▁video narrowly beat ▁nvi/dia at argmax
    return frames([
        {0: 0.90},            # ▁the
        {BLANK: 0.95},
        {1: 0.50, 3: 0.45},   # ▁in > ▁nvi
        {BLANK: 0.90},
        {2: 0.50, 4: 0.40},   # ▁video > dia
        {BLANK: 0.90},
        {5: 0.90},            # ▁gpu
        {BLANK: 0.95},
    ])


def graph():
    g = ContextGraph()
    g.add("nvidia", [[3, 4]])
    return g


def test_spotter_finds_fragmented_word():
    lp = utterance()
    spots = spot_words(lp, graph(), BLANK)
    assert len(spots) == 1
    h = spots[0]
    assert h.word == "nvidia"
    assert h.start_frame == 2 and h.end_frame == 4
    # score = logp(▁nvi) + blank + logp(dia) + 2*cb_weight — well above 0
    assert h.score > 2.0


def test_boost_replaces_greedy_fragments():
    lp = utterance()
    text, spots = boost_ctc_transcript(lp, graph(), PIECES, BLANK)
    assert text == "▁the nvidia ▁gpu".replace("▁", "")


def test_no_false_accept_without_acoustic_support():
    # same utterance, but bias a word whose tokens never score: the
    # spotter must not hallucinate it
    g = ContextGraph()
    g.add("xx", [[6, 6]])
    lp = utterance()
    text, spots = boost_ctc_transcript(lp, g, PIECES, BLANK)
    assert spots == []
    assert "xx" not in text


def test_ctc_collapse_topology_requires_blank_between_repeats():
    # word "xx" = tokens [6, 6]: two consecutive 'x' frames collapse in
    # CTC, so the spotter may only accept x . x with a blank between
    g = ContextGraph()
    g.add("xx", [[6, 6]])
    no_blank = frames([{6: 0.9}, {6: 0.9}])
    assert spot_words(no_blank, g, BLANK) == []
    with_blank = frames([{6: 0.9}, {BLANK: 0.9}, {6: 0.9}])
    spots = spot_words(with_blank, g, BLANK)
    assert [h.word for h in spots] == ["xx"]


def test_word_alignment_scores_and_spans():
    lp = utterance()
    ali = ctc_word_alignment(lp, PIECES, BLANK, token_weight=0.0)
    assert [w for w, *_ in ali] == ["the", "in", "video", "gpu"]
    assert ali[0][1] == 0 and ali[1][1] == 2
    # greedy scores are the argmax logprobs
    assert ali[0][3] == pytest.approx(lp[0, 0])


def test_filter_rejects_weak_spot():
    # keyword present in the graph but acoustically much weaker than the
    # greedy words it overlaps: alignment filtering drops it
    lp = frames([
        {0: 0.98, 3: 0.012},   # ▁the strongly beats ▁nvi
        {0: 0.98},
        {BLANK: 0.95},
    ])
    g = ContextGraph()
    g.add("nvidia", [[3, 4]])
    text, spots = boost_ctc_transcript(lp, g, PIECES, BLANK, cb_weight=1.0)
    assert "nvidia" not in text
    assert text == "the"


def test_overlap_resolution_keeps_best():
    # two biasing words sharing a prefix spotted over the same span:
    # only the better-scoring one survives
    g = ContextGraph()
    g.add("nvidia", [[3, 4]])
    g.add("nvi", [[3]])
    lp = utterance()
    spots = spot_words(lp, g, BLANK)
    assert len(spots) == 1
    assert spots[0].word == "nvidia"  # longer match accumulates more boost


def test_build_graph_and_multiword():
    enc = {"nvidia": [3, 4], "gpu": [5]}
    g = build_context_graph(["nvidia", "gpu"], lambda w: enc[w])
    lp = utterance()
    spots = spot_words(lp, g, BLANK)
    assert {h.word for h in spots} == {"nvidia", "gpu"}
    text = merge_spots_into_transcript(lp, spots, PIECES, BLANK)
    assert text == "the nvidia gpu"


def test_fscore():
    stats = compute_fscore(
        ["the nvidia gpu", "a plain sentence"],
        ["the nvidia gpu", "a nvidia sentence"],
        ["nvidia"],
    )
    assert stats["tp"] == 1 and stats["fn"] == 1 and stats["fp"] == 0
    assert stats["precision"] == 1.0 and stats["recall"] == 0.5
