"""WFST-constrained CTC decoding: in-graph recovery, boosting, CTC repeat
frames, loop grammars."""

import numpy as np

from nemo_tpu.ops.wfst import WFST, ctc_wfst_decode, grammar_fst, linear_fst


def _logits_for(seq, T, V, blank, strength=4.0, noise_seed=0):
    """Frame sequence: each token held 2 frames with blanks between."""
    rng = np.random.RandomState(noise_seed)
    lp = rng.randn(T, V + 1).astype(np.float32) * 0.1
    t = 0
    for tok in seq:
        lp[t, tok] += strength
        lp[t + 1, tok] += strength  # repeat frame
        t += 2
        if t < T:
            lp[t, blank] += strength
            t += 1
    for x in range(t, T):
        lp[x, blank] += strength
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    return lp


def test_decode_recovers_in_graph_sequence():
    V, blank = 6, 6
    seq = [2, 4, 1]
    lp = _logits_for(seq, 12, V, blank)
    fst = linear_fst(seq)
    toks, score = ctc_wfst_decode(lp, fst, blank=blank)
    assert toks == seq
    assert np.isfinite(score)


def test_grammar_constrains_to_closest_phrase():
    """Acoustics say [2,4,1] but grammar only allows [2,4,5] or [3,3,3]:
    decoder must pick the closer in-graph phrase."""
    V, blank = 6, 6
    lp = _logits_for([2, 4, 1], 12, V, blank)
    fst = grammar_fst([[2, 4, 5], [3, 3, 3]])
    toks, _ = ctc_wfst_decode(lp, fst, blank=blank)
    assert toks == [2, 4, 5]


def test_boost_weight_flips_winner():
    V, blank = 6, 6
    # acoustically ambiguous between [2] and [3]
    lp = np.zeros((4, V + 1), np.float32)
    lp[:, 2] += 1.0
    lp[:, 3] += 1.0 - 0.05  # token 2 acoustically better by 0.2 total
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    toks, _ = ctc_wfst_decode(lp, grammar_fst([[2], [3]]), blank=blank)
    assert toks == [2]
    toks, _ = ctc_wfst_decode(
        lp, grammar_fst([[2], [3]], weights=[0.0, 1.0]), blank=blank)
    assert toks == [3]


def test_loop_grammar_accepts_repetition():
    V, blank = 6, 6
    lp = _logits_for([2, 4, 2, 4], 16, V, blank)
    fst = grammar_fst([[2, 4]], loop=True)
    toks, _ = ctc_wfst_decode(lp, fst, blank=blank)
    assert toks == [2, 4, 2, 4]


def test_unreachable_graph_returns_empty():
    V, blank = 6, 6
    lp = _logits_for([1], 4, V, blank)
    fst = linear_fst([2, 3, 4, 5, 1])  # needs 5 arcs in 4 frames
    toks, score = ctc_wfst_decode(lp, fst, blank=blank)
    assert toks == []


def test_ctc_topology_requires_blank_between_repeats():
    """ADVICE r2: an arc repeating the previous token must only be takeable
    after a blank frame. Phrase [3, 3] over 2 frames (no room for a blank)
    must be rejected; over 3 frames with a blank in the middle it must win."""
    from nemo_tpu.ops.wfst import WFST, ctc_wfst_decode, linear_fst

    V = 5  # tokens 0..3 + blank 4
    fst = linear_fst([3, 3])

    # two frames both favouring token 3 — a valid CTC labeling of [3,3]
    # needs >= 3 frames (3, blank, 3); decoder must NOT claim [3,3]
    lp = np.full((2, V), -10.0, np.float32)
    lp[:, 3] = -0.1
    toks, score = ctc_wfst_decode(lp, fst)
    assert toks != [3, 3], (toks, score)

    # three frames: 3, blank, 3 — now [3,3] is reachable
    lp = np.full((3, V), -10.0, np.float32)
    lp[0, 3] = -0.1
    lp[1, 4] = -0.1
    lp[2, 3] = -0.1
    toks, score = ctc_wfst_decode(lp, fst)
    assert toks == [3, 3], (toks, score)
    # score must be the actual frame labeling score (3, blank, 3)
    np.testing.assert_allclose(score, -0.3, atol=1e-5)


def test_ctc_topology_distinct_tokens_need_no_blank():
    """Adjacent distinct tokens may follow each other frame-to-frame."""
    from nemo_tpu.ops.wfst import ctc_wfst_decode, linear_fst

    V = 5
    fst = linear_fst([1, 2])
    lp = np.full((2, V), -10.0, np.float32)
    lp[0, 1] = -0.2
    lp[1, 2] = -0.3
    toks, score = ctc_wfst_decode(lp, fst)
    assert toks == [1, 2]
    np.testing.assert_allclose(score, -0.5, atol=1e-5)
