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
