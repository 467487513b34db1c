"""CTC forced alignment: recovers planted alignments; word timing API."""

import numpy as np

from nemo_tpu.tools.forced_align import TokenSpan, align_transcript, ctc_forced_align


def _planted(seq_frames, V1, blank, strength=6.0):
    """seq_frames: list of (token, n_frames) incl. blanks."""
    T = sum(n for _, n in seq_frames)
    lp = np.zeros((T, V1), np.float32)
    t = 0
    for tok, n in seq_frames:
        lp[t:t + n, tok] = strength
        t += n
    return lp - np.log(np.exp(lp).sum(-1, keepdims=True))


def test_recovers_planted_alignment():
    V1, blank = 6, 5
    plan = [(blank, 2), (1, 3), (blank, 1), (2, 2), (2, 0), (blank, 2),
            (2, 2), (blank, 1)]
    lp = _planted([p for p in plan if p[1] > 0], V1, blank)
    spans = ctc_forced_align(lp, [1, 2, 2], blank=blank)
    assert [s.token for s in spans] == [1, 2, 2]
    assert spans[0].start_frame == 2 and spans[0].end_frame == 5
    assert spans[1].start_frame == 6 and spans[1].end_frame == 8
    assert spans[2].start_frame == 10 and spans[2].end_frame == 12


def test_repeated_tokens_need_blank_between():
    V1, blank = 4, 3
    # frames: token1 x4 solid — targets [1, 1] force a split
    lp = _planted([(1, 5)], V1, blank)
    spans = ctc_forced_align(lp, [1, 1], blank=blank)
    assert [s.token for s in spans] == [1, 1]
    assert spans[0].end_frame <= spans[1].start_frame
    # one frame between them must be blank (the forced split)
    assert spans[1].start_frame - spans[0].end_frame >= 1


def test_word_level_api(tmp_path):
    from nemo_tpu.data.audio_io import write_wav
    from nemo_tpu.models.asr.configs import quartznet_tiny
    from nemo_tpu.models.asr.ctc_models import EncDecCTCModel

    m = EncDecCTCModel(quartznet_tiny())
    rng = np.random.RandomState(0)
    p = str(tmp_path / "a.wav")
    write_wav(p, (rng.randn(16000) * 0.1).astype(np.float32), 16000)
    words = align_transcript(m, p, "hello world")
    assert [w["word"] for w in words] == ["hello", "world"]
    for w in words:
        assert 0.0 <= w["start"] <= w["end"] <= 1.1
    assert words[0]["end"] <= words[1]["start"] + 1e-6
