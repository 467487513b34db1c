

def test_binarize_speech_probs():
    from nemo_tpu.models.asr.vad_models import binarize_speech_probs

    # probs: rise, dip briefly (hysteresis holds), fall, blip (too short)
    probs = [0.1, 0.6, 0.7, 0.4, 0.6, 0.1, 0.1, 0.9, 0.1, 0.1]
    segs = binarize_speech_probs(
        probs, frame_shift=0.1, onset=0.5, offset=0.3,
        min_duration_on=0.25, min_duration_off=0.15)
    # one segment [0.1s..0.5s]; the single-frame blip at 0.7 is dropped
    assert len(segs) == 1
    assert segs[0]["start"] == 0.1 and abs(segs[0]["end"] - 0.5) < 1e-9
    # hysteresis: the dip to 0.4 (>= offset) did not close the segment

    # gap bridging: two bursts with a short gap merge
    probs = [0.9, 0.9, 0.1, 0.9, 0.9]
    segs = binarize_speech_probs(
        probs, frame_shift=0.1, onset=0.5, offset=0.3,
        min_duration_on=0.0, min_duration_off=0.25)
    assert len(segs) == 1

    # padding
    segs = binarize_speech_probs(
        [0.9, 0.9, 0.0], frame_shift=0.1, onset=0.5, offset=0.3,
        min_duration_on=0.0, min_duration_off=0.0,
        pad_onset=0.05, pad_offset=0.05)
    assert segs[0]["start"] == 0.0 and abs(segs[0]["end"] - 0.25) < 1e-9
