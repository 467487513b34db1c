"""DER metric (exactness on constructed cases) + multispeaker simulator."""

import numpy as np

from nemo_tpu.models.asr.metrics import diarization_error_rate
from nemo_tpu.tools.speech_simulator import (
    SimulatorConfig,
    segments_to_rttm,
    simulate_session,
)


def test_der_perfect_zero():
    ref = [{"speaker": 0, "start": 0.0, "end": 1.0},
           {"speaker": 1, "start": 1.0, "end": 2.0}]
    out = diarization_error_rate(ref, ref)
    assert out["der"] == 0.0


def test_der_label_permutation_is_free():
    ref = [{"speaker": 0, "start": 0.0, "end": 1.0},
           {"speaker": 1, "start": 1.0, "end": 2.0}]
    hyp = [{"speaker": "B", "start": 0.0, "end": 1.0},
           {"speaker": "A", "start": 1.0, "end": 2.0}]
    assert diarization_error_rate(ref, hyp)["der"] == 0.0


def test_der_components():
    ref = [{"speaker": 0, "start": 0.0, "end": 2.0}]
    # hyp misses second half, adds false alarm 2-3s
    hyp = [{"speaker": 0, "start": 0.0, "end": 1.0},
           {"speaker": 0, "start": 2.0, "end": 3.0}]
    out = diarization_error_rate(ref, hyp)
    assert abs(out["miss"] - 0.5) < 0.02
    assert abs(out["false_alarm"] - 0.5) < 0.02
    assert out["confusion"] == 0.0
    # speaker swap in second half → confusion
    ref2 = [{"speaker": 0, "start": 0.0, "end": 1.0},
            {"speaker": 1, "start": 1.0, "end": 2.0}]
    hyp2 = [{"speaker": 0, "start": 0.0, "end": 2.0}]
    out2 = diarization_error_rate(ref2, hyp2)
    assert abs(out2["confusion"] - 0.5) < 0.02


def test_simulator_session_and_rttm():
    rng = np.random.RandomState(0)
    srcs = {0: rng.randn(16000 * 30).astype(np.float32) * 0.1,
            1: rng.randn(16000 * 30).astype(np.float32) * 0.1}
    cfg = SimulatorConfig(session_secs=10.0, seed=3)
    audio, segs = simulate_session(srcs, cfg)
    assert audio.shape == (160000,)
    assert np.abs(audio).max() <= 1.0
    assert len(segs) >= 3
    spk = {s["speaker"] for s in segs}
    assert spk == {0, 1}
    for s in segs:
        assert 0 <= s["start"] < s["end"] <= 10.0 + 1e-6
    # starts are sorted
    starts = [s["start"] for s in segs]
    assert starts == sorted(starts)
    rttm = segments_to_rttm(segs)
    assert rttm.count("SPEAKER") == len(segs)
    # simulated truth scores DER 0 against itself
    assert diarization_error_rate(segs, segs)["der"] == 0.0
