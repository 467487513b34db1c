"""CTC segmentation tool: planted-alignment recovery, buffered log-probs
agreement, manifest writing (reference tools/ctc_segmentation)."""

import json

import numpy as np

from nemo_tpu.tools.ctc_segment import (
    Segment, buffered_log_probs, segment_long_audio, write_segment_manifest)


class _PlantedModel:
    """Tiny stand-in exposing the model surface segment_long_audio needs,
    with log-probs planted so the alignment is known exactly."""

    sample_rate = 16000
    labels = ["a", "b", " "]

    class decoding:
        blank_id = 3

    def __init__(self, lp):
        self._lp = lp  # [T, 4]

    def forward(self, signal, length):
        import jax.numpy as jnp
        T = self._lp.shape[0]
        return jnp.asarray(self._lp[None]), jnp.asarray([T])


def _planted_lp(plan, V1=4, strength=8.0):
    T = sum(n for _, n in plan)
    lp = np.zeros((T, V1), np.float32)
    t = 0
    for tok, n in plan:
        lp[t:t + n, tok] = strength
        t += n
    return lp - np.log(np.exp(lp).sum(-1, keepdims=True))


def test_recovers_planted_utterance_boundaries(tmp_path):
    # "ab" ... silence ... "ba": utterance 1 = frames [2,8), utt 2 = [12,18)
    blank = 3
    lp = _planted_lp([(blank, 2), (0, 3), (1, 3), (blank, 4),
                      (1, 3), (0, 3), (blank, 2)])
    T = lp.shape[0]
    m = _PlantedModel(lp)
    sig = np.zeros(16000, np.float32)  # 1 s → frame_secs = 1/T s
    segs = segment_long_audio(m, sig, ["ab", "ba"])
    assert len(segs) == 2
    fs = 1.0 / T
    assert abs(segs[0].start - 2 * fs) < 1e-6
    assert abs(segs[0].end - 8 * fs) < 1e-6
    assert abs(segs[1].start - 12 * fs) < 1e-6
    assert abs(segs[1].end - 18 * fs) < 1e-6
    # planted frames are near-certain
    assert segs[0].score > -0.1 and segs[1].score > -0.1

    mpath = str(tmp_path / "m.jsonl")
    n = write_segment_manifest(mpath, "/audio/a.wav", segs, min_score=-1.0)
    assert n == 2
    rows = [json.loads(l) for l in open(mpath)]
    assert rows[0]["text"] == "ab" and rows[0]["offset"] >= 0
    assert abs(rows[1]["duration"] - 6 * fs) < 2e-3

    # a bogus segment is filtered by min_score
    bogus = list(segs) + [Segment("zz", 0.0, 0.1, -50.0)]
    assert write_segment_manifest(mpath, "a.wav", bogus, min_score=-1.0) == 2


def test_buffered_log_probs_agree_with_direct():
    from nemo_tpu.models.asr.configs import quartznet_tiny
    from nemo_tpu.models.asr.ctc_models import EncDecCTCModel
    import jax.numpy as jnp

    cfg = quartznet_tiny()
    # per-utterance normalization is the one thing windowing cannot
    # reproduce (same caveat as the reference's FrameBatchASR)
    cfg.preprocessor.normalize = "none"
    m = EncDecCTCModel(cfg)
    t = np.arange(16000 * 12) / 16000.0
    sig = (0.3 * np.sin(
        2 * np.pi * (220 + 40 * np.sin(2 * np.pi * 0.3 * t)) * t)
    ).astype(np.float32)

    direct, enc_len = m.forward(jnp.asarray(sig[None]),
                                jnp.asarray([len(sig)], jnp.int32))
    direct = np.asarray(direct[0][: int(enc_len[0])])
    buf = buffered_log_probs(m, sig, chunk_secs=4.0, context_secs=1.0,
                             batch_size=2)
    # frame counts within a few frames; argmax agrees on the interior
    assert abs(buf.shape[0] - direct.shape[0]) <= 6
    n = min(buf.shape[0], direct.shape[0])
    agree = (buf[:n].argmax(-1) == direct[:n].argmax(-1)).mean()
    assert agree > 0.8, agree


def test_end_to_end_on_model(tmp_path):
    from nemo_tpu.models.asr.configs import quartznet_tiny
    from nemo_tpu.models.asr.ctc_models import EncDecCTCModel

    m = EncDecCTCModel(quartznet_tiny())
    rng = np.random.RandomState(1)
    sig = (rng.randn(2 * 16000) * 0.1).astype(np.float32)
    segs = segment_long_audio(m, sig, ["hello there", "good day"])
    assert len(segs) == 2
    assert 0.0 <= segs[0].start <= segs[0].end <= 2.1
    assert segs[0].end <= segs[1].start + 1e-6
    assert segs[1].end <= 2.1
