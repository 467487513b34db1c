"""Buffered streaming == offline transcription for causal conformers."""

import numpy as np
import pytest

import jax.numpy as jnp

from nemo_tpu.models.asr.configs import conformer_ctc
from nemo_tpu.models.asr.ctc_models import EncDecCTCModel
from nemo_tpu.models.asr.streaming import BufferedStreamingCTC


@pytest.fixture(scope="module")
def causal_model():
    cfg = conformer_ctc("small")
    cfg.encoder.n_layers = 2
    cfg.encoder.d_model = 64
    cfg.encoder.n_heads = 4
    cfg.encoder.feat_in = 32
    cfg.decoder.feat_in = 64
    cfg.preprocessor.features = 32
    cfg.preprocessor.normalize = "none"  # causal features
    cfg.preprocessor.dither = 0.0
    cfg.preprocessor.pad_to = 0
    cfg.encoder.att_context_size = (20, 0)  # limited-left causal attention
    return EncDecCTCModel(cfg)


@pytest.mark.slow
def test_streaming_matches_offline(causal_model):
    rng = np.random.RandomState(0)
    audio = (rng.randn(48000) * 0.1).astype(np.float32)
    offline = causal_model.transcribe([audio], batch_size=1)[0]

    stream = BufferedStreamingCTC(
        causal_model, chunk_secs=0.5, left_secs=2.0, lookahead_secs=0.3
    )
    pieces = []
    for i in range(0, len(audio), 8000):
        pieces.append(stream.push(audio[i : i + 8000]))
    pieces.append(stream.finish())
    assert "".join(pieces) == offline
    assert stream.text == offline


def test_streaming_incremental_output(causal_model):
    rng = np.random.RandomState(1)
    audio = (rng.randn(32000) * 0.1).astype(np.float32)
    stream = BufferedStreamingCTC(causal_model, chunk_secs=0.5, left_secs=2.0,
                                  lookahead_secs=0.3)
    outputs = [stream.push(audio[i : i + 4000]) for i in range(0, len(audio), 4000)]
    # at least one intermediate chunk must emit text before the end
    assert any(o for o in outputs[:-1])
