"""Hybrid RNNT+CTC model tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.models.asr.hybrid_models import EncDecHybridRNNTCTCModel


@pytest.fixture(scope="module")
def model():
    labels = [" "] + [chr(ord("a") + i) for i in range(26)] + ["'"]
    cfg = ConfigDict(
        sample_rate=16000, labels=labels,
        preprocessor=dict(features=32, dither=0.0),
        encoder=dict(feat_in=32, jasper=[
            dict(filters=32, repeat=1, kernel=33, stride=2, separable=True),
            dict(filters=48, repeat=1, kernel=1)]),
        decoder=dict(pred_hidden=32, pred_rnn_layers=1),
        joint=dict(joint_hidden=32),
        aux_ctc=dict(ctc_loss_weight=0.3),
    )
    return EncDecHybridRNNTCTCModel(cfg)


def test_hybrid_loss(model):
    sig = jnp.asarray(np.random.RandomState(0).randn(2, 16000).astype(np.float32) * 0.05)
    lens = jnp.array([16000, 12000], jnp.int32)
    targets = jnp.asarray(np.random.RandomState(1).randint(0, 27, (2, 5)), jnp.int32)
    tlen = jnp.array([5, 4], jnp.int32)
    rnnt_logits, enc_len = model._jit_logits(model.variables, sig, lens, targets)
    ctc_lp, enc_len2 = model._jit_ctc(model.variables, sig, lens)
    np.testing.assert_array_equal(np.asarray(enc_len), np.asarray(enc_len2))
    total, parts = model.hybrid_loss(rnnt_logits, ctc_lp, targets, enc_len, tlen)
    assert np.isfinite(float(total))
    assert abs(float(total) - (float(parts["rnnt_loss"]) + 0.3 * float(parts["ctc_loss"]))) < 1e-4


def test_hybrid_decode_both_heads(model):
    audio = [np.random.RandomState(0).randn(8000).astype(np.float32) * 0.05]
    rnnt_out = model.transcribe(audio, batch_size=1)
    model.decode_with = "ctc"
    ctc_out = model.transcribe(audio, batch_size=1)
    model.decode_with = "rnnt"
    assert isinstance(rnnt_out[0], str) and isinstance(ctc_out[0], str)
