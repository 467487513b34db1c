"""End-to-end EncDecCTCModel tests: build → forward → transcribe → save/restore."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from nemo_tpu.models.asr.configs import quartznet_tiny
from nemo_tpu.models.asr.ctc_models import EncDecCTCModel


@pytest.fixture(scope="module")
def model():
    return EncDecCTCModel(quartznet_tiny())


def test_forward_shapes(model):
    B, T = 2, 16000
    sig = jnp.zeros((B, T), jnp.float32)
    lens = jnp.array([T, T // 2], jnp.int32)
    log_probs, enc_len = model.forward(sig, lens)
    assert log_probs.shape[0] == B
    assert log_probs.shape[2] == len(model.labels) + 1
    # subsampling x2 from stride-2 prologue
    assert int(enc_len[0]) == (T // 160 + 1 + 1) // 2
    # log-softmax normalized
    s = np.exp(np.asarray(log_probs[0, 0])).sum()
    assert abs(s - 1.0) < 1e-4


def test_transcribe_api(model):
    rng = np.random.RandomState(0)
    audio = [rng.randn(16000).astype(np.float32) * 0.05, rng.randn(8000).astype(np.float32) * 0.05]
    out = model.transcribe(audio, batch_size=2)
    assert len(out) == 2
    assert all(isinstance(t, str) for t in out)


def test_loss_decreases_shape(model):
    B, T = 2, 16000
    sig = jnp.asarray(np.random.RandomState(1).randn(B, T).astype(np.float32) * 0.05)
    lens = jnp.array([T, T], jnp.int32)
    log_probs, enc_len = model.forward(sig, lens)
    targets = jnp.asarray(np.random.RandomState(2).randint(0, 27, (B, 10)), jnp.int32)
    tlen = jnp.array([10, 7], jnp.int32)
    loss = model.loss(log_probs, enc_len, targets, tlen)
    assert np.isfinite(float(loss))


def test_save_restore_roundtrip(model, tmp_path):
    p = os.path.join(tmp_path, "model.ntpu")
    model.save_to(p)
    m2 = EncDecCTCModel.restore_from(p)
    sig = jnp.zeros((1, 16000), jnp.float32)
    lens = jnp.array([16000], jnp.int32)
    a, _ = model.forward(sig, lens)
    b, _ = m2.forward(sig, lens)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
