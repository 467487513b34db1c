"""EncDecRNNTModel end-to-end: training logits/loss + greedy transcribe."""

import numpy as np
import pytest

import jax.numpy as jnp

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.models.asr.rnnt_models import EncDecRNNTModel


@pytest.fixture(scope="module")
def model():
    labels = [" "] + [chr(ord("a") + i) for i in range(26)] + ["'"]
    cfg = ConfigDict(
        sample_rate=16000,
        labels=labels,
        preprocessor=dict(features=32, dither=0.0),
        encoder=dict(
            feat_in=32,
            jasper=[
                dict(filters=32, repeat=1, kernel=33, stride=2, separable=True, residual=False),
                dict(filters=48, repeat=1, kernel=1),
            ],
        ),
        decoder=dict(pred_hidden=32, pred_rnn_layers=1),
        joint=dict(joint_hidden=32),
    )
    return EncDecRNNTModel(cfg)


def test_rnnt_training_path(model):
    B, T = 2, 16000
    sig = jnp.asarray(np.random.RandomState(0).randn(B, T).astype(np.float32) * 0.05)
    lens = jnp.array([T, T - 4000], jnp.int32)
    targets = jnp.asarray(np.random.RandomState(1).randint(0, 27, (B, 6)), jnp.int32)
    tlen = jnp.array([6, 4], jnp.int32)
    logits, enc_len = model._jit_logits(model.variables, sig, lens, targets)
    assert logits.shape[2] == 7  # U+1
    assert logits.shape[3] == len(model.labels) + 1
    loss = model.loss(logits, targets, enc_len, tlen)
    assert np.isfinite(float(loss))


def test_rnnt_transcribe(model):
    audio = [np.random.RandomState(0).randn(8000).astype(np.float32) * 0.05]
    out = model.transcribe(audio, batch_size=1)
    assert len(out) == 1 and isinstance(out[0], str)


def test_greedy_decode_deterministic_toy():
    """Hand-crafted joint: always emits blank → empty transcripts."""
    from nemo_tpu.models.asr.modules.rnnt import rnnt_greedy_decode

    B, T, H, V = 2, 5, 4, 3  # blank id = 3

    def joint_fn(enc_t, pred_out):
        logits = jnp.full((B, V + 1), -5.0)
        return logits.at[:, V].set(5.0)  # blank wins

    def pred_step_fn(token, state):
        return jnp.zeros((B, H)), state

    state0 = ()
    enc = jnp.zeros((B, T, H))
    tokens, counts = rnnt_greedy_decode(
        joint_fn, pred_step_fn, state0, enc, jnp.array([T, T]), blank=V
    )
    assert np.asarray(counts).tolist() == [0, 0]
