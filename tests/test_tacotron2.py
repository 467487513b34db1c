"""Tacotron2: teacher-forced training step decreases loss; autoregressive
inference emits mel and stops via gate."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.models.tts.tacotron2_model import Tacotron2Model


def _model():
    return Tacotron2Model(ConfigDict(n_mels=16, d_model=64))


@pytest.mark.slow
def test_teacher_forced_shapes_and_training():
    m = _model()
    rng = np.random.RandomState(0)
    tokens = m.parse("hello world")
    tokens = jnp.concatenate([tokens, tokens], 0)
    token_len = jnp.asarray([tokens.shape[1]] * 2, jnp.int32)
    T = 24
    mels = jnp.asarray(rng.randn(2, 16, T), jnp.float32)
    mel_len = jnp.asarray([24, 18], jnp.int32)

    step_fn, opt = m.make_train_step(lr=2e-3)
    v = m.variables
    losses = []
    for i in range(4):
        v, opt, total, parts = step_fn(v, opt, tokens, token_len, mels,
                                       mel_len, jax.random.PRNGKey(i))
        losses.append(float(total))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_inference_stops_and_shapes():
    m = _model()
    tokens = m.parse("hi")
    mel = m.generate_spectrogram(tokens, max_steps=40)
    assert mel.shape[0] == 1 and mel.shape[1] == 16
    assert 1 <= mel.shape[2] <= 40
