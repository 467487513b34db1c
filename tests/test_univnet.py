"""UnivNet LVC vocoder: LVC correctness, generation shapes, GAN steps."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.models.tts.modules.univnet import location_variable_conv
from nemo_tpu.models.tts.univnet_model import UnivNetModel


def test_lvc_matches_per_frame_conv():
    rng = np.random.RandomState(0)
    B, F, hop, K, Ci, Co = 2, 3, 4, 3, 2, 5
    T = F * hop
    x = rng.randn(B, T, Ci).astype(np.float32)
    kern = rng.randn(B, F, K, Ci, Co).astype(np.float32)
    bias = rng.randn(B, F, Co).astype(np.float32)
    got = np.asarray(location_variable_conv(
        jnp.asarray(x), jnp.asarray(kern), jnp.asarray(bias), hop))
    pad = (K - 1) // 2
    xp = np.pad(x, ((0, 0), (pad, K - 1 - pad), (0, 0)))
    ref = np.zeros((B, T, Co), np.float32)
    for b in range(B):
        for t in range(T):
            f = t // hop
            acc = bias[b, f].copy()
            for k in range(K):
                acc += xp[b, t + k] @ kern[b, f, k]
            ref[b, t] = acc
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_univnet_generate_shape():
    m = UnivNetModel(ConfigDict(n_mels=16, channels=8, noise_dim=8,
                                upsamples=(4, 4)))
    mel = jnp.asarray(np.random.RandomState(0).randn(2, 16, 6), jnp.float32)
    audio = m.convert_spectrogram_to_audio(mel)
    assert audio.shape == (2, 6 * 16)
    assert np.isfinite(np.asarray(audio)).all()


@pytest.mark.slow
def test_univnet_gan_steps():
    m = UnivNetModel(ConfigDict(n_mels=16, channels=8, noise_dim=8,
                                upsamples=(4, 4)))
    gen_step, disc_step, g_state, d_state = m.make_train_steps()
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(2, 16, 6), jnp.float32)
    audio = jnp.asarray(rng.randn(2, 96) * 0.1, jnp.float32)
    d_state, d_loss = disc_step(d_state, g_state["params"], mel, audio,
                                jax.random.PRNGKey(0))
    g_state, g_loss, parts = gen_step(g_state, d_state["params"], mel, audio,
                                      jax.random.PRNGKey(1))
    assert np.isfinite(float(d_loss)) and np.isfinite(float(g_loss))
    for k in ("adv", "fm", "l1"):
        assert np.isfinite(float(parts[k]))
