"""VITS: flow invertibility, MAS durations, training steps (gen+disc),
inference waveform."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.models.tts.vits_model import VitsModel


def _model():
    return VitsModel(ConfigDict(
        n_mels=16, latent_channels=16, d_model=32, prior_layers=1, n_flows=2,
        segment_frames=8, upsample_rates=(4, 4), n_fft=64,
        upsample_initial_channel=32, sample_rate=16000))


def test_flow_invertible():
    from nemo_tpu.models.tts.modules.vits import Flow

    B, T, C = 2, 12, 16
    flow = Flow(C, n_flows=3, hidden=16)
    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(B, T, C), jnp.float32)
    mask = jnp.ones((B, T), bool)
    v = flow.init(jax.random.PRNGKey(0), z, mask)
    zp = flow.apply(v, z, mask, reverse=False)
    back = flow.apply(v, zp, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(z), atol=1e-4)


def test_mas_durations_sum():
    from nemo_tpu.models.tts.modules.vits import mas_durations

    rng = np.random.RandomState(0)
    B, T, U, C = 2, 20, 6, 8
    z_p = jnp.asarray(rng.randn(B, T, C), jnp.float32)
    m_p = jnp.asarray(rng.randn(B, U, C), jnp.float32)
    logs_p = jnp.zeros((B, U, C))
    tm = jnp.arange(U)[None] < jnp.asarray([6, 4])[:, None]
    mm = jnp.arange(T)[None] < jnp.asarray([20, 14])[:, None]
    dur = np.asarray(mas_durations(z_p, m_p, logs_p, tm, mm))
    assert dur[0].sum() == 20 and dur[1].sum() == 14
    assert (dur[1, 4:] == 0).all()


@pytest.mark.slow
def test_vits_train_steps_and_infer():
    m = _model()
    gen_step, disc_step, g_state, d_state = m.make_train_steps()
    rng = np.random.RandomState(0)
    B, U = 2, 10
    tokens = jnp.asarray(rng.randint(1, 30, (B, U)), jnp.int32)
    token_len = jnp.asarray([10, 7], jnp.int32)
    hop = m.net.hop
    T = 32
    audio = jnp.asarray(rng.randn(B, T * hop) * 0.1, jnp.float32)
    spec, flens = m._mel(audio, jnp.asarray([T * hop] * B, jnp.int32))
    spec = spec[:, :, :T]
    mel_len = jnp.asarray([T, 24], jnp.int32)

    d_state, d_loss = disc_step(d_state, g_state["params"], tokens, token_len,
                                spec, mel_len, audio, jax.random.PRNGKey(0))
    g_state, g_loss, parts = gen_step(g_state, d_state["params"], tokens,
                                      token_len, spec, mel_len, audio,
                                      jax.random.PRNGKey(1))
    assert np.isfinite(float(d_loss)) and np.isfinite(float(g_loss))
    for k in ("mel", "kl", "dur", "adv", "fm"):
        assert np.isfinite(float(parts[k])), k

    # a couple more alternating steps run stably
    for i in range(2):
        d_state, d_loss = disc_step(d_state, g_state["params"], tokens,
                                    token_len, spec, mel_len, audio,
                                    jax.random.PRNGKey(2 + i))
        g_state, g_loss, parts = gen_step(g_state, d_state["params"], tokens,
                                          token_len, spec, mel_len, audio,
                                          jax.random.PRNGKey(10 + i))
    assert np.isfinite(float(g_loss))

    m.variables = g_state["params"]
    wav = m.convert_text_to_waveform(m.parse("hello"), max_frames=40)
    assert wav.ndim == 2 and wav.shape[1] > 0
    assert np.isfinite(wav).all()
