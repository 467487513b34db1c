"""TTS tests: length regulator, FastPitch synthesis, HiFi-GAN vocoder + GAN step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.models.tts.fastpitch_model import FastPitchModel
from nemo_tpu.models.tts.hifigan_model import HifiGanModel
from nemo_tpu.models.tts.modules.fastpitch import regulate_length


def test_regulate_length():
    dur = jnp.array([[2, 1, 3], [1, 0, 1]], jnp.int32)
    enc = jnp.arange(6, dtype=jnp.float32).reshape(2, 3, 1) + 1  # symbols 1..6
    out, mel_len = regulate_length(dur, enc, max_mel_len=8)
    np.testing.assert_array_equal(np.asarray(mel_len), [6, 2])
    np.testing.assert_array_equal(
        np.asarray(out)[0, :, 0], [1, 1, 2, 3, 3, 3, 0, 0]
    )
    np.testing.assert_array_equal(np.asarray(out)[1, :, 0], [4, 6, 0, 0, 0, 0, 0, 0])


@pytest.fixture(scope="module")
def fastpitch():
    cfg = ConfigDict(d_model=64, n_heads=2, d_ff=128, enc_layers=1, dec_layers=1, max_mel_len=256)
    return FastPitchModel(cfg)


def test_fastpitch_synthesis(fastpitch):
    tokens = fastpitch.parse("hello world")
    mel = fastpitch.generate_spectrogram(tokens)
    assert mel.shape[0] == 1 and mel.shape[1] == 80
    assert mel.shape[2] > 0
    assert np.isfinite(np.asarray(mel)).all()


def test_fastpitch_duration_clamp():
    """Inference durations are clamped to [min_token_duration, max_token_duration]
    (reference tts/modules/fastpitch.py:84,172-198,304)."""
    cfg = ConfigDict(d_model=32, n_heads=2, d_ff=64, enc_layers=1, dec_layers=1,
                     max_mel_len=128, max_token_duration=5)
    m = FastPitchModel(cfg)
    # bias the duration predictor sky-high: exp(10)-1 >> 5 must clamp to 5
    v = jax.tree_util.tree_map(lambda x: x, m.variables)
    v["params"]["duration_predictor"]["fc"]["bias"] = jnp.array([10.0], jnp.float32)
    m.variables = v
    tokens = m.parse("hello world")
    out = m.net.apply(m.variables, tokens,
                      jnp.array([tokens.shape[1]], jnp.int32), train=False)
    dur = np.asarray(out["durations"])
    assert dur.max() == 5 and dur.min() == 5
    # min clamp: bias very low → exp(-10)-1 < 0 clamps to min (0) → 0 frames
    v["params"]["duration_predictor"]["fc"]["bias"] = jnp.array([-10.0], jnp.float32)
    m.variables = v
    out = m.net.apply(m.variables, tokens,
                      jnp.array([tokens.shape[1]], jnp.int32), train=False)
    assert np.asarray(out["durations"]).max() == 0


def test_fastpitch_trained_synthesis_nonzero():
    """After brief training, synthesis emits a realistic frame count per token
    (the round-3 regression: fresh models emitted 0 frames and the bench
    silently reported 0.0)."""
    cfg = ConfigDict(d_model=32, n_heads=2, d_ff=64, enc_layers=1, dec_layers=1,
                     max_mel_len=256)
    m = FastPitchModel(cfg)
    m.fit_synthetic(steps=25, batch=4, seq=24)
    tokens = m.parse("hello world")
    mel = m.generate_spectrogram(tokens)
    U = tokens.shape[1]
    assert mel.shape[2] >= U, f"trained model emitted too few frames: {mel.shape}"
    assert mel.shape[2] <= 10 * U
    assert np.isfinite(np.asarray(mel)).all()


def test_fastpitch_pace(fastpitch):
    tokens = fastpitch.parse("hello hello hello")
    fast = fastpitch.generate_spectrogram(tokens, pace=2.0)
    slow = fastpitch.generate_spectrogram(tokens, pace=0.5)
    assert slow.shape[2] >= fast.shape[2]


@pytest.fixture(scope="module")
def hifigan():
    cfg = ConfigDict(generator=dict(upsample_rates=[8, 2], upsample_kernel_sizes=[16, 4],
                                    upsample_initial_channel=32))
    return HifiGanModel(cfg)


def test_hifigan_vocoder(hifigan):
    mel = jnp.asarray(np.random.RandomState(0).randn(2, 80, 20).astype(np.float32))
    audio = hifigan.convert_spectrogram_to_audio(mel)
    assert audio.shape == (2, 20 * 16)  # hop = 8*2
    assert np.abs(np.asarray(audio)).max() <= 1.0


@pytest.mark.slow
def test_hifigan_gan_steps(hifigan):
    from nemo_tpu.ops.audio import mel_spectrogram

    state = hifigan.init_train()
    disc_step, gen_step = hifigan.train_step_fns()
    hop = hifigan.hop_length
    rng = np.random.RandomState(0)
    n_audio = 8 * 256  # 8 mel frames at the mel hop
    audio_full = jnp.asarray(rng.randn(1, n_audio).astype(np.float32) * 0.1)
    mel, _ = mel_spectrogram(audio_full, jnp.array([n_audio]), hifigan.mel_cfg)
    T = 8
    mel = mel[:, :, :T]
    # align real audio to the generator hop (16) for the discriminators
    audio = audio_full[:, : T * hop]
    state, d_loss = disc_step(state, mel, audio)
    state, g_loss = gen_step(state, mel, audio)
    assert np.isfinite(float(d_loss)) and np.isfinite(float(g_loss))


def test_e2e_text_to_audio(fastpitch, hifigan):
    tokens = fastpitch.parse("test")
    mel = fastpitch.generate_spectrogram(tokens)
    audio = hifigan.convert_spectrogram_to_audio(mel)
    assert audio.shape[1] == mel.shape[2] * hifigan.hop_length
