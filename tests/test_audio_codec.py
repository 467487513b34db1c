"""AudioCodec (RVQ neural codec) tests (reference: tts/models/audio_codec.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.models.tts.audio_codec_model import AudioCodecModel

TINY = ConfigDict(dict(base_channels=8, strides=(2, 4), latent_dim=16,
                       num_levels=3, codebook_size=32, sample_rate=16000))


def test_encode_decode_shapes():
    m = AudioCodecModel(TINY)
    T = 8 * m.frame_rate
    audio = jnp.asarray(np.random.RandomState(0).randn(2, T) * 0.1, jnp.float32)
    codes = m.encode(audio)
    assert codes.shape == (2, 3, 8)  # [B, levels, frames]
    assert codes.dtype in (jnp.int32, jnp.int64)
    assert (np.asarray(codes) >= 0).all() and (np.asarray(codes) < 32).all()
    recon = m.decode(codes)
    assert recon.shape == (2, T)
    assert np.isfinite(np.asarray(recon)).all()


def test_rvq_residual_improves_with_levels():
    """More RVQ levels → lower quantization error (the residual property)."""
    from nemo_tpu.models.tts.modules.codec import ResidualVectorQuantizer

    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(1, 64, 16), jnp.float32)
    errs = []
    for L in (1, 2, 4):
        rvq = ResidualVectorQuantizer(num_levels=L, codebook_size=64, dim=16)
        v = rvq.init(jax.random.PRNGKey(0), z)
        out, codes, _ = rvq.apply(v, z)
        # reconstruct from codes alone
        q = rvq.apply(v, codes, method=ResidualVectorQuantizer.decode_codes)
        errs.append(float(jnp.mean(jnp.square(q - z))))
        assert codes.shape == (1, L, 64)
    assert errs[2] < errs[1] < errs[0]


@pytest.mark.slow
def test_codec_training_reduces_recon_loss():
    m = AudioCodecModel(TINY)
    state = m.init_train(lr=1e-3)
    gen_step, disc_step = m.train_step_fns(use_disc=False, mel_weight=2.0)
    rng = np.random.RandomState(0)
    t = np.linspace(0, 1, 4 * m.frame_rate)
    audio = jnp.asarray(np.stack([np.sin(2 * np.pi * 220 * t),
                                  np.sin(2 * np.pi * 440 * t)]) * 0.5, jnp.float32)
    losses = []
    for i in range(8):
        state, loss = gen_step(state, audio)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_codec_adversarial_steps_run():
    m = AudioCodecModel(TINY)
    state = m.init_train(lr=1e-4)
    gen_step, disc_step = m.train_step_fns(use_disc=True)
    audio = jnp.asarray(
        np.random.RandomState(0).randn(1, 4 * m.frame_rate) * 0.3, jnp.float32)
    state, dl = disc_step(state, audio)
    state, gl = gen_step(state, audio)
    assert np.isfinite(float(dl)) and np.isfinite(float(gl))
