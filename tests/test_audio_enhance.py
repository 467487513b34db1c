"""STFT/ISTFT round-trip + enhancement model tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu.models.audio import MaskingEnhancementModel
from nemo_tpu.ops.stft import istft, si_snr, stft


def test_stft_istft_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 4000).astype(np.float32))
    re, im = stft(x, 512, 128)
    y = istft(re, im, 512, 128, length=4000)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-3)


def test_si_snr():
    rng = np.random.RandomState(0)
    t = jnp.asarray(rng.randn(2, 1000).astype(np.float32))
    assert float(si_snr(t, t).min()) > 60  # perfect estimate
    assert float(si_snr(2.0 * t, t).min()) > 60  # scale invariant
    noisy = t + 0.5 * jnp.asarray(rng.randn(2, 1000).astype(np.float32))
    assert float(si_snr(noisy, t).max()) < 20


def test_enhancement_training_improves_sisnr():
    rng = np.random.RandomState(0)
    t = np.arange(4000) / 16000.0
    clean = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None].repeat(2, 0)
    noise = (0.3 * rng.randn(2, 4000)).astype(np.float32)
    noisy = jnp.asarray(clean + noise)
    clean = jnp.asarray(clean)

    model = MaskingEnhancementModel({"channels": 16, "n_layers": 2})
    tx, step = model.make_train_step(lr=3e-3)
    params = model.variables
    opt = tx.init(params)
    first = None
    for i in range(15):
        params, opt, loss = step(params, opt, noisy, clean)
        if first is None:
            first = float(loss)
    assert float(loss) < first  # SI-SNR improved (loss = -si_snr)
    model.variables = params
    out = model.enhance(noisy)
    assert out.shape == noisy.shape
    assert float(si_snr(out, clean).mean()) > float(si_snr(noisy, clean).mean())
