"""Audio collection depth (VERDICT r2 #5): predictive / score-based /
flow-matching enhancement + the PESQ/ESTOI/SI-SDR metric suite."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu.models.audio.metrics import estoi, pesq_nb, si_sdr, stoi


def _speechlike(n, fs=8000, seed=0):
    """Synthetic voiced signal: pitch-modulated harmonics + formant-ish AM
    (enough spectro-temporal structure for STOI bands to be active)."""
    rng = np.random.RandomState(seed)
    t = np.arange(n) / fs
    f0 = 110 + 30 * np.sin(2 * np.pi * 2.5 * t)
    phase = 2 * np.pi * np.cumsum(f0) / fs
    x = sum((0.5 ** k) * np.sin((k + 1) * phase) for k in range(6))
    env = 0.55 + 0.45 * np.sin(2 * np.pi * 3.1 * t + rng.rand() * 6)
    return (x * env).astype(np.float64)


class TestMetrics:
    def test_si_sdr_exact_and_scale_invariant(self):
        x = _speechlike(8000)
        assert si_sdr(x[None], x[None])[0] > 60
        n = np.random.RandomState(0).randn(8000)
        y = x + 0.1 * n
        snr = si_sdr(y[None], x[None])[0]
        assert 5 < snr < 40
        # scale invariance: rescaling the estimate changes nothing
        assert abs(si_sdr(3.7 * y[None], x[None])[0] - snr) < 1e-6

    def test_stoi_estoi_endpoints_and_monotone_in_snr(self):
        x = _speechlike(32000, fs=10000)
        assert stoi(x, x, fs=10000) > 0.99
        assert estoi(x, x, fs=10000) > 0.99
        rng = np.random.RandomState(1)
        noise = rng.randn(len(x)) * x.std()
        vals = []
        vals_e = []
        for snr_db in (20, 5, -5):
            g = 10 ** (-snr_db / 20)
            y = x + g * noise
            vals.append(stoi(x, y, fs=10000))
            vals_e.append(estoi(x, y, fs=10000))
        assert vals[0] > vals[1] > vals[2], vals
        assert vals_e[0] > vals_e[1] > vals_e[2], vals_e
        # heavy noise is unintelligible
        assert vals_e[2] < 0.6

    def test_pesq_endpoints_monotone_level_and_delay_invariant(self):
        x = _speechlike(24000, fs=8000)
        top = pesq_nb(x, x)
        assert top > 4.2  # perfect speech ≈ 4.5 cap
        rng = np.random.RandomState(2)
        noise = rng.randn(len(x)) * x.std()
        scores = [pesq_nb(x, x + 10 ** (-s / 20) * noise)
                  for s in (30, 10, 0)]
        assert top >= scores[0] > scores[1] > scores[2], scores
        assert scores[0] > 3.5  # 30 dB SNR is near-transparent
        assert scores[2] < 1.8  # 0 dB SNR is bad
        # level alignment: a 12 dB louder degraded signal scores the same
        assert abs(pesq_nb(x, 4 * x) - top) < 0.2
        # crude time alignment absorbs a 25 ms delay
        delayed = np.concatenate([np.zeros(200), x])[: len(x)]
        assert pesq_nb(x, delayed) > 3.0


def _mix(B=2, T=4096, seed=0, snr_db=5.0):
    rng = np.random.RandomState(seed)
    clean = np.stack([_speechlike(T, seed=seed + i) for i in range(B)])
    clean /= np.abs(clean).max(axis=1, keepdims=True)
    noise = rng.randn(B, T) * 10 ** (-snr_db / 20) * clean.std(1, keepdims=True) * 3
    return (jnp.asarray(clean + noise, jnp.float32),
            jnp.asarray(clean, jnp.float32))


CFG = {"n_fft": 128, "hop": 64, "channels": 16}


def test_predictive_enhancement_trains_and_improves():
    from nemo_tpu.models.audio.generative import PredictiveEnhancementModel

    m = PredictiveEnhancementModel(CFG)
    noisy, clean = _mix()
    tx, step = m.make_train_step(lr=2e-3)
    params = m.variables
    opt = tx.init(params)
    first = None
    for i in range(150):
        params, opt, loss = step(params, opt, noisy, clean)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.7
    m.variables = params
    out = m.enhance(noisy)
    assert out.shape == noisy.shape
    base = float(np.mean(si_sdr(np.asarray(noisy), np.asarray(clean))))
    enh = float(np.mean(si_sdr(np.asarray(out), np.asarray(clean))))
    assert enh > base + 1.0, (base, enh)


@pytest.mark.parametrize("kind", ["score", "flow", "sb"])
def test_generative_enhancement_trains_and_samples(kind):
    from nemo_tpu.models.audio.generative import (
        FlowMatchingEnhancementModel, SchroedingerBridgeEnhancementModel,
        ScoreBasedEnhancementModel)

    cls = {"score": ScoreBasedEnhancementModel,
           "flow": FlowMatchingEnhancementModel,
           "sb": SchroedingerBridgeEnhancementModel}[kind]
    m = cls({**CFG, "sample_steps": 8})
    noisy, clean = _mix()
    tx, step = m.make_train_step(lr=3e-3)
    params, opt = m.variables, None
    opt = tx.init(params)
    rng = jax.random.PRNGKey(0)
    hist = []
    for i in range(250):
        rng, sub = jax.random.split(rng)
        params, opt, loss = step(params, opt, noisy, clean, sub)
        hist.append(float(loss))
    # objective is stochastic (fresh t, z per step): compare window means
    assert np.mean(hist[-25:]) < np.mean(hist[:25]) * 0.9, (
        np.mean(hist[:25]), np.mean(hist[-25:]))
    m.variables = params
    out = m.enhance(noisy)
    assert out.shape == noisy.shape
    assert np.isfinite(np.asarray(out)).all()
    # the generative sampler's output must stay anchored to the conditioner
    base = float(np.mean(si_sdr(np.asarray(noisy), np.asarray(clean))))
    enh = float(np.mean(si_sdr(np.asarray(out), np.asarray(clean))))
    assert enh > base - 3.0, (base, enh)
