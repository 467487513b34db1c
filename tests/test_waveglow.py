"""WaveGlow: flow invertibility, NLL training decreases, inference shapes."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.models.tts.waveglow_model import WaveGlowModel, WaveGlowNet


def _model():
    return WaveGlowModel(ConfigDict(n_mels=8, n_group=4, n_flows=3,
                                    hidden=16, hop=16))


def test_flow_invertible():
    m = _model()
    rng = np.random.RandomState(0)
    B, T, F = 2, 64, 4
    audio = jnp.asarray(rng.randn(B, T) * 0.3, jnp.float32)
    mel = jnp.asarray(rng.randn(B, 8, F), jnp.float32)
    z, logdet = m.net.apply(m.variables, audio, mel)
    assert np.isfinite(np.asarray(logdet)).all()

    # invert: run infer's inverse ops on z manually via method
    def inverse(net, z, mel):
        Tg = z.shape[1]
        mel_up = net._upsample_mel(mel, Tg)
        x = z
        for inv, ac in zip(reversed(net.convs), reversed(net.couplings)):
            x, _ = ac(x, mel_up, reverse=True)
            x, _ = inv(x, reverse=True)
        return x.reshape(z.shape[0], -1)

    back = m.net.apply(m.variables, z, mel, method=inverse)
    np.testing.assert_allclose(np.asarray(back), np.asarray(audio),
                               atol=1e-3, rtol=1e-3)


def test_nll_trains():
    m = _model()
    rng = np.random.RandomState(1)
    audio = jnp.asarray(rng.randn(2, 64) * 0.3, jnp.float32)
    mel = jnp.asarray(rng.randn(2, 8, 4), jnp.float32)
    tx = optax.adam(1e-3)
    v = m.variables
    opt = tx.init(v)

    @jax.jit
    def step(vars_, opt_state):
        l, g = jax.value_and_grad(lambda vv: m.nll(vv, audio, mel))(vars_)
        up, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(vars_, up), opt_state, l

    losses = []
    for _ in range(6):
        v, opt, l = step(v, opt)
        losses.append(float(l))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_infer_shape():
    m = _model()
    mel = jnp.asarray(np.random.RandomState(0).randn(1, 8, 4), jnp.float32)
    wav = m.convert_spectrogram_to_audio(mel)
    assert np.asarray(wav).shape == (1, 64)  # F*hop = 4*16
    assert np.isfinite(np.asarray(wav)).all()
