"""RadTTS: flow invertibility (text-conditioned), joint training losses
decrease, inference mel shapes."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.models.tts.radtts_model import RadTTSModel, RadTTSNet


def _model():
    return RadTTSModel(ConfigDict(n_mels=12, d_text=32, n_flows=3, hidden=24,
                                  max_mel_len=64))


def test_flow_invertible_with_conditioning():
    m = _model()
    rng = np.random.RandomState(0)
    B, T = 2, 20
    mels_t = jnp.asarray(rng.randn(B, T, 12), jnp.float32)
    cond = jnp.asarray(rng.randn(B, T, 32), jnp.float32)
    mask = jnp.ones((B, T), bool)

    def fwd(net, x, c, mk):
        return net.flow_forward(x, c, mk)

    def inv(net, z, c, mk):
        return net.flow_inverse(z, c, mk)

    z, logdet = m.net.apply(m.variables, mels_t, cond, mask, method=fwd)
    back = m.net.apply(m.variables, z, cond, mask, method=inv)
    np.testing.assert_allclose(np.asarray(back), np.asarray(mels_t),
                               atol=1e-3, rtol=1e-3)
    assert np.isfinite(np.asarray(logdet)).all()


def test_radtts_trains_and_generates():
    m = _model()
    rng = np.random.RandomState(1)
    tokens = m.parse("hello world there")
    tokens = jnp.concatenate([tokens, tokens], 0)
    token_len = jnp.asarray([tokens.shape[1], tokens.shape[1] - 4], jnp.int32)
    T = 40
    mels = jnp.asarray(rng.randn(2, 12, T), jnp.float32)
    mel_len = jnp.asarray([40, 30], jnp.int32)

    tx = optax.adam(1e-3)
    v = m.variables
    opt = tx.init(v)

    @jax.jit
    def step(vars_, opt_state):
        (l, parts), g = jax.value_and_grad(
            lambda vv: m.loss(vv, tokens, token_len, mels, mel_len,
                              rng=jax.random.PRNGKey(0)),
            has_aux=True)(vars_)
        up, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(vars_, up), opt_state, l, parts

    nlls = []
    for _ in range(6):
        v, opt, l, parts = step(v, opt)
        nlls.append(float(parts["nll"]))
    assert all(np.isfinite(nlls))
    assert nlls[-1] < nlls[0]

    m.variables = v
    mel = m.generate_spectrogram(m.parse("hi"))
    assert mel.shape[0] == 1 and mel.shape[1] == 12 and mel.shape[2] >= 2
    assert np.isfinite(mel).all()
