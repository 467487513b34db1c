"""Magpie codec-LM TTS: AR+NAR training loss decreases; code generation in
range; synthesize through the audio codec."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.models.tts.magpie_model import MagpieTTSModel


def _model(codec=None):
    return MagpieTTSModel(ConfigDict(text_vocab=32, codebook_size=64,
                                     num_levels=3), codec=codec)


def test_magpie_train_loss_decreases():
    m = _model()
    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randint(0, 32, (2, 6)), jnp.int32)
    codes = jnp.asarray(rng.randint(0, 64, (2, 3, 12)), jnp.int32)
    tx = optax.adam(2e-3)
    v = m.variables
    opt = tx.init(v)

    @jax.jit
    def step(vars_, opt_state):
        l, g = jax.value_and_grad(
            lambda vv: m.train_loss(vv, text, codes))(vars_)
        up, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(vars_, up), opt_state, l

    losses = []
    for _ in range(6):
        v, opt, l = step(v, opt)
        losses.append(float(l))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    m.variables = v
    out = m.generate_codes(text, n_frames=5, rng=jax.random.PRNGKey(0))
    assert out.shape == (2, 3, 5)
    assert (out >= 0).all() and (out < 64).all()


@pytest.mark.slow
def test_magpie_synthesize_through_codec():
    from nemo_tpu.models.tts.audio_codec_model import AudioCodecModel

    codec = AudioCodecModel(ConfigDict(latent_dim=32, num_levels=3,
                                       codebook_size=64))
    m = _model(codec=codec)
    text = jnp.asarray(np.random.RandomState(0).randint(0, 32, (1, 4)), jnp.int32)
    wav = m.synthesize(text, n_frames=6)
    assert wav.ndim == 2 and wav.shape[0] == 1 and wav.shape[1] > 0
    assert np.isfinite(wav).all()
