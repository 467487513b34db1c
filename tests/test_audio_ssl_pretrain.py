"""Audio SSL pretraining: masked-patch reconstruction on the shared
SpectralUNet (reference nemo/collections/audio SSL pretraining +
ssl_pretrain_masking)."""

import numpy as np

import jax

from nemo_tpu.models.audio.ssl_pretrain import SSLPretrainModel


def _tones(B, T, fs=16000, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(T) / fs
    f = 200 + 400 * rng.rand(B, 1)
    x = np.sin(2 * np.pi * f * t[None]) * (0.5 + 0.5 * rng.rand(B, 1))
    return (x + 0.01 * rng.randn(B, T)).astype(np.float32)


def test_ssl_pretrain_reconstructs_masked_patches():
    m = SSLPretrainModel({"n_fft": 256, "hop": 64, "channels": 8,
                          "patch_size": 4, "mask_fraction": 0.5})
    B, T = 4, 4096
    audio = _tones(B, T)
    lengths = np.full(B, T, np.int32)

    before = m.masked_reconstruction_error(audio, lengths)
    tx, step = m.make_train_step(lr=2e-3)
    params = m.variables
    ost = tx.init(params)
    rng = jax.random.PRNGKey(0)
    for i in range(40):
        rng, k = jax.random.split(rng)
        params, ost, loss = step(params, ost, audio, lengths, k)
    m.variables = params
    after = m.masked_reconstruction_error(audio, lengths)
    # the net learns to inpaint hidden patches of tonal audio (~25%
    # error drop in 40 short steps; full pretraining runs much longer)
    assert after < 0.85 * before, (before, after)
    assert np.isfinite(float(loss))

    # the pretrained trunk is shape-compatible with the enhancement nets
    trunk = m.pretrained_trunk()
    from nemo_tpu.models.audio.generative import PredictiveEnhancementModel

    enh = PredictiveEnhancementModel({"n_fft": 256, "hop": 64,
                                      "channels": 8})
    ts = jax.tree_util.tree_structure(enh.variables)
    assert ts == jax.tree_util.tree_structure(trunk)
    enh.variables = trunk  # warm start
    out = enh.enhance(jax.numpy.asarray(audio))
    assert out.shape == (B, T)
