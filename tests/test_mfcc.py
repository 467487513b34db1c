"""MFCC frontend (reference AudioToMFCCPreprocessor,
audio_preprocessing.py:307 — torchaudio MFCC(log_mels=True): DCT-II ortho
over log-mel)."""

import numpy as np
import scipy.fftpack

import jax.numpy as jnp

from nemo_tpu.ops.audio import (
    MelSpectrogramConfig, dct_matrix, mel_seq_len, mel_spectrogram, mfcc,
)


def test_dct_matrix_matches_scipy_ortho():
    basis = dct_matrix(13, 64)  # [64, 13]
    x = np.random.RandomState(0).randn(5, 64).astype(np.float32)
    ours = x @ basis
    ref = scipy.fftpack.dct(x, type=2, norm="ortho", axis=-1)[:, :13]
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_mfcc_is_dct_of_logmel():
    rng = np.random.RandomState(1)
    B, T = 2, 16000
    sig = jnp.asarray(rng.randn(B, T).astype(np.float32) * 0.1)
    lens = jnp.asarray([T, T // 2])
    cfg = MelSpectrogramConfig(features=64, pad_to=1)
    out, out_len = mfcc(sig, lens, cfg, n_mfcc=13)
    assert out.shape[1] == 13
    np.testing.assert_array_equal(np.asarray(out_len),
                                  np.asarray(mel_seq_len(cfg, lens)))
    # compose independently: our mel (torch-parity-tested) → scipy DCT
    import dataclasses
    mcfg = dataclasses.replace(cfg, log=True, log_zero_guard_type="add",
                               log_zero_guard_value=1e-6, normalize="none",
                               preemph=None)
    mel, _ = mel_spectrogram(sig, lens, mcfg)
    ref = scipy.fftpack.dct(np.asarray(mel), type=2, norm="ortho",
                            axis=1)[:, :13]
    F = np.asarray(out_len)
    for b in range(B):
        np.testing.assert_allclose(np.asarray(out)[b, :, :F[b]],
                                   ref[b, :, :F[b]], atol=1e-3)
    # padded frames are zeroed
    assert float(np.abs(np.asarray(out)[1, :, F[1]:]).max()) == 0.0
