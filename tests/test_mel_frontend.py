"""Numerical parity tests for the mel frontend against a torch.stft
reference computation (the semantics of the reference FilterbankFeatures,
features.py:246 — re-derived here independently, not imported)."""

import numpy as np
import pytest

import jax.numpy as jnp

from nemo_tpu.ops.audio import (
    MelSpectrogramConfig,
    hann_window,
    mel_filterbank,
    mel_seq_len,
    mel_spectrogram,
)


def torch_reference_mel(sig, length, cfg: MelSpectrogramConfig):
    """Reference semantics computed with torch ops (CPU)."""
    import torch

    x = torch.tensor(sig, dtype=torch.float32)
    if cfg.preemph is not None:
        x = torch.cat([x[:, :1], x[:, 1:] - cfg.preemph * x[:, :-1]], dim=1)
    window = torch.tensor(hann_window(cfg.win_length, periodic=False))
    stft = torch.stft(
        x,
        n_fft=cfg.fft_length,
        hop_length=cfg.hop_length,
        win_length=cfg.win_length,
        window=window,
        center=True,
        return_complex=True,
    )
    power = stft.abs() ** cfg.mag_power  # [B, n_freq, F]
    fb = torch.tensor(mel_filterbank(cfg.sample_rate, cfg.fft_length, cfg.features))
    mel = torch.matmul(fb, power)  # [B, n_mels, F]
    mel = torch.log(mel + cfg.log_zero_guard_value)

    out_len = (length + 2 * (cfg.fft_length // 2) - cfg.fft_length) // cfg.hop_length + 1
    # per-feature normalization over valid frames (unbiased std)
    out = torch.zeros_like(mel)
    for b in range(mel.shape[0]):
        valid = mel[b, :, : out_len[b]]
        mean = valid.mean(dim=1, keepdim=True)
        std = valid.std(dim=1, keepdim=True)
        out[b, :, : out_len[b]] = (valid - mean) / (std + 1e-5)
    F = mel.shape[2]
    rem = (-F) % cfg.pad_to
    if rem:
        out = torch.nn.functional.pad(out, (0, rem))
    return out.numpy(), out_len


@pytest.mark.parametrize("n_mels", [64, 80])
def test_mel_parity_vs_torch(n_mels):
    rng = np.random.RandomState(0)
    B, T = 2, 16000
    sig = rng.randn(B, T).astype(np.float32) * 0.1
    length = np.array([T, T - 3777], dtype=np.int32)
    cfg = MelSpectrogramConfig(features=n_mels, dither=0.0)

    ours, our_len = mel_spectrogram(jnp.asarray(sig), jnp.asarray(length), cfg)
    ref, ref_len = torch_reference_mel(sig, length, cfg)

    np.testing.assert_array_equal(np.asarray(our_len), ref_len)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-3, rtol=1e-3)


def test_seq_len_formula():
    cfg = MelSpectrogramConfig()
    lens = jnp.array([16000, 8000, 159, 512])
    out = mel_seq_len(cfg, lens)
    # floor(len/hop) + 1 for center=True with even n_fft
    np.testing.assert_array_equal(np.asarray(out), np.asarray(lens) // cfg.hop_length + 1)


def test_pad_to_multiple():
    cfg = MelSpectrogramConfig()
    sig = jnp.zeros((1, 16000), jnp.float32)
    mel, _ = mel_spectrogram(sig, jnp.array([16000]), cfg)
    assert mel.shape[2] % cfg.pad_to == 0


def test_filterbank_matches_slaney_shape():
    fb = mel_filterbank(16000, 512, 80)
    assert fb.shape == (80, 257)
    # every filter has nonzero area, rows sum positive
    assert (fb.sum(axis=1) > 0).all()
