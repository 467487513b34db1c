"""Host-side (numpy) mel frontend — the CPU feature-extraction offload.

Reference parity: the DALI pipeline (`asr/data/audio_to_text_dali.py`)
which moves feature extraction off the accelerator's critical path.
On TPU serving, shipping bf16 normalized log-mels instead of int16 PCM
halves host→device bytes (80 mels × 100 fps × 2 B = 16 KB/s vs 32 KB/s)
and removes the frontend from device time; numerics match the device
mel (`ops/audio.mel_spectrogram`) to fp32 rounding — verified by
tests/test_host_mel.py (bit-comparable on the CPU backend; vs the TPU
MXU matmul-DFT the max abs difference measured is ~2e-4 on normalized
mels, i.e. both are fp32-rounding-level realizations of the same math).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from nemo_tpu.ops.audio import MelSpectrogramConfig, hann_window, mel_filterbank

CONSTANT = 1e-5  # matches ops/audio.py normalization epsilon


def _window_padded(cfg: MelSpectrogramConfig) -> np.ndarray:
    w = np.zeros(cfg.fft_length, np.float64)
    win = hann_window(cfg.win_length, periodic=False)
    off = (cfg.fft_length - cfg.win_length) // 2
    w[off : off + cfg.win_length] = win
    return w


def host_mel(
    signal: np.ndarray,
    length: np.ndarray,
    cfg: MelSpectrogramConfig = MelSpectrogramConfig(),
    out_dtype=np.float32,
) -> Tuple[np.ndarray, np.ndarray]:
    """[B, T] float32 audio, [B] sample lens → ([B, n_mels, F] out_dtype,
    [B] frame lens). Mirrors ops/audio.mel_spectrogram with training=False."""
    x = np.asarray(signal, np.float32)
    B, T = x.shape
    n_fft, hop = cfg.fft_length, cfg.hop_length

    if cfg.preemph is not None:
        x = np.concatenate([x[:, :1], x[:, 1:] - cfg.preemph * x[:, :-1]], axis=1)
    pad = n_fft // 2
    x = np.pad(x, ((0, 0), (pad, pad)), mode="reflect")

    frames = np.lib.stride_tricks.sliding_window_view(x, n_fft, axis=1)[:, ::hop]
    w = _window_padded(cfg).astype(np.float32)  # keep the FFT in complex64
    try:
        from scipy import fft as _sfft

        spec = _sfft.rfft(np.ascontiguousarray(frames * w), axis=-1)
    except ImportError:
        spec = np.fft.rfft(frames * w, axis=-1)
    power = (spec.real.astype(np.float32) ** 2 + spec.imag.astype(np.float32) ** 2)
    if cfg.mag_power != 2.0:
        power = np.power(np.sqrt(power), cfg.mag_power)

    fb = mel_filterbank(cfg.sample_rate, n_fft, cfg.features, cfg.lowfreq, cfg.highfreq)
    mel = power @ fb.T.astype(np.float32)  # [B, F, n_mels]
    if cfg.log:
        if cfg.log_zero_guard_type == "add":
            mel = np.log(mel + cfg.log_zero_guard_value)
        else:
            mel = np.log(np.maximum(mel, cfg.log_zero_guard_value))
    mel = np.transpose(mel, (0, 2, 1))  # [B, n_mels, F]

    if cfg.frame_splicing > 1:
        parts = [mel]
        for n in range(1, cfg.frame_splicing):
            parts.append(np.concatenate([mel[:, :, :n], mel[:, :, :-n]], axis=2))
        mel = np.concatenate(parts, axis=1)

    pad2 = 2 * (n_fft // 2)
    out_len = ((np.asarray(length) + pad2 - n_fft) // hop + 1).astype(np.int32)
    F = mel.shape[2]
    mask = (np.arange(F)[None, :] < out_len[:, None]).astype(np.float32)

    if cfg.normalize == "per_feature":
        m = mask[:, None, :]
        n_valid = np.maximum(out_len.astype(np.float32), 1.0)[:, None, None]
        mean = np.sum(mel * m, axis=2, keepdims=True) / n_valid
        var = np.sum(np.square(mel - mean) * m, axis=2, keepdims=True) / np.maximum(
            n_valid - 1.0, 1.0)
        mel = (mel - mean) / (np.sqrt(var) + CONSTANT)
    elif cfg.normalize == "all_features":
        m = mask[:, None, :]
        n_valid = np.maximum(
            out_len.astype(np.float32) * mel.shape[1], 1.0)[:, None, None]
        mean = np.sum(mel * m, axis=(1, 2), keepdims=True) / n_valid
        var = np.sum(np.square(mel - mean) * m, axis=(1, 2), keepdims=True) / np.maximum(
            n_valid - 1.0, 1.0)
        mel = (mel - mean) / (np.sqrt(var) + CONSTANT)

    mel = mel * mask[:, None, :]
    if cfg.pad_to > 1:
        rem = (-F) % cfg.pad_to
        if rem:
            mel = np.pad(mel, ((0, 0), (0, 0), (0, rem)),
                         constant_values=cfg.pad_value)
    return mel.astype(out_dtype), out_len
