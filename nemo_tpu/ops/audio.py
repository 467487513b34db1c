"""On-chip audio feature extraction (STFT → mel → log → normalize).

TPU-native re-design of the reference mel pipeline
(`nemo/collections/asr/parts/preprocessing/features.py:246` FilterbankFeatures:
dither → preemphasis:439 → STFT:386 → |·|^power:451-461 → mel matmul:471 →
log-with-zero-guard:473 → per-feature normalization:487 → mask+pad-to-16:489-501).

TPU-first choices:
- The STFT is computed as framed windows × a real-DFT **matmul** (cos/sin
  bases folded with the Hann window), so the whole frontend is two large
  MXU matmuls + elementwise VPU work that XLA fuses — no host-side
  feature extraction, no FFT butterflies (n_fft is small; the MXU beats
  a radix FFT at these sizes and keeps everything in one fused HLO).
- fp32 islands: DFT/power/log/normalization run in fp32 regardless of input
  dtype, matching the reference's fp32 casts (features.py:445,467-471).
- All shapes static; variable lengths handled with masks.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

CONSTANT = 1e-5  # normalization epsilon, matches reference features.py


# ---------------------------------------------------------------------------
# Filterbank construction (numpy, done once at model build).
# Equivalent to librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax,
# norm='slaney', htk=False) which the reference calls at features.py:338.
# ---------------------------------------------------------------------------


def _hz_to_mel(f: np.ndarray | float) -> np.ndarray:
    """Slaney mel scale: linear below 1 kHz, log above."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * m
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
) -> np.ndarray:
    """[n_mels, n_fft//2+1] slaney-normalized triangular mel filterbank."""
    if fmax is None:
        fmax = sample_rate / 2.0
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts.reshape(-1, 1) - fft_freqs.reshape(1, -1)

    lower = -ramps[:-2] / fdiff[:-1].reshape(-1, 1)
    upper = ramps[2:] / fdiff[1:].reshape(-1, 1)
    fb = np.maximum(0.0, np.minimum(lower, upper))

    # slaney norm: scale each filter by 2 / bandwidth
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    fb *= enorm.reshape(-1, 1)
    return fb.astype(np.float32)


def hann_window(win_length: int, periodic: bool = False) -> np.ndarray:
    """torch.hann_window(win_length, periodic=False) equivalent."""
    if win_length == 1:
        return np.ones(1, np.float32)
    n = win_length if periodic else win_length - 1
    k = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * k / n)).astype(np.float32)


def real_dft_matrices(n_fft: int, window: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT bases [n_fft, n_freq] for cos and -sin parts.

    frames[B,F,n_fft] @ cos → real part; frames @ sin → imag part.
    The window (zero-padded to n_fft, centered — matching torch.stft's
    zero-padding of win_length<n_fft windows) is folded into the bases.
    """
    n_freq = n_fft // 2 + 1
    w = np.zeros(n_fft, np.float64)
    off = (n_fft - len(window)) // 2
    w[off : off + len(window)] = window
    t = np.arange(n_fft).reshape(-1, 1)
    k = np.arange(n_freq).reshape(1, -1)
    ang = 2.0 * np.pi * t * k / n_fft
    cos = (np.cos(ang) * w.reshape(-1, 1)).astype(np.float32)
    sin = (-np.sin(ang) * w.reshape(-1, 1)).astype(np.float32)
    return cos, sin


# ---------------------------------------------------------------------------
# Config + functional op
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MelSpectrogramConfig:
    """Mirrors AudioToMelSpectrogramPreprocessor's constructor contract
    (reference modules/audio_preprocessing.py:111)."""

    sample_rate: int = 16000
    window_size: float = 0.02  # seconds
    window_stride: float = 0.01  # seconds
    n_window_size: Optional[int] = None
    n_window_stride: Optional[int] = None
    features: int = 80  # n_mels
    n_fft: Optional[int] = None
    window: str = "hann"
    normalize: str = "per_feature"  # per_feature | all_features | none
    preemph: Optional[float] = 0.97
    dither: float = 1e-5
    lowfreq: float = 0.0
    highfreq: Optional[float] = None
    log: bool = True
    log_zero_guard_type: str = "add"  # add | clamp
    log_zero_guard_value: float = 2.0**-24
    mag_power: float = 2.0
    pad_to: int = 16
    pad_value: float = 0.0
    frame_splicing: int = 1

    @property
    def win_length(self) -> int:
        return self.n_window_size or int(self.window_size * self.sample_rate)

    @property
    def hop_length(self) -> int:
        return self.n_window_stride or int(self.window_stride * self.sample_rate)

    @property
    def fft_length(self) -> int:
        return self.n_fft or 2 ** math.ceil(math.log2(self.win_length))


def mel_seq_len(cfg: MelSpectrogramConfig, length: jnp.ndarray) -> jnp.ndarray:
    """Output frame count for input sample count (features.py:413 get_seq_len):
    floor((len + 2*(n_fft//2) - n_fft) / hop) + 1  (center=True)."""
    pad = 2 * (cfg.fft_length // 2)
    return (length + pad - cfg.fft_length) // cfg.hop_length + 1


def build_mel_constants(cfg: MelSpectrogramConfig):
    """Precompute (cos, sin, mel_fb^T) device constants."""
    win = hann_window(cfg.win_length, periodic=False)
    cos, sin = real_dft_matrices(cfg.fft_length, win)
    fb = mel_filterbank(
        cfg.sample_rate, cfg.fft_length, cfg.features, cfg.lowfreq, cfg.highfreq
    ).T  # [n_freq, n_mels]
    return jnp.asarray(cos), jnp.asarray(sin), jnp.asarray(fb)


def frame_signal(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """[B, T] (already center-padded) → [B, F, n_fft] overlapping frames."""
    B, T = x.shape
    n_frames = (T - n_fft) // hop + 1
    # Gather-based framing; XLA lowers this to an efficient gather and the
    # subsequent matmul dominates anyway.
    idx = (jnp.arange(n_frames) * hop)[:, None] + jnp.arange(n_fft)[None, :]
    return x[:, idx]


@partial(jax.jit, static_argnames=("cfg", "training"))
def mel_spectrogram(
    signal: jnp.ndarray,
    length: jnp.ndarray,
    cfg: MelSpectrogramConfig = MelSpectrogramConfig(),
    *,
    training: bool = False,
    rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B, T] float audio, [B] sample lengths → ([B, n_mels, F], [B] frame lens).

    Deterministic when training=False (dither/augment gated train-only, matching
    features.py:435).
    """
    x = signal.astype(jnp.float32)
    B, T = x.shape
    n_fft, hop = cfg.fft_length, cfg.hop_length

    if training and cfg.dither > 0 and rng is not None:
        x = x + cfg.dither * jax.random.normal(rng, x.shape, jnp.float32)

    if cfg.preemph is not None:
        x = jnp.concatenate([x[:, :1], x[:, 1:] - cfg.preemph * x[:, :-1]], axis=1)

    # center=True reflect padding (torch.stft default used by reference)
    pad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")

    cos, sin, fbT = build_mel_constants(cfg)
    # Chunked shifted-matmul DFT: split each n_fft frame into hop-sized
    # chunks so the windowed DFT becomes a sum of matmuls over NON-overlapping
    # data — removes the 3.2× gather blowup of explicit framing (frame j uses
    # rows j..j+n_chunks of the hop-strided signal matrix). MXU-shaped, exact.
    Bp, Tp = x.shape
    F = (Tp - n_fft) // hop + 1
    n_chunks = -(-n_fft // hop)
    rows = F + n_chunks - 1
    need = rows * hop
    if need > Tp:
        x = jnp.pad(x, ((0, 0), (0, need - Tp)))
    X2d = x[:, :need].reshape(Bp, rows, hop)
    n_freq = cos.shape[1]
    re = jnp.zeros((Bp, F, n_freq), jnp.float32)
    im = jnp.zeros((Bp, F, n_freq), jnp.float32)
    for j in range(n_chunks):
        w = min(hop, n_fft - j * hop)
        Xj = X2d[:, j : j + F, :w]
        re = re + jnp.einsum("bfw,wk->bfk", Xj, cos[j * hop : j * hop + w], precision="highest")
        im = im + jnp.einsum("bfw,wk->bfk", Xj, sin[j * hop : j * hop + w], precision="highest")
    power = re * re + im * im  # |STFT|^2
    if cfg.mag_power != 2.0:
        power = jnp.power(jnp.sqrt(power), cfg.mag_power)

    mel = jnp.einsum("bfk,km->bfm", power, fbT, precision="highest")  # [B, F, n_mels], MXU

    if cfg.log:
        if cfg.log_zero_guard_type == "add":
            mel = jnp.log(mel + cfg.log_zero_guard_value)
        else:
            mel = jnp.log(jnp.maximum(mel, cfg.log_zero_guard_value))

    mel = jnp.transpose(mel, (0, 2, 1))  # [B, n_mels, F]

    if cfg.frame_splicing > 1:
        parts = [mel]
        for n in range(1, cfg.frame_splicing):
            parts.append(jnp.concatenate([mel[:, :, :n], mel[:, :, :-n]], axis=2))
        mel = jnp.concatenate(parts, axis=1)

    out_len = mel_seq_len(cfg, length)
    F = mel.shape[2]
    mask = (jnp.arange(F)[None, :] < out_len[:, None]).astype(jnp.float32)  # [B, F]

    if cfg.normalize == "per_feature":
        m = mask[:, None, :]
        n_valid = jnp.maximum(out_len.astype(jnp.float32), 1.0)[:, None, None]
        mean = jnp.sum(mel * m, axis=2, keepdims=True) / n_valid
        var = jnp.sum(jnp.square(mel - mean) * m, axis=2, keepdims=True) / jnp.maximum(
            n_valid - 1.0, 1.0
        )  # unbiased, matches torch .std()
        mel = (mel - mean) / (jnp.sqrt(var) + CONSTANT)
    elif cfg.normalize == "all_features":
        m = mask[:, None, :]
        n_valid = jnp.maximum(out_len.astype(jnp.float32) * mel.shape[1], 1.0)[:, None, None]
        mean = jnp.sum(mel * m, axis=(1, 2), keepdims=True) / n_valid
        var = jnp.sum(jnp.square(mel - mean) * m, axis=(1, 2), keepdims=True) / jnp.maximum(
            n_valid - 1.0, 1.0
        )
        mel = (mel - mean) / (jnp.sqrt(var) + CONSTANT)

    # zero out padding region, then pad frames to a multiple of pad_to
    mel = mel * mask[:, None, :]
    if cfg.pad_to > 1:
        rem = (-F) % cfg.pad_to
        if rem:
            mel = jnp.pad(mel, ((0, 0), (0, 0), (0, rem)), constant_values=cfg.pad_value)
    return mel, out_len


def dct_matrix(n_mfcc: int, n_mels: int, norm: str = "ortho") -> np.ndarray:
    """DCT-II basis [n_mels, n_mfcc] (torchaudio create_dct convention:
    feats @ dct picks the first n_mfcc coefficients)."""
    n = np.arange(n_mels, dtype=np.float64)
    k = np.arange(n_mfcc, dtype=np.float64)
    basis = 2.0 * np.cos(np.pi / n_mels * (n[:, None] + 0.5) * k[None, :])
    if norm == "ortho":
        basis[:, 0] *= 1.0 / np.sqrt(2.0)
        basis *= np.sqrt(1.0 / (2.0 * n_mels))
    return basis.astype(np.float32)


def mfcc(
    signal: jnp.ndarray,
    length: jnp.ndarray,
    cfg: MelSpectrogramConfig = MelSpectrogramConfig(features=64),
    n_mfcc: int = 64,
    *,
    training: bool = False,
    rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B, T] audio → ([B, n_mfcc, F] MFCCs, [B] frame lens): the
    AudioToMFCCPreprocessor analog (reference audio_preprocessing.py:307,
    torchaudio MFCC with log_mels=True): log(mel + 1e-6) then an
    ortho-normalized DCT-II over the mel axis, first n_mfcc coefficients.
    The DCT is one [n_mels, n_mfcc] matmul — MXU-shaped like the mel stage.
    """
    mcfg = dataclasses.replace(
        cfg, log=True, log_zero_guard_type="add", log_zero_guard_value=1e-6,
        normalize="none", preemph=None, mag_power=2.0)
    mel, out_len = mel_spectrogram(
        signal, length, mcfg, training=training, rng=rng)  # [B, n_mels, F]
    basis = jnp.asarray(dct_matrix(n_mfcc, mcfg.features))
    out = jnp.einsum("bmf,mk->bkf", mel, basis, precision="highest")
    F = out.shape[2]
    mask = (jnp.arange(F)[None, :] < out_len[:, None]).astype(out.dtype)
    return out * mask[:, None, :], out_len
