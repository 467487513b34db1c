"""Intrusive speech-quality/intelligibility metrics: SI-SDR, STOI/ESTOI, PESQ.

Reference parity: `nemo/collections/audio/metrics/audio.py` (AudioMetricWrapper
over torchmetrics SI-SDR / PESQ / STOI). The environment has no `pesq` /
`pystoi` wheels (zero egress), so these are self-contained implementations:

- **SI-SDR**: exact (same formula as torchmetrics ScaleInvariantSignalDistortionRatio).
- **STOI / ESTOI**: the Taal et al. 2011 / Jensen & Taal 2016 algorithms
  (15 one-third-octave bands from 150 Hz, 256-sample hann frames @10 kHz,
  512 FFT, 30-frame segments; ESTOI adds the row+column normalized
  segment correlation). Exact-by-construction endpoints (identical signals
  → 1.0) and the published silent-frame removal (40 dB dynamic range).
- **PESQ (P.862 narrowband, MOS-LQO)**: an independent implementation of
  the P.862 pipeline — level alignment to the active-speech band, IRS-style
  receive filtering, envelope time alignment, 32 ms hann Bark-spectrum
  perceptual model, Zwicker loudness (power 0.23), masked symmetric +
  asymmetric disturbance densities, L6-over-frames/L2-over-time
  aggregation and the published raw→MOS-LQO logistic. The Bark band edges
  and power-density constants follow the published tables at 8 kHz but are
  not bit-identical to the ITU C reference; scores are validated
  behaviorally (perfect → 4.55 cap, monotone in SNR, level/delay
  invariance) rather than to 1e-3 against ITU vectors.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from nemo_tpu.ops.stft import si_snr as si_sdr_jax  # exact SI-SDR (jittable)


def si_sdr(estimate: np.ndarray, target: np.ndarray) -> np.ndarray:
    """Scale-invariant SDR in dB (numpy host version)."""
    t = target - target.mean(-1, keepdims=True)
    e = estimate - estimate.mean(-1, keepdims=True)
    s = (e * t).sum(-1, keepdims=True) * t / ((t * t).sum(-1, keepdims=True) + 1e-12)
    n = e - s
    return 10.0 * np.log10(((s * s).sum(-1) + 1e-12) / ((n * n).sum(-1) + 1e-12))


# --------------------------------------------------------------------------
# STOI / ESTOI
# --------------------------------------------------------------------------

_STOI_FS = 10000
_STOI_FRAME = 256
_STOI_HOP = 128
_STOI_NFFT = 512
_STOI_NBANDS = 15
_STOI_SEG = 30
_STOI_DYN_RANGE = 40.0


def _resample_fft(x: np.ndarray, fs: int, fs_out: int) -> np.ndarray:
    if fs == fs_out:
        return x
    n = x.shape[-1]
    m = int(round(n * fs_out / fs))
    X = np.fft.rfft(x)
    k_out = m // 2 + 1
    Y = np.zeros(x.shape[:-1] + (k_out,), complex)
    k = min(X.shape[-1], k_out)
    Y[..., :k] = X[..., :k]
    return np.fft.irfft(Y, m) * (m / n)


def _third_octave_matrix(fs: int, nfft: int, n_bands: int, cf0: float = 150.0):
    f = np.linspace(0, fs / 2, nfft // 2 + 1)
    cfs = cf0 * 2.0 ** (np.arange(n_bands) / 3.0)
    lo = cfs * 2 ** (-1 / 6)
    hi = cfs * 2 ** (1 / 6)
    H = np.zeros((n_bands, len(f)))
    for i in range(n_bands):
        H[i, (f >= lo[i]) & (f < hi[i])] = 1.0
    return H


def _stoi_frames(x: np.ndarray) -> np.ndarray:
    n = (x.shape[-1] - _STOI_FRAME) // _STOI_HOP + 1
    if n <= 0:
        raise ValueError("signal too short for STOI (need ≥ 256 samples @10kHz)")
    idx = np.arange(_STOI_FRAME)[None, :] + _STOI_HOP * np.arange(n)[:, None]
    w = np.hanning(_STOI_FRAME + 2)[1:-1]
    return x[..., idx] * w  # [..., n, 256]


def _remove_silent(xf: np.ndarray, yf: np.ndarray):
    e = 20 * np.log10(np.linalg.norm(xf, axis=-1) + 1e-12)
    keep = e > (e.max() - _STOI_DYN_RANGE)
    return xf[keep], yf[keep]


def _band_envelopes(frames: np.ndarray, H: np.ndarray) -> np.ndarray:
    spec = np.fft.rfft(frames, _STOI_NFFT, axis=-1)
    power = np.abs(spec) ** 2
    return np.sqrt(power @ H.T).T  # [bands, frames]


def stoi(clean: np.ndarray, degraded: np.ndarray, fs: int = 10000,
         extended: bool = False) -> float:
    """Short-time objective intelligibility (Taal 2011) / ESTOI
    (Jensen & Taal 2016, `extended=True`). 1-D inputs."""
    x = _resample_fft(np.asarray(clean, np.float64), fs, _STOI_FS)
    y = _resample_fft(np.asarray(degraded, np.float64), fs, _STOI_FS)
    n = min(x.shape[-1], y.shape[-1])
    x, y = x[:n], y[:n]
    xf, yf = _stoi_frames(x), _stoi_frames(y)
    xf, yf = _remove_silent(xf, yf)
    if xf.shape[0] < _STOI_SEG:
        raise ValueError("not enough active frames for STOI")
    H = _third_octave_matrix(_STOI_FS, _STOI_NFFT, _STOI_NBANDS)
    X = _band_envelopes(xf, H)  # [J, M]
    Y = _band_envelopes(yf, H)
    M = X.shape[1]
    d = []
    for m in range(_STOI_SEG, M + 1):
        Xs = X[:, m - _STOI_SEG:m]
        Ys = Y[:, m - _STOI_SEG:m]
        if extended:
            # row (per-band) mean/variance normalization
            Xn = (Xs - Xs.mean(1, keepdims=True))
            Xn /= (np.linalg.norm(Xn, axis=1, keepdims=True) + 1e-12)
            Yn = (Ys - Ys.mean(1, keepdims=True))
            Yn /= (np.linalg.norm(Yn, axis=1, keepdims=True) + 1e-12)
            # column (per-frame) normalization
            Xn = Xn - Xn.mean(0, keepdims=True)
            Xn /= (np.linalg.norm(Xn, axis=0, keepdims=True) + 1e-12)
            Yn = Yn - Yn.mean(0, keepdims=True)
            Yn /= (np.linalg.norm(Yn, axis=0, keepdims=True) + 1e-12)
            d.append(np.sum(Xn * Yn) / _STOI_SEG)
        else:
            # clip SDR (β = −15 dB) then per-(band,segment) correlation
            alpha = np.linalg.norm(Xs, axis=1, keepdims=True) / (
                np.linalg.norm(Ys, axis=1, keepdims=True) + 1e-12)
            Yc = np.minimum(Ys * alpha, Xs * (1 + 10 ** (-15 / 20)))
            xm = Xs - Xs.mean(1, keepdims=True)
            ym = Yc - Yc.mean(1, keepdims=True)
            corr = (xm * ym).sum(1) / (
                np.linalg.norm(xm, axis=1) * np.linalg.norm(ym, axis=1) + 1e-12)
            d.append(corr.mean())
    return float(np.mean(d))


def estoi(clean: np.ndarray, degraded: np.ndarray, fs: int = 10000) -> float:
    return stoi(clean, degraded, fs, extended=True)


# --------------------------------------------------------------------------
# PESQ (P.862 narrowband → MOS-LQO)
# --------------------------------------------------------------------------

_PESQ_FS = 8000
_PESQ_FRAME = 256   # 32 ms @ 8 kHz
_PESQ_HOP = 128
_PESQ_NB = 42       # Bark bands


def _bark_matrix(fs: int, nfft: int, n_bark: int):
    f = np.linspace(0, fs / 2, nfft // 2 + 1)
    bark = 13.0 * np.arctan(0.00076 * f) + 3.5 * np.arctan((f / 7500.0) ** 2)
    edges = np.linspace(0, bark[-1], n_bark + 1)
    H = np.zeros((n_bark, len(f)))
    width = np.zeros(n_bark)
    for i in range(n_bark):
        sel = (bark >= edges[i]) & (bark < edges[i + 1])
        if sel.any():
            H[i, sel] = 1.0
        width[i] = max(sel.sum(), 1)
    centers = 0.5 * (edges[:-1] + edges[1:])
    # band center frequencies in Hz (inverse bark, numeric)
    fc = np.interp(centers, bark, f)
    return H, width, fc


def _irs_receive_gain(f: np.ndarray) -> np.ndarray:
    """IRS-style receive characteristic: band-pass emphasis 300–3100 Hz
    with soft roll-offs (piecewise-log approximation of the P.830 IRS
    receive curve)."""
    g = np.ones_like(f)
    g = np.where(f < 300.0, (np.maximum(f, 1.0) / 300.0) ** 2, g)
    g = np.where(f > 3100.0, np.maximum(1e-3, (3100.0 / np.maximum(f, 1.0)) ** 2), g)
    return g


def _active_level(x: np.ndarray) -> float:
    """RMS over frames within 20 dB of the loudest (active speech level)."""
    n = (len(x) - _PESQ_FRAME) // _PESQ_HOP + 1
    if n <= 0:
        return float(np.sqrt(np.mean(x ** 2) + 1e-12))
    idx = np.arange(_PESQ_FRAME)[None] + _PESQ_HOP * np.arange(n)[:, None]
    fe = np.sqrt((x[idx] ** 2).mean(-1) + 1e-12)
    thr = fe.max() / 10.0
    act = fe[fe > thr]
    return float(np.sqrt((act ** 2).mean())) if len(act) else float(fe.mean())


def _align(ref: np.ndarray, deg: np.ndarray, max_shift: int = 4000):
    """Envelope cross-correlation delay estimate (P.862 crude alignment)."""
    n = min(len(ref), len(deg))
    env_r = np.abs(ref[:n]).reshape(-1, 1)
    env_d = np.abs(deg[:n]).reshape(-1, 1)
    k = 64
    m = (n // k) * k
    er = env_r[:m].reshape(-1, k).mean(1)
    ed = env_d[:m].reshape(-1, k).mean(1)
    er -= er.mean(); ed -= ed.mean()
    c = np.correlate(ed, er, mode="full")
    lag = (np.argmax(c) - (len(er) - 1)) * k
    lag = int(np.clip(lag, -max_shift, max_shift))
    if lag > 0:
        deg = deg[lag:]
    elif lag < 0:
        deg = np.concatenate([np.zeros(-lag), deg])
    n = min(len(ref), len(deg))
    return ref[:n], deg[:n]


def pesq_nb(ref: np.ndarray, deg: np.ndarray, fs: int = 8000) -> float:
    """P.862 narrowband PESQ → MOS-LQO in [1.02, 4.55] (see module note on
    fidelity). 1-D float inputs."""
    ref = _resample_fft(np.asarray(ref, np.float64), fs, _PESQ_FS)
    deg = _resample_fft(np.asarray(deg, np.float64), fs, _PESQ_FS)
    # level alignment: both to a common active-speech level. The target
    # (active RMS = 100) is the P.862 79 dB-SPL calibration analog: it
    # places voiced Bark densities ~20-30 dB above the hearing-threshold
    # constant P0 so sub-threshold masking behaves like the standard's.
    ref = ref * (100.0 / (_active_level(ref) + 1e-12))
    deg = deg * (100.0 / (_active_level(deg) + 1e-12))
    ref, deg = _align(ref, deg)

    n = (len(ref) - _PESQ_FRAME) // _PESQ_HOP + 1
    if n < 4:
        raise ValueError("signal too short for PESQ (need ≥ 80 ms)")
    idx = np.arange(_PESQ_FRAME)[None] + _PESQ_HOP * np.arange(n)[:, None]
    w = np.hanning(_PESQ_FRAME)
    F = np.fft.rfft(ref[idx] * w, axis=-1)
    G = np.fft.rfft(deg[idx] * w, axis=-1)
    freqs = np.linspace(0, _PESQ_FS / 2, _PESQ_FRAME // 2 + 1)
    irs = _irs_receive_gain(freqs)
    Pr = (np.abs(F) * irs) ** 2
    Pd = (np.abs(G) * irs) ** 2

    H, width, fc = _bark_matrix(_PESQ_FS, _PESQ_FRAME, _PESQ_NB)
    Br = (Pr @ H.T) / width  # Bark pitch-power densities [frames, bands]
    Bd = (Pd @ H.T) / width

    # partial frequency-response equalization (per band, over active frames)
    active = Br.sum(1) > Br.sum(1).max() * 1e-3
    ratio = (Bd[active].mean(0) + 1e3) / (Br[active].mean(0) + 1e3)
    ratio = np.clip(ratio, 0.01, 100.0)
    Br_eq = Br * ratio[None, :]
    # per-frame gain equalization of the degraded signal (partial)
    g = (Br_eq.sum(1) + 5e3) / (Bd.sum(1) + 5e3)
    g = np.clip(g, 3e-4, 5.0)
    Bd_eq = Bd * g[:, None]

    # Zwicker loudness (power 0.23); hearing threshold per band grows
    # toward the band edges (absolute-threshold proxy)
    P0 = 1e4 * (1.0 + 0.5 * (np.abs(fc - 1000.0) / 3000.0) ** 2)
    def loud(B):
        # Zwicker loudness, zero below the hearing threshold (P.862 clamps
        # sub-threshold loudness density to 0)
        return np.maximum(
            (P0 / 0.5) ** 0.23 * ((0.5 + 0.5 * B / P0) ** 0.23 - 1.0), 0.0)
    Lr = loud(Br_eq)
    Ld = loud(Bd_eq)

    # masked disturbance
    d = Ld - Lr
    m = 0.25 * np.minimum(Lr, Ld)
    D = np.where(d > m, d - m, np.where(d < -m, d + m, 0.0))
    # symmetric disturbance: L2 over bark (width-weighted)
    wgt = width / width.sum() * _PESQ_NB
    d_frame = np.sqrt((D ** 2 * wgt[None, :]).sum(1))
    # asymmetric: penalize additive components (codec noise); the +P0-scale
    # offset keeps near-silent bands out of the ratio
    asym = np.clip(((Bd_eq + 1e3) / (Br_eq + 1e3)) ** 1.2, 0, 12.0)
    asym = np.where(asym < 3.0, 0.0, asym)
    da_frame = (np.abs(D) * asym * wgt[None, :]).sum(1)

    def lp_time(dv, p=6.0, win=20):
        k = max(len(dv) // win, 1)
        m_ = (len(dv) // k) * k
        blocks = dv[:m_].reshape(k, -1)
        per = (blocks ** p).mean(1) ** (1 / p)
        return np.sqrt((per ** 2).mean())

    d_sym = lp_time(d_frame)
    d_asym = lp_time(da_frame)
    # saturating compression of the two indicators before the ITU weights:
    # calibration in lieu of P.862's per-frame audible-power normalization
    # + bad-interval reprocessing (see module docstring on fidelity)
    s_c = 35.0 * d_sym / (d_sym + 12.0)
    a_c = 35.0 * d_asym / (d_asym + 600.0)
    raw = 4.5 - 0.1 * s_c - 0.0309 * a_c
    # published P.862.1 raw→MOS-LQO mapping
    mos = 0.999 + 4.0 / (1.0 + np.exp(-1.4945 * raw + 4.6607))
    return float(np.clip(mos, 1.0, 4.64))


__all__ = ["si_sdr", "si_sdr_jax", "stoi", "estoi", "pesq_nb"]
