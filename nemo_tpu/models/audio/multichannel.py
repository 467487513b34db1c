"""Multichannel audio processing (beamforming + dereverberation), TPU-native.

Reference parity: `nemo/collections/audio/parts/submodules/multichannel.py`
(ParametricMultichannelWienerFilter, WPEFilter, ReferenceChannelEstimatorSNR,
channel pooling/transform layers, ChannelAugment) and the mask-based
beamforming / WPE-dereverb processors in `audio/models/enhancement.py`.

TPU-first design: complex spectrograms are carried as REAL (re, im) pairs
([B, C, T, K] each — C mics, T frames, K bins); every complex product is a
pair of real einsums (MXU-friendly) and the per-(batch, bin) C x C / CL x CL
linear systems are solved as real 2n x 2n block systems ([[Ar,-Ai],[Ai,Ar]]).
complex64 arrays are deliberately never materialized: the TPU backend used
here has no complex lowering, and the real-pair formulation is what XLA
would decompose to anyway.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.core.model import Model
from nemo_tpu.ops.stft import istft, stft

Pair = Tuple[jnp.ndarray, jnp.ndarray]  # (real, imag)


# ---------------------------------------------------------------------------
# real-pair complex helpers
# ---------------------------------------------------------------------------


def cein_bconj(subs: str, a: Pair, b: Pair, *rest) -> Pair:
    """einsum(subs, a, conj(b), *rest) on (re, im) pairs."""
    ar, ai = a
    br, bi = b
    rr = jnp.einsum(subs, ar, br, *rest) + jnp.einsum(subs, ai, bi, *rest)
    ri = jnp.einsum(subs, ai, br, *rest) - jnp.einsum(subs, ar, bi, *rest)
    return rr, ri


def cein_aconj(subs: str, a: Pair, b: Pair, *rest) -> Pair:
    """einsum(subs, conj(a), b, *rest) on (re, im) pairs."""
    ar, ai = a
    br, bi = b
    rr = jnp.einsum(subs, ar, br, *rest) + jnp.einsum(subs, ai, bi, *rest)
    ri = jnp.einsum(subs, ar, bi, *rest) - jnp.einsum(subs, ai, br, *rest)
    return rr, ri


def cdiv(a: Pair, b: Pair, eps: float = 1e-12) -> Pair:
    """Elementwise complex division a / b on pairs."""
    ar, ai = a
    br, bi = b
    den = br * br + bi * bi + eps
    return (ar * br + ai * bi) / den, (ai * br - ar * bi) / den


def csolve(a: Pair, b: Pair) -> Pair:
    """Solve A X = B for complex batched A [..., n, n], B [..., n, m].

    Real 2n x 2n block system so it lowers to batched real LU on every
    backend (the TPU path has no complex linalg).
    """
    ar, ai = a
    br, bi = b
    top = jnp.concatenate([ar, -ai], axis=-1)
    bot = jnp.concatenate([ai, ar], axis=-1)
    m = jnp.concatenate([top, bot], axis=-2)  # [..., 2n, 2n]
    rhs = jnp.concatenate([br, bi], axis=-2)  # [..., 2n, m]
    sol = jnp.linalg.solve(m, rhs)
    n = ar.shape[-1]
    return sol[..., :n, :], sol[..., n:, :]


def apply_diag_reg(psd: Pair, diag_reg: float = 1e-6, eps: float = 1e-8) -> Pair:
    """Tikhonov-regularize a batched PSD: psd + (diag_reg * trace + eps) I.

    Mirrors ParametricMultichannelWienerFilter.apply_diag_reg
    (reference multichannel.py:478). Trace of a Hermitian PSD is real.
    """
    pr, pi = psd
    n = pr.shape[-1]
    tr = jnp.trace(pr, axis1=-2, axis2=-1)[..., None, None]
    return pr + (diag_reg * tr + eps) * jnp.eye(n, dtype=pr.dtype), pi


# ---------------------------------------------------------------------------
# PSD estimation + parametric multichannel Wiener filter (MVDR/MWF family)
# ---------------------------------------------------------------------------


def estimate_psd(spec: Pair, mask: Optional[jnp.ndarray] = None,
                 eps: float = 1e-8) -> Pair:
    """Mask-weighted spatial PSD.

    spec: (re, im) [B, C, T, K]; mask: [B, T, K] in [0, 1] (None = all-ones).
    Returns psd pair [B, K, C, C]: psd = sum_t m x x^H / sum_t m.
    """
    xr = spec[0]
    if mask is None:
        mask = jnp.ones(xr.shape[:1] + xr.shape[2:], jnp.float32)
    mask = mask.astype(jnp.float32)
    nr, ni = cein_bconj("bctk,bdtk,btk->bkcd", spec, spec, mask)
    den = jnp.sum(mask, axis=1)[..., None, None] + eps  # [B, K, 1, 1]
    return nr / den, ni / den


def rank1_psd(psd: Pair, iters: int = 10, eps: float = 1e-8) -> Pair:
    """Rank-1 approximation lam * v v^H of a batched PSD via power iteration
    (the reference's rank-1 EVD option for the target PSD)."""
    pr, pi = psd
    c = pr.shape[-1]
    vr = jnp.ones(pr.shape[:-1], pr.dtype) / jnp.sqrt(jnp.asarray(float(c)))
    vi = jnp.zeros_like(vr)
    for _ in range(iters):
        wr = jnp.einsum("...cd,...d->...c", pr, vr) - jnp.einsum("...cd,...d->...c", pi, vi)
        wi = jnp.einsum("...cd,...d->...c", pr, vi) + jnp.einsum("...cd,...d->...c", pi, vr)
        nrm = jnp.sqrt(jnp.sum(wr * wr + wi * wi, axis=-1, keepdims=True)) + eps
        vr, vi = wr / nrm, wi / nrm
    # lam = v^H P v (real for Hermitian P)
    tr_, ti_ = cein_aconj("...c,...c->...", (vr, vi),
                          (jnp.einsum("...cd,...d->...c", pr, vr) - jnp.einsum("...cd,...d->...c", pi, vi),
                           jnp.einsum("...cd,...d->...c", pr, vi) + jnp.einsum("...cd,...d->...c", pi, vr)))
    lam = tr_[..., None, None]
    # v v^H
    vvr, vvi = cein_bconj("...c,...d->...cd", (vr, vi), (vr, vi))
    return lam * vvr, lam * vvi


def _pmwf_matrix(psd_s: Pair, psd_n: Pair, beta: float, diag_reg: float,
                 eps: float) -> Pair:
    """W = (Phi_n^-1 Phi_s) / (beta + tr(Phi_n^-1 Phi_s)) — full C x C matrix
    whose columns are the weights for each candidate reference channel."""
    nr, ni = csolve(apply_diag_reg(psd_n, diag_reg, eps), psd_s)
    lam_r = jnp.trace(nr, axis1=-2, axis2=-1)[..., None, None]
    lam_i = jnp.trace(ni, axis1=-2, axis2=-1)[..., None, None]
    return cdiv((nr, ni), (beta + lam_r + eps, lam_i))


def pmwf_weights(psd_s: Pair, psd_n: Pair, beta: float = 0.0,
                 ref_channel: int = 0, diag_reg: float = 1e-6,
                 eps: float = 1e-8) -> Pair:
    """Parametric multichannel Wiener filter weights.

    w = (Phi_n^-1 Phi_s) / (beta + tr(Phi_n^-1 Phi_s)) u_ref
    beta=0 -> MVDR (distortionless), beta=1 -> MWF.
    psd_s/psd_n: pairs [B, K, C, C]. Returns w pair [B, K, C].
    Reference: ParametricMultichannelWienerFilter.forward (multichannel.py:569).
    """
    wr, wi = _pmwf_matrix(psd_s, psd_n, beta, diag_reg, eps)
    return wr[..., :, ref_channel], wi[..., :, ref_channel]


def apply_beamform(spec: Pair, w: Pair) -> Pair:
    """y[b,t,k] = w[b,k]^H x[b,:,t,k].  spec [B,C,T,K], w [B,K,C] -> [B,T,K]."""
    return cein_aconj("bkc,bctk->btk", w, spec)


def ban_gain(w: Pair, psd_n: Pair, eps: float = 1e-8) -> jnp.ndarray:
    """Blind analytic normalization postfilter gain, per [B, K].

    g = sqrt(|w^H Phi_n Phi_n w| / C) / |w^H Phi_n w|
    (reference apply_ban, multichannel.py:518). With Hermitian Phi_n,
    w^H Phi_n Phi_n w = ||Phi_n w||^2.
    """
    wr, wi = w
    pr, pi = psd_n
    c = float(wr.shape[-1])
    tr = jnp.einsum("bkcd,bkd->bkc", pr, wr) - jnp.einsum("bkcd,bkd->bkc", pi, wi)
    ti = jnp.einsum("bkcd,bkd->bkc", pr, wi) + jnp.einsum("bkcd,bkd->bkc", pi, wr)
    num = jnp.sqrt(jnp.sum(tr * tr + ti * ti, axis=-1) / c)
    dr, di = cein_aconj("bkc,bkc->bk", w, (tr, ti))
    den = jnp.sqrt(dr * dr + di * di)
    return num / (den + eps)


def reference_channel_snr(psd_s: Pair, psd_n: Pair, beta: float = 0.0,
                          diag_reg: float = 1e-6, eps: float = 1e-8) -> jnp.ndarray:
    """Pick the reference channel maximizing expected post-filter SNR.

    For each candidate reference c, SNR_c = sum_k w_c^H Phi_s w_c /
    sum_k w_c^H Phi_n w_c; returns argmax channel index per batch item
    (ReferenceChannelEstimatorSNR analog, multichannel.py:639).
    """
    w = _pmwf_matrix(psd_s, psd_n, beta, diag_reg, eps)  # [B,K,C,Cref]

    def quad(p: Pair) -> jnp.ndarray:
        # real part of diag_r(W^H P W); imag cancels for Hermitian P
        tr, ti = cein_nc_mat(p, w)
        qr, _ = cein_aconj("bkcr,bkcr->bkr", w, (tr, ti))
        return jnp.abs(qr)

    pow_s = quad(psd_s)
    pow_n = quad(psd_n)
    snr = jnp.sum(pow_s, axis=1) / (jnp.sum(pow_n, axis=1) + eps)  # [B, Cref]
    return jnp.argmax(snr, axis=-1)


def cein_nc_mat(p: Pair, w: Pair) -> Pair:
    """(P W) for pairs: P [B,K,C,C] @ W [B,K,C,R] -> [B,K,C,R]."""
    pr, pi = p
    wr, wi = w
    tr = jnp.einsum("bkcd,bkdr->bkcr", pr, wr) - jnp.einsum("bkcd,bkdr->bkcr", pi, wi)
    ti = jnp.einsum("bkcd,bkdr->bkcr", pr, wi) + jnp.einsum("bkcd,bkdr->bkcr", pi, wr)
    return tr, ti


def mask_based_beamform(spec: Pair, mask_s: jnp.ndarray, mask_n: jnp.ndarray,
                        beta: float = 0.0, rank1: bool = False,
                        use_ban: bool = False, ref_channel: Optional[int] = 0,
                        diag_reg: float = 1e-6, eps: float = 1e-8) -> Pair:
    """Full mask-based PMWF pipeline: masks -> PSDs -> weights -> beamform.

    ref_channel=None selects the max-SNR reference per batch item.
    Returns enhanced single-channel spec pair [B, T, K].
    """
    psd_s = estimate_psd(spec, mask_s, eps)
    psd_n = estimate_psd(spec, mask_n, eps)
    if rank1:
        psd_s = rank1_psd(psd_s)
    if ref_channel is None:
        refs = reference_channel_snr(psd_s, psd_n, beta, diag_reg, eps)  # [B]
        wr, wi = _pmwf_matrix(psd_s, psd_n, beta, diag_reg, eps)
        idx = refs[:, None, None, None].astype(jnp.int32)
        w = (jnp.take_along_axis(wr, idx, axis=-1)[..., 0],
             jnp.take_along_axis(wi, idx, axis=-1)[..., 0])
    else:
        w = pmwf_weights(psd_s, psd_n, beta, int(ref_channel), diag_reg, eps)
    yr, yi = apply_beamform(spec, w)
    if use_ban:
        g = ban_gain(w, psd_n, eps)[:, None, :]
        yr, yi = yr * g, yi * g
    return yr, yi


# ---------------------------------------------------------------------------
# WPE dereverberation
# ---------------------------------------------------------------------------


def _delayed_stack(x: jnp.ndarray, filter_length: int, delay: int) -> jnp.ndarray:
    """Build the WPE regression tensor X~ [B, K, C*L, T] from [B, C, T, K].

    Row (c, l) at time t is x[b, c, t - delay - l, k] (zero-padded past).
    Reference: WPEFilter.convtensor (multichannel.py:852).
    """
    b, c, t, k = x.shape
    pad = delay + filter_length - 1
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, 0), (0, 0)))
    taps = [xp[:, :, pad - delay - l: pad - delay - l + t, :]
            for l in range(filter_length)]
    xt = jnp.stack(taps, axis=2)  # [B, C, L, T, K]
    return jnp.transpose(xt.reshape(b, c * filter_length, t, k), (0, 3, 1, 2))


def wpe_dereverb(spec: Pair, filter_length: int = 10, delay: int = 3,
                 iterations: int = 3, diag_reg: float = 1e-6,
                 eps: float = 1e-8) -> Pair:
    """Iterative weighted prediction error dereverberation.

    spec: pair [B, C, T, K] -> dereverberated pair [B, C, T, K].
    Each iteration: variance lambda from the current estimate, weighted
    correlations R/Q over delayed frames, MIMO filter via solve, subtract
    prediction. Reference: WPEFilter.forward/estimate_correlations/
    estimate_filter/apply_filter (multichannel.py:754-1034).
    """
    xr, xi = spec
    xtr = _delayed_stack(xr, filter_length, delay)  # [B, K, P, T]
    xti = _delayed_stack(xi, filter_length, delay)
    x_tkr = jnp.transpose(xr, (0, 3, 1, 2))  # [B, K, C, T]
    x_tki = jnp.transpose(xi, (0, 3, 1, 2))
    yr, yi = xr, xi
    for _ in range(iterations):
        power = jnp.mean(yr * yr + yi * yi, axis=1)  # [B, T, K]
        lam = jnp.maximum(power, eps)
        w = jnp.transpose(1.0 / lam, (0, 2, 1)).astype(jnp.float32)  # [B, K, T]
        r = cein_bconj("bkpt,bkqt,bkt->bkpq", (xtr, xti), (xtr, xti), w)
        q = cein_bconj("bkpt,bkct,bkt->bkpc", (xtr, xti), (x_tkr, x_tki), w)
        gr, gi = csolve(apply_diag_reg(r, diag_reg, eps), q)  # [B, K, P, C]
        pr, pi = cein_aconj("bkpc,bkpt->bkct", (gr, gi), (xtr, xti))
        yr = xr - jnp.transpose(pr, (0, 2, 3, 1))  # back to [B, C, T, K]
        yi = xi - jnp.transpose(pi, (0, 2, 3, 1))
    return yr, yi


# ---------------------------------------------------------------------------
# channel transform / pooling layers (flax)
# ---------------------------------------------------------------------------


class ChannelAugment:
    """Random channel permutation + subset selection (train-time augment).

    Reference: ChannelAugment (multichannel.py:29). Pure function of an rng —
    no params.
    """

    def __init__(self, permute_channels: bool = True, num_channels_min: int = 1,
                 num_channels_max: Optional[int] = None):
        self.permute = permute_channels
        self.cmin = num_channels_min
        self.cmax = num_channels_max

    def __call__(self, rng: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B, C, ...] -> [B, C', ...] with C' <= C (same across batch)."""
        c = x.shape[1]
        k_perm, k_n = jax.random.split(rng)
        order = (jax.random.permutation(k_perm, c) if self.permute
                 else jnp.arange(c))
        cmax = self.cmax or c
        n = int(jax.random.randint(k_n, (), self.cmin, cmax + 1))
        return jnp.take(x, order[:n], axis=1)


class TransformAverageConcatenate(nn.Module):
    """Per-channel transform || cross-channel average transform.

    x: [B, C, T, F] -> [B, C, T, out]; out split half transform / half
    average context. Reference: multichannel.py:104.
    """

    out_features: int

    @nn.compact
    def __call__(self, x):
        half = self.out_features // 2
        own = nn.Dense(half, name="transform")(x)
        avg = nn.Dense(half, name="average")(jnp.mean(x, axis=1, keepdims=True))
        avg = jnp.broadcast_to(avg, own.shape[:-1] + (half,))
        return jnp.concatenate([own, avg], axis=-1)


class TransformAttendConcatenate(nn.Module):
    """Per-channel transform || cross-channel attention context.

    Self-attention over the channel axis per (batch, time) position.
    Reference: multichannel.py:185.
    """

    out_features: int
    n_head: int = 4

    @nn.compact
    def __call__(self, x):  # [B, C, T, F]
        half = self.out_features // 2
        own = nn.Dense(half, name="transform")(x)
        h = jnp.swapaxes(nn.Dense(half, name="pre")(x), 1, 2)  # [B, T, C, half]
        att = nn.MultiHeadDotProductAttention(
            num_heads=self.n_head, qkv_features=half, name="att")(h, h)
        att = jnp.swapaxes(att, 1, 2)  # [B, C, T, half]
        return jnp.concatenate([own, att], axis=-1)


class ChannelAveragePool(nn.Module):
    """[B, C, T, F] -> [B, T, F] mean over channels (multichannel.py:273)."""

    @nn.compact
    def __call__(self, x):
        return jnp.mean(x, axis=1)


class ChannelAttentionPool(nn.Module):
    """Attention-weighted channel pooling: the mean channel queries the
    channels and the attended combination is returned.
    [B, C, T, F] -> [B, T, F]. Reference: multichannel.py:306.
    """

    n_head: int = 1

    @nn.compact
    def __call__(self, x):  # [B, C, T, F]
        f = x.shape[-1]
        h = jnp.swapaxes(x, 1, 2)  # [B, T, C, F]
        q = jnp.mean(h, axis=2, keepdims=True)  # [B, T, 1, F]
        att = nn.MultiHeadDotProductAttention(
            num_heads=self.n_head, qkv_features=f, name="att")(q, h)
        return att[:, :, 0, :]


# ---------------------------------------------------------------------------
# processing models (Model API: enhance() on [B, C, samples] waveforms)
# ---------------------------------------------------------------------------


class _McMaskNet(nn.Module):
    """Tiny conv mask estimator emitting (speech, noise) masks from the
    channel-averaged log-magnitude."""

    channels: int = 48
    n_layers: int = 3

    @nn.compact
    def __call__(self, logmag):  # [B, T, K]
        h = logmag[..., None]
        for i in range(self.n_layers):
            h = nn.Conv(self.channels, (3, 3), padding="SAME", name=f"conv{i}")(h)
            h = nn.LayerNorm(name=f"ln{i}")(h)
            h = nn.silu(h)
        m = nn.Conv(2, (3, 3), padding="SAME", name="out")(h)
        m = jax.nn.sigmoid(m)
        return m[..., 0], m[..., 1]


def _stft_mc(wav: jnp.ndarray, n_fft: int, hop: int) -> Pair:
    """[B, C, S] -> (re, im) [B, C, T, K]."""
    b, c, s = wav.shape
    re, im = stft(wav.reshape(b * c, s), n_fft, hop)
    t, k = re.shape[1], re.shape[2]
    return re.reshape(b, c, t, k), im.reshape(b, c, t, k)


class MaskBasedBeamformerModel(Model):
    """STFT -> mask estimator -> PMWF beamform -> ISTFT.

    The EncMaskDecAudioToAudioModel beamforming configuration of reference
    `audio/models/enhancement.py` (mask-based beamformer).
    enhance(): [B, C, samples] -> [B, samples].
    """

    def __init__(self, cfg: Optional[ConfigDict] = None, init_params: bool = True):
        cfg = ConfigDict(cfg or {})
        super().__init__(cfg)
        self.n_fft = int(cfg.get("n_fft", 512))
        self.hop = int(cfg.get("hop", 128))
        self.beta = float(cfg.get("beta", 0.0))
        self.use_ban = bool(cfg.get("use_ban", False))
        self.rank1 = bool(cfg.get("rank1", False))
        self.net = _McMaskNet(channels=int(cfg.get("channels", 48)),
                              n_layers=int(cfg.get("n_layers", 3)))
        if init_params:
            dummy = jnp.zeros((1, 16, self.n_fft // 2 + 1), jnp.float32)
            self.variables = self.net.init(jax.random.PRNGKey(0), dummy)
        self._jit_enhance = jax.jit(self._enhance)
        self._jit_oracle = jax.jit(self._enhance_oracle)

    def _enhance(self, params, wav):
        sr, si = _stft_mc(wav, self.n_fft, self.hop)
        logmag = jnp.log1p(jnp.mean(jnp.sqrt(sr * sr + si * si), axis=1))
        mask_s, mask_n = self.net.apply(params, logmag)
        yr, yi = mask_based_beamform((sr, si), mask_s, mask_n, beta=self.beta,
                                     rank1=self.rank1, use_ban=self.use_ban)
        return istft(yr, yi, self.n_fft, self.hop, length=wav.shape[-1])

    def enhance(self, wav: jnp.ndarray) -> jnp.ndarray:
        return self._jit_enhance(self.variables, wav)

    def _enhance_oracle(self, wav, mask_s, mask_n):
        spec = _stft_mc(wav, self.n_fft, self.hop)
        yr, yi = mask_based_beamform(spec, mask_s, mask_n, beta=self.beta,
                                     rank1=self.rank1, use_ban=self.use_ban)
        return istft(yr, yi, self.n_fft, self.hop, length=wav.shape[-1])

    def enhance_oracle(self, wav: jnp.ndarray, mask_s: jnp.ndarray,
                       mask_n: jnp.ndarray) -> jnp.ndarray:
        """Beamform with externally supplied (oracle) masks."""
        return self._jit_oracle(wav, mask_s, mask_n)


class DereverbWPEModel(Model):
    """STFT -> iterative WPE -> ISTFT; parameter-free processing model.

    Reference: MaskBasedDereverbWPE (audio/models/enhancement.py).
    enhance(): [B, C, samples] -> [B, C, samples].
    """

    def __init__(self, cfg: Optional[ConfigDict] = None, init_params: bool = True):
        cfg = ConfigDict(cfg or {})
        super().__init__(cfg)
        self.n_fft = int(cfg.get("n_fft", 512))
        self.hop = int(cfg.get("hop", 128))
        self.filter_length = int(cfg.get("filter_length", 10))
        self.delay = int(cfg.get("delay", 3))
        self.iterations = int(cfg.get("iterations", 3))
        self.variables = {}
        self._jit_enhance = jax.jit(self._enhance)

    def _enhance(self, wav):
        b, c, s = wav.shape
        spec = _stft_mc(wav, self.n_fft, self.hop)
        yr, yi = wpe_dereverb(spec, self.filter_length, self.delay,
                              self.iterations)
        t, k = yr.shape[2], yr.shape[3]
        out = istft(yr.reshape(b * c, t, k), yi.reshape(b * c, t, k),
                    self.n_fft, self.hop, length=s)
        return out.reshape(b, c, s)

    def enhance(self, wav: jnp.ndarray) -> jnp.ndarray:
        return self._jit_enhance(wav)
