"""Multichannel audio processing: PMWF beamforming, WPE dereverb, channel layers.

Behavioral tests mirroring the reference multichannel submodule semantics
(nemo/collections/audio/parts/submodules/multichannel.py). Spectrograms are
(re, im) real pairs throughout (no complex64 — the TPU backend has no
complex lowering).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nemo_tpu.models.audio.multichannel import (
    ChannelAttentionPool,
    ChannelAugment,
    ChannelAveragePool,
    DereverbWPEModel,
    MaskBasedBeamformerModel,
    TransformAttendConcatenate,
    TransformAverageConcatenate,
    csolve,
    estimate_psd,
    mask_based_beamform,
    rank1_psd,
    reference_channel_snr,
    wpe_dereverb,
)
from nemo_tpu.ops.stft import istft, si_snr, stft

N_FFT, HOP = 256, 64


def _spec_mc(wav):
    b, c, s = wav.shape
    re, im = stft(wav.reshape(b * c, s), N_FFT, HOP)
    t, k = re.shape[1], re.shape[2]
    return re.reshape(b, c, t, k), im.reshape(b, c, t, k)


def _make_scene(seed=0, n=4096, c=3, noise_scale=0.3, per_channel_noise=None):
    """Target image per channel (delayed/scaled) + independent noise."""
    rng = np.random.RandomState(seed)
    base = rng.randn(n + 8).astype(np.float32)
    # narrowband-ish target: smooth the white noise so masks are meaningful
    kern = np.hanning(33).astype(np.float32)
    base = np.convolve(base, kern / kern.sum(), mode="same")
    gains = [1.0, 0.9, 0.8, 0.7][:c]
    delays = [0, 1, 2, 3][:c]
    tgt = np.stack([g * base[8 - d: 8 - d + n] for g, d in zip(gains, delays)])
    if per_channel_noise is None:
        per_channel_noise = [noise_scale] * c
    noise = np.stack([per_channel_noise[i] * rng.randn(n).astype(np.float32)
                      for i in range(c)])
    return jnp.asarray(tgt[None]), jnp.asarray(noise[None])  # [1, C, n]


def _oracle_masks(tgt, noise):
    """Wiener-style oracle masks from the clean/noise images (channel mean)."""
    sr, si = _spec_mc(tgt)
    nr, ni = _spec_mc(noise)
    pt = jnp.mean(sr * sr + si * si, axis=1)
    pn = jnp.mean(nr * nr + ni * ni, axis=1)
    mask_s = pt / (pt + pn + 1e-8)
    return mask_s, 1.0 - mask_s


def test_csolve_matches_numpy():
    rng = np.random.RandomState(1)
    a = rng.randn(5, 4, 4) + 1j * rng.randn(5, 4, 4)
    a = a @ np.conj(np.swapaxes(a, -1, -2)) + 4.0 * np.eye(4)  # well-conditioned
    b = rng.randn(5, 4, 2) + 1j * rng.randn(5, 4, 2)
    xr, xi = csolve(
        (jnp.asarray(a.real, jnp.float32), jnp.asarray(a.imag, jnp.float32)),
        (jnp.asarray(b.real, jnp.float32), jnp.asarray(b.imag, jnp.float32)))
    ref = np.linalg.solve(a, b)
    np.testing.assert_allclose(np.asarray(xr), ref.real, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(xi), ref.imag, rtol=2e-3, atol=2e-3)


def test_mvdr_oracle_masks_improves_si_snr():
    tgt, noise = _make_scene(noise_scale=0.5)
    mix = tgt + noise
    mask_s, mask_n = _oracle_masks(tgt, noise)
    spec = _spec_mc(mix)
    yr, yi = mask_based_beamform(spec, mask_s, mask_n, beta=0.0)
    out = istft(yr, yi, N_FFT, HOP, length=mix.shape[-1])
    ref_clean = tgt[:, 0]
    before = float(si_snr(mix[:, 0], ref_clean)[0])
    after = float(si_snr(out, ref_clean)[0])
    assert after > before + 3.0, (before, after)


@pytest.mark.parametrize("variant", ["rank1", "ban", "mwf"])
def test_pmwf_variants_improve(variant):
    tgt, noise = _make_scene(seed=2, noise_scale=0.5)
    mix = tgt + noise
    mask_s, mask_n = _oracle_masks(tgt, noise)
    spec = _spec_mc(mix)
    kw = dict(beta=0.0)
    if variant == "rank1":
        kw["rank1"] = True
    elif variant == "ban":
        kw["use_ban"] = True
    elif variant == "mwf":
        kw["beta"] = 1.0
    yr, yi = mask_based_beamform(spec, mask_s, mask_n, **kw)
    out = istft(yr, yi, N_FFT, HOP, length=mix.shape[-1])
    before = float(si_snr(mix[:, 0], tgt[:, 0])[0])
    after = float(si_snr(out, tgt[:, 0])[0])
    assert after > before + 1.0, (variant, before, after)


def test_reference_channel_snr_picks_clean_channel():
    # channel 2 has far less noise than the others
    tgt, noise = _make_scene(seed=3, per_channel_noise=[0.8, 0.8, 0.05])
    mix = tgt + noise
    mask_s, mask_n = _oracle_masks(tgt, noise)
    spec = _spec_mc(mix)
    psd_s = estimate_psd(spec, mask_s)
    psd_n = estimate_psd(spec, mask_n)
    ref = reference_channel_snr(psd_s, psd_n)
    assert int(ref[0]) == 2


def test_psd_hermitian_and_psd_of_clean_is_rank_deficient():
    tgt, noise = _make_scene(seed=4)
    spec = _spec_mc(tgt)
    pr, pi = estimate_psd(spec)
    np.testing.assert_allclose(np.asarray(pr),
                               np.swapaxes(np.asarray(pr), -1, -2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pi),
                               -np.swapaxes(np.asarray(pi), -1, -2), atol=1e-5)
    r1r, r1i = rank1_psd((pr, pi), iters=20)
    # clean target is a single source -> PSD ~ rank-1, approximation tight
    num = jnp.linalg.norm(pr - r1r) + jnp.linalg.norm(pi - r1i)
    den = jnp.linalg.norm(pr) + jnp.linalg.norm(pi) + 1e-8
    assert float(num / den) < 0.35


def test_wpe_dereverb_improves_direct_path_snr():
    rng = np.random.RandomState(5)
    n, c = 4096, 2
    s = rng.randn(n).astype(np.float32)
    kern = np.hanning(17).astype(np.float32)
    s = np.convolve(s, kern / kern.sum(), mode="same")
    # reverb: direct at 0 plus exponential tail starting beyond the WPE delay
    out = []
    direct = []
    for ci in range(c):
        h = np.zeros(1200, np.float32)
        h[0] = 1.0
        tail_start = 3 * HOP  # beyond prediction delay in frames
        t = np.arange(tail_start, 1200)
        hr = rng.randn(len(t)).astype(np.float32)
        h[tail_start:] = 0.6 * hr * np.exp(-(t - tail_start) / 300.0)
        y = np.convolve(s, h)[:n]
        out.append(y)
        direct.append(s)
    mix = jnp.asarray(np.stack(out)[None])
    dry = jnp.asarray(np.stack(direct)[None])
    spec = _spec_mc(mix)
    yr, yi = wpe_dereverb(spec, filter_length=10, delay=2, iterations=3)
    t, k = yr.shape[2], yr.shape[3]
    wav = istft(yr.reshape(c, t, k), yi.reshape(c, t, k), N_FFT, HOP,
                length=n)[None]
    before = float(jnp.mean(si_snr(mix[0], dry[0])))
    after = float(jnp.mean(si_snr(wav[0], dry[0])))
    assert after > before + 1.0, (before, after)


def test_channel_layers_shapes_and_augment():
    x = jnp.ones((2, 4, 6, 16))
    for mod, shape in [
        (TransformAverageConcatenate(out_features=32), (2, 4, 6, 32)),
        (TransformAttendConcatenate(out_features=32, n_head=2), (2, 4, 6, 32)),
        (ChannelAveragePool(), (2, 6, 16)),
        (ChannelAttentionPool(n_head=2), (2, 6, 16)),
    ]:
        v = mod.init(jax.random.PRNGKey(0), x)
        out = mod.apply(v, x)
        assert out.shape == shape, (type(mod).__name__, out.shape)

    aug = ChannelAugment(permute_channels=True, num_channels_min=2,
                         num_channels_max=4)
    x = jnp.arange(2 * 4 * 8, dtype=jnp.float32).reshape(2, 4, 8)
    y = aug(jax.random.PRNGKey(3), x)
    assert 2 <= y.shape[1] <= 4
    # every output channel is one of the input channels, unmodified
    for ci in range(y.shape[1]):
        diffs = jnp.abs(x - y[:, ci: ci + 1]).sum(axis=(0, 2))
        assert float(jnp.min(diffs)) == 0.0


def test_models_end_to_end():
    tgt, noise = _make_scene(seed=7, noise_scale=0.5)
    mix = tgt + noise
    bf = MaskBasedBeamformerModel({"n_fft": N_FFT, "hop": HOP})
    out = bf.enhance(mix)
    assert out.shape == (1, mix.shape[-1]) and bool(jnp.all(jnp.isfinite(out)))
    # oracle-mask path beats the noisy reference channel
    mask_s, mask_n = _oracle_masks(tgt, noise)
    out2 = bf.enhance_oracle(mix, mask_s, mask_n)
    assert float(si_snr(out2, tgt[:, 0])[0]) > float(si_snr(mix[:, 0], tgt[:, 0])[0])

    wpe = DereverbWPEModel({"n_fft": N_FFT, "hop": HOP, "iterations": 2})
    out3 = wpe.enhance(mix)
    assert out3.shape == mix.shape and bool(jnp.all(jnp.isfinite(out3)))


def test_ssl_patch_mask_train_and_eval():
    from nemo_tpu.models.audio.ssl_pretrain_masking import (
        SSLPretrainWithMaskedPatch, ssl_patch_mask)

    b, c, d, t = 3, 1, 8, 100
    spec = jnp.ones((b, c, d, t))
    lengths = jnp.asarray([100, 60, 25])
    mod = SSLPretrainWithMaskedPatch(patch_size=10, mask_fraction=0.7)
    out = mod(jax.random.PRNGKey(0), spec, lengths, training=True)
    assert out.shape == spec.shape
    # per item: masked frames == ceil(len*0.7/10)*10 capped to valid patches
    frames_masked = np.asarray(t - jnp.sum(out[:, 0, 0, :], axis=-1))
    assert frames_masked[0] == 70  # 7 patches of len 100
    assert frames_masked[1] == 50  # ceil(42/10)=5 patches, cap 6 -> 5
    assert frames_masked[2] == 20  # ceil(17.5/10)=2 patches, cap 2
    # masked frames land only inside the valid region
    assert float(jnp.sum(1 - out[2, 0, 0, 30:])) == 0.0
    # eval mode: deterministic, ~fraction masked, same across items
    oute = mod(jax.random.PRNGKey(1), spec, lengths, training=False)
    oute2 = mod(jax.random.PRNGKey(2), spec, lengths, training=False)
    np.testing.assert_array_equal(np.asarray(oute), np.asarray(oute2))
    frac = float(1 - jnp.mean(oute))
    assert 0.5 < frac < 0.9
    # jit-compatible
    f = jax.jit(lambda r, s, l: ssl_patch_mask(r, s, l, 10, 0.7, True))
    out_j = f(jax.random.PRNGKey(0), spec, lengths)
    np.testing.assert_array_equal(np.asarray(out_j), np.asarray(out))
