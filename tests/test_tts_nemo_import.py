"""TTS `.nemo` import parity: torch mini-reference FastPitch / HiFi-GAN
(re-derived from the reference module math: tts/modules/transformer.py
post-norm FFT blocks, tts/modules/fastpitch.py predictors/regulator,
tts/modules/hifigan_modules.py weight-normed generator) → save as a .nemo
tar with the reference state-dict key naming → import → output parity."""

import math

import numpy as np
import pytest

import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax.numpy as jnp

from nemo_tpu.interop.nemo_import import (
    import_fastpitch_model,
    import_hifigan_model,
)
from tests.test_nemo_import import save_nemo_tar

D, DH, H, FF, NL = 32, 16, 1, 64, 2  # tiny FastPitch geometry


class TMultiHeadAttn(tnn.Module):
    """transformer.py:98 MultiHeadAttn, pre_lnorm=False."""

    def __init__(self, d_model, n_head, d_head):
        super().__init__()
        self.n_head, self.d_head = n_head, d_head
        self.qkv_net = tnn.Linear(d_model, 3 * n_head * d_head)
        self.o_net = tnn.Linear(n_head * d_head, d_model, bias=False)
        self.layer_norm = tnn.LayerNorm(d_model)

    def forward(self, x, key_mask):
        B, T, _ = x.shape
        q, k, v = torch.chunk(self.qkv_net(x), 3, dim=2)
        q = q.view(B, T, self.n_head, self.d_head).permute(0, 2, 1, 3)
        k = k.view(B, T, self.n_head, self.d_head).permute(0, 2, 1, 3)
        v = v.view(B, T, self.n_head, self.d_head).permute(0, 2, 1, 3)
        s = (q @ k.transpose(-2, -1)) / math.sqrt(self.d_head)
        s = s.masked_fill(~key_mask[:, None, None, :], -float("inf"))
        att = torch.softmax(s, dim=-1) @ v
        att = att.permute(0, 2, 1, 3).reshape(B, T, self.n_head * self.d_head)
        return self.layer_norm(x + self.o_net(att))


class TPosFF(tnn.Module):
    """transformer.py:53 PositionwiseConvFF, pre_lnorm=False."""

    def __init__(self, d_model, d_inner, k):
        super().__init__()
        self.CoreNet = tnn.Sequential(
            tnn.Conv1d(d_model, d_inner, k, 1, k // 2),
            tnn.ReLU(),
            tnn.Conv1d(d_inner, d_model, k, 1, k // 2),
            tnn.Dropout(0.0),
        )
        self.layer_norm = tnn.LayerNorm(d_model)

    def forward(self, x):
        core = self.CoreNet(x.transpose(1, 2)).transpose(1, 2)
        return self.layer_norm(x + core)


class TLayer(tnn.Module):
    def __init__(self):
        super().__init__()
        self.dec_attn = TMultiHeadAttn(D, H, DH)
        self.pos_ff = TPosFF(D, FF, 3)

    def forward(self, x, mask):
        x = self.dec_attn(x, mask) * mask[..., None]
        return self.pos_ff(x) * mask[..., None]


class TFFT(tnn.Module):
    """transformer.py:191 FFTransformerDecoder (concat sin|cos positions)."""

    def __init__(self, n_layer, with_emb=0):
        super().__init__()
        if with_emb:
            self.word_emb = tnn.Embedding(with_emb, D, padding_idx=0)
        self.layers = tnn.ModuleList(TLayer() for _ in range(n_layer))

    def forward(self, x, mask):
        if hasattr(self, "word_emb"):
            x = self.word_emb(x)
        T = x.shape[1]
        pos = torch.arange(T, dtype=torch.float32)
        inv = 1 / (10000 ** (torch.arange(0.0, D, 2.0) / D))
        ang = pos[:, None] * inv[None]
        pe = torch.cat([ang.sin(), ang.cos()], dim=1)
        x = x + pe[None] * mask[..., None]
        for l in self.layers:
            x = l(x, mask)
        return x


class TPredictor(tnn.Module):
    """fastpitch.py:107 TemporalPredictor (ConvReLUNorm ×2 + fc)."""

    class CRN(tnn.Module):
        def __init__(self, cin, cout, k):
            super().__init__()
            self.conv = tnn.Conv1d(cin, cout, k, padding=k // 2)
            self.norm = tnn.LayerNorm(cout)

        def forward(self, x):
            h = F.relu(self.conv(x))
            return self.norm(h.transpose(1, 2)).transpose(1, 2)

    def __init__(self, filt=24):
        super().__init__()
        self.layers = tnn.ModuleList([self.CRN(D, filt, 3),
                                      self.CRN(filt, filt, 3)])
        self.fc = tnn.Linear(filt, 1)

    def forward(self, x, mask):
        out = (x * mask[..., None]).transpose(1, 2)
        for l in self.layers:
            out = l(out)
        out = self.fc(out.transpose(1, 2))[..., 0]
        return out * mask


class TFastPitch(tnn.Module):
    """fastpitch.py FastPitchModule inference path (single speaker,
    no energy, durations from the clamp at :84)."""

    def __init__(self, n_sym, n_mels):
        super().__init__()
        self.encoder = TFFT(NL, with_emb=n_sym)
        self.decoder = TFFT(NL)
        self.duration_predictor = TPredictor()
        self.pitch_predictor = TPredictor()
        self.pitch_emb = tnn.Conv1d(1, D, 3, padding=1)
        self.proj = tnn.Linear(D, n_mels)

    def infer(self, tokens, mask, max_dur=75.0):
        enc = self.encoder(tokens, mask)
        log_dur = self.duration_predictor(enc, mask)
        dur = torch.clamp(torch.exp(log_dur) - 1.0, 0.0, max_dur) * mask
        pitch = self.pitch_predictor(enc, mask)
        enc = enc + self.pitch_emb(pitch[:, None]).transpose(1, 2)
        reps = (dur + 0.5).long()
        mel_len = int(reps.sum(1).max())
        # repeat-expand (regulate_len semantics)
        B = tokens.shape[0]
        dec_in = torch.zeros(B, mel_len, D)
        dec_mask = torch.zeros(B, mel_len, dtype=torch.bool)
        for b in range(B):
            t = 0
            for u in range(tokens.shape[1]):
                r = int(reps[b, u])
                dec_in[b, t:t + r] = enc[b, u]
                t += r
            dec_mask[b, :t] = True
        dec = self.decoder(dec_in, dec_mask)
        return self.proj(dec).transpose(1, 2), reps


def test_fastpitch_nemo_import_mel_parity(tmp_path):
    torch.manual_seed(0)
    n_sym, n_mels = 40, 12
    tm = TFastPitch(n_sym, n_mels).eval()
    with torch.no_grad():
        # bias durations to ~5 frames/token so parity covers dozens of
        # frames (a fresh predictor emits ~0 and the test degenerates)
        tm.duration_predictor.fc.bias.fill_(1.8)
    # reference state-dict naming: module tree under `fastpitch.`
    sd = {f"fastpitch.{k}": v for k, v in tm.state_dict().items()}
    cfg = {
        "symbols_embedding_dim": D,
        "n_mel_channels": n_mels,
        "pitch_embedding_kernel_size": 3,
        "max_token_duration": 75,
        "input_fft": {"n_layer": NL, "n_head": H, "d_head": DH,
                      "d_inner": FF, "kernel_size": 3},
        "output_fft": {"n_layer": NL, "n_head": H, "d_head": DH,
                       "d_inner": FF, "kernel_size": 3},
        "duration_predictor": {"filter_size": 24, "kernel_size": 3,
                               "n_layers": 2},
        "pitch_predictor": {"filter_size": 24, "kernel_size": 3,
                            "n_layers": 2},
    }
    p = str(tmp_path / "fp.nemo")
    save_nemo_tar(p, cfg, sd)

    model = import_fastpitch_model(p)
    assert model.net.norm_style == "post" and model.net.pos_concat

    rng = np.random.RandomState(0)
    toks = rng.randint(1, n_sym, (2, 9)).astype(np.int64)
    out = model.net.apply(model.variables, jnp.asarray(toks.astype(np.int32)),
                          jnp.array([9, 9], jnp.int32), train=False)
    ours_dur = np.asarray(out["durations"])
    ours = np.asarray(out["mel"])
    # The torch reference runs each sample UNPADDED (B=1, T=exact — its
    # canonical single-utterance inference): the reference CoreNet conv
    # leaves relu(bias) at materialized pad frames, so its batched outputs
    # depend on the batch pad length; ours are pad-invariant by design
    # (FFTBlock masks the FF intermediate) and equal the unpadded run.
    for b in range(2):
        with torch.no_grad():
            ref_mel, ref_reps = tm.infer(torch.tensor(toks[b:b + 1]),
                                         torch.ones(1, 9, dtype=torch.bool))
        np.testing.assert_array_equal(ours_dur[b:b + 1], ref_reps.numpy())
        tb = int(ours_dur[b].sum())
        assert tb == ref_mel.shape[2] and tb > 20
        np.testing.assert_allclose(ours[b, :, :tb], ref_mel.numpy()[0, :, :tb],
                                   atol=3e-4, rtol=1e-3)


# --------------------------------------------------------------------------
# HiFi-GAN: weight-normed torch generator → import → waveform parity
# --------------------------------------------------------------------------


class TResBlock(tnn.Module):
    def __init__(self, ch, k, dil):
        super().__init__()
        wn = tnn.utils.weight_norm
        self.convs1 = tnn.ModuleList(
            wn(tnn.Conv1d(ch, ch, k, dilation=d, padding=(k * d - d) // 2))
            for d in dil)
        self.convs2 = tnn.ModuleList(
            wn(tnn.Conv1d(ch, ch, k, padding=(k - 1) // 2)) for _ in dil)

    def forward(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            xt = c2(F.leaky_relu(c1(F.leaky_relu(x, 0.1)), 0.1))
            x = xt + x
        return x


class THiFiGen(tnn.Module):
    def __init__(self, n_mels, ups=(4, 4), ks=(8, 8), ch0=16,
                 rks=(3,), rds=((1, 3),)):
        super().__init__()
        wn = tnn.utils.weight_norm
        self.conv_pre = wn(tnn.Conv1d(n_mels, ch0, 7, padding=3))
        self.ups = tnn.ModuleList()
        self.resblocks = tnn.ModuleList()
        ch = ch0
        for u, k in zip(ups, ks):
            self.ups.append(wn(tnn.ConvTranspose1d(ch, ch // 2, k, u,
                                                   padding=(k - u) // 2)))
            ch //= 2
            self.resblocks.append(tnn.ModuleList(
                TResBlock(ch, rk, rd) for rk, rd in zip(rks, rds)))
        self.conv_post = wn(tnn.Conv1d(ch, 1, 7, padding=3))

    def forward(self, x):
        x = self.conv_pre(x)
        for up, group in zip(self.ups, self.resblocks):
            x = up(F.leaky_relu(x, 0.1))
            xs = sum(rb(x) for rb in group)
            x = xs / len(group)
        return torch.tanh(self.conv_post(F.leaky_relu(x, 0.1)))


def test_hifigan_nemo_import_waveform_parity(tmp_path):
    torch.manual_seed(1)
    n_mels = 8
    tm = THiFiGen(n_mels).eval()
    sd = {f"generator.{k}": v for k, v in tm.state_dict().items()}
    cfg = {
        "n_mels": n_mels,
        "generator": {
            "upsample_rates": [4, 4],
            "upsample_kernel_sizes": [8, 8],
            "upsample_initial_channel": 16,
            "resblock_kernel_sizes": [3],
            "resblock_dilation_sizes": [[1, 3]],
        },
    }
    p = str(tmp_path / "hg.nemo")
    save_nemo_tar(p, cfg, sd)

    model = import_hifigan_model(p)
    mel = np.random.RandomState(2).randn(2, n_mels, 20).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(mel)).numpy()[:, 0]
    ours = np.asarray(model.convert_spectrogram_to_audio(jnp.asarray(mel)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)
