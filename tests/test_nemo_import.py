"""Importer numerics: build torch models with reference-style state-dict key
layouts and semantics (independent re-implementations, eval mode), save as a
.nemo-style tar, import through nemo_tpu.interop, and compare forward outputs.
"""

import io
import math
import tarfile

import numpy as np
import pytest
import yaml

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from nemo_tpu.interop.nemo_import import import_ctc_model  # noqa: E402


def save_nemo_tar(path, cfg: dict, state_dict):
    buf = io.BytesIO()
    torch.save(state_dict, buf)
    with tarfile.open(path, "w") as tar:
        data = yaml.safe_dump(cfg).encode()
        info = tarfile.TarInfo("model_config.yaml")
        info.size = len(data)
        tar.addfile(info, io.BytesIO(data))
        w = buf.getvalue()
        info = tarfile.TarInfo("model_weights.ckpt")
        info.size = len(w)
        tar.addfile(info, io.BytesIO(w))


# ---------------------------------------------------------------------------
# torch mini-reference: QuartzNet-style block stack
# ---------------------------------------------------------------------------


class MaskedConv(tnn.Module):
    def __init__(self, cin, cout, k, stride=1, dilation=1, groups=1):
        super().__init__()
        pad = (dilation * (k - 1)) // 2
        self.conv = tnn.Conv1d(cin, cout, k, stride=stride, padding=pad,
                               dilation=dilation, groups=groups, bias=False)

    def forward(self, x):
        return self.conv(x)


class TorchJasperBlock(tnn.Module):
    """Separable block, repeat=2, residual — mconv indices: dw0,pw0,bn0,act,drop,dw1,pw1,bn1."""

    def __init__(self, cin, cout, k):
        super().__init__()
        self.mconv = tnn.ModuleList([
            MaskedConv(cin, cin, k, groups=cin),
            MaskedConv(cin, cout, 1),
            tnn.BatchNorm1d(cout, eps=1e-3),
            tnn.ReLU(),
            tnn.Dropout(0.0),
            MaskedConv(cout, cout, k, groups=cout),
            MaskedConv(cout, cout, 1),
            tnn.BatchNorm1d(cout, eps=1e-3),
        ])
        self.res = tnn.ModuleList([tnn.ModuleList([MaskedConv(cin, cout, 1), tnn.BatchNorm1d(cout, eps=1e-3)])])
        self.mout = tnn.Sequential(tnn.ReLU(), tnn.Dropout(0.0))

    def forward(self, x):
        out = x
        for m in self.mconv:
            out = m(out)
        res = self.res[0][1](self.res[0][0](x))
        return self.mout(out + res)


class TorchQuartzNetCTC(tnn.Module):
    def __init__(self, feat_in=32, ch=32, vocab=28):
        super().__init__()
        blk0 = TorchJasperBlock(feat_in, ch, 33)
        # strip residual for block0 by replacing with a residual-less variant:
        self.encoder = tnn.Module()
        self.encoder.encoder = tnn.ModuleList([blk0])
        self.decoder = tnn.Module()
        self.decoder.decoder_layers = tnn.Sequential(tnn.Conv1d(ch, vocab + 1, 1, bias=True))

    def forward(self, feats):
        x = feats
        for b in self.encoder.encoder:
            x = b(x)
        logits = self.decoder.decoder_layers(x)  # [B, V+1, T]
        return torch.log_softmax(logits.transpose(1, 2), dim=-1)


def test_quartznet_import_numerics(tmp_path):
    torch.manual_seed(0)
    tm = TorchQuartzNetCTC().eval()
    vocab = [" "] + [chr(ord("a") + i) for i in range(26)] + ["'"]
    cfg = {
        "sample_rate": 16000,
        "labels": vocab,
        "preprocessor": {"_target_": "ref.AudioToMelSpectrogramPreprocessor", "features": 32, "dither": 1e-5},
        "encoder": {
            "_target_": "ref.ConvASREncoder",
            "feat_in": 32,
            "jasper": [
                {"filters": 32, "repeat": 2, "kernel": 33, "stride": 1, "dilation": 1,
                 "dropout": 0.0, "residual": True, "separable": True},
            ],
        },
        "decoder": {"_target_": "ref.ConvASRDecoder", "feat_in": 32, "num_classes": 28,
                    "vocabulary": vocab},
    }
    p = str(tmp_path / "qn.nemo")
    save_nemo_tar(p, cfg, tm.state_dict())

    model = import_ctc_model(p)

    feats = np.random.RandomState(0).randn(2, 32, 40).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(feats)).numpy()
    ours, _ = model.net.apply(
        model.variables, jnp.asarray(feats), jnp.array([40, 40]), train=False
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# torch mini-reference: one Conformer layer + subsampling
# ---------------------------------------------------------------------------


class TorchRelPosMHA(tnn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.h, self.dk = h, d // h
        self.linear_q = tnn.Linear(d, d)
        self.linear_k = tnn.Linear(d, d)
        self.linear_v = tnn.Linear(d, d)
        self.linear_out = tnn.Linear(d, d)
        self.linear_pos = tnn.Linear(d, d, bias=False)
        self.pos_bias_u = tnn.Parameter(torch.zeros(h, self.dk))
        self.pos_bias_v = tnn.Parameter(torch.zeros(h, self.dk))

    def forward(self, x, pos_emb):
        B, T, D = x.shape
        q = self.linear_q(x).view(B, T, self.h, self.dk).transpose(1, 2)
        k = self.linear_k(x).view(B, T, self.h, self.dk).transpose(1, 2)
        v = self.linear_v(x).view(B, T, self.h, self.dk).transpose(1, 2)
        p = self.linear_pos(pos_emb).view(1, -1, self.h, self.dk).transpose(1, 2)  # [1,H,2T-1,dk]
        ac = (q + self.pos_bias_u[None, :, None]) @ k.transpose(-2, -1)
        qv = q + self.pos_bias_v[None, :, None]
        # direct gather semantics: bd[i, j] = qv[i] · p[T-1-i+j]
        raw = qv @ p.transpose(-2, -1)  # [B,H,T,2T-1]
        bd = torch.zeros(B, self.h, T, T)
        for i in range(T):
            bd[:, :, i, :] = raw[:, :, i, T - 1 - i : 2 * T - 1 - i]
        att = torch.softmax((ac + bd) / math.sqrt(self.dk), dim=-1)
        out = (att @ v).transpose(1, 2).reshape(B, T, D)
        return self.linear_out(out)


class TorchConformerLayer(tnn.Module):
    def __init__(self, d, h, k=15):
        super().__init__()
        self.norm_feed_forward1 = tnn.LayerNorm(d)
        self.feed_forward1 = tnn.Module()
        self.feed_forward1.linear1 = tnn.Linear(d, 4 * d)
        self.feed_forward1.linear2 = tnn.Linear(4 * d, d)
        self.norm_self_att = tnn.LayerNorm(d)
        self.self_attn = TorchRelPosMHA(d, h)
        self.norm_conv = tnn.LayerNorm(d)
        self.conv = tnn.Module()
        self.conv.pointwise_conv1 = tnn.Conv1d(d, 2 * d, 1)
        self.conv.depthwise_conv = tnn.Conv1d(d, d, k, padding=(k - 1) // 2, groups=d)
        self.conv.batch_norm = tnn.BatchNorm1d(d, eps=1e-5)
        self.conv.pointwise_conv2 = tnn.Conv1d(d, d, 1)
        self.norm_feed_forward2 = tnn.LayerNorm(d)
        self.feed_forward2 = tnn.Module()
        self.feed_forward2.linear1 = tnn.Linear(d, 4 * d)
        self.feed_forward2.linear2 = tnn.Linear(4 * d, d)
        self.norm_out = tnn.LayerNorm(d)

    def _ff(self, ff, x):
        return ff.linear2(tnn.functional.silu(ff.linear1(x)))

    def forward(self, x, pos_emb):
        x = x + 0.5 * self._ff(self.feed_forward1, self.norm_feed_forward1(x))
        x = x + self.self_attn(self.norm_self_att(x), pos_emb)
        h = self.norm_conv(x).transpose(1, 2)
        h = self.conv.pointwise_conv1(h)
        h = tnn.functional.glu(h, dim=1)
        h = self.conv.depthwise_conv(h)
        h = self.conv.batch_norm(h)
        h = tnn.functional.silu(h)
        h = self.conv.pointwise_conv2(h).transpose(1, 2)
        x = x + h
        x = x + 0.5 * self._ff(self.feed_forward2, self.norm_feed_forward2(x))
        return self.norm_out(x)


class TorchConformerCTC(tnn.Module):
    def __init__(self, feat_in=32, d=32, h=4, vocab=28, layers=1, k=15):
        super().__init__()
        self.d = d
        self.encoder = tnn.Module()
        self.encoder.pre_encode = tnn.Module()
        self.encoder.pre_encode.conv = tnn.Sequential(
            tnn.Conv2d(1, d, 3, 2, 1), tnn.ReLU(), tnn.Conv2d(d, d, 3, 2, 1), tnn.ReLU()
        )
        f_out = feat_in
        for _ in range(2):
            f_out = (f_out - 1) // 2 + 1
        self.encoder.pre_encode.out = tnn.Linear(d * f_out, d)
        self.encoder.layers = tnn.ModuleList(
            [TorchConformerLayer(d, h, k) for _ in range(layers)])
        self.decoder = tnn.Module()
        self.decoder.decoder_layers = tnn.Sequential(tnn.Conv1d(d, vocab + 1, 1))

    def pos_table(self, T):
        pos = torch.arange(T - 1, -T, -1, dtype=torch.float32)
        inv = torch.exp(torch.arange(0, self.d, 2, dtype=torch.float32) * -(math.log(10000.0) / self.d))
        pe = torch.zeros(len(pos), self.d)
        pe[:, 0::2] = torch.sin(pos[:, None] * inv[None])
        pe[:, 1::2] = torch.cos(pos[:, None] * inv[None])
        return pe[None]

    def forward(self, feats):
        x = feats.transpose(1, 2).unsqueeze(1)  # [B,1,T,F]
        x = self.encoder.pre_encode.conv(x)
        b, c, t, f = x.shape
        x = self.encoder.pre_encode.out(x.transpose(1, 2).reshape(b, t, c * f))
        x = x * math.sqrt(self.d)
        pos = self.pos_table(t)
        for l in self.encoder.layers:
            x = l(x, pos)
        logits = self.decoder.decoder_layers(x.transpose(1, 2))
        return torch.log_softmax(logits.transpose(1, 2), dim=-1)


def test_conformer_import_numerics(tmp_path):
    torch.manual_seed(0)
    tm = TorchConformerCTC().eval()
    # randomize pos biases so the rel-pos path is actually exercised
    with torch.no_grad():
        tm.encoder.layers[0].self_attn.pos_bias_u.normal_(0, 0.5)
        tm.encoder.layers[0].self_attn.pos_bias_v.normal_(0, 0.5)
    vocab = [" "] + [chr(ord("a") + i) for i in range(26)] + ["'"]
    cfg = {
        "sample_rate": 16000,
        "labels": vocab,
        "preprocessor": {"_target_": "ref.AudioToMelSpectrogramPreprocessor", "features": 32, "dither": 1e-5},
        "encoder": {
            "_target_": "ref.ConformerEncoder",
            "feat_in": 32, "n_layers": 1, "d_model": 32, "n_heads": 4,
            "subsampling": "striding", "subsampling_factor": 4,
            "subsampling_conv_channels": -1, "ff_expansion_factor": 4,
            "conv_kernel_size": 15, "conv_norm_type": "batch_norm",
            "dropout": 0.0, "dropout_att": 0.0, "xscaling": True, "pos_emb_max_len": 5000,
        },
        "decoder": {"_target_": "ref.ConvASRDecoder", "feat_in": 32, "num_classes": 28,
                    "vocabulary": vocab},
    }
    p = str(tmp_path / "cf.nemo")
    save_nemo_tar(p, cfg, tm.state_dict())
    model = import_ctc_model(p)

    feats = np.random.RandomState(0).randn(2, 32, 64).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(feats)).numpy()
    ours, _ = model.net.apply(
        model.variables, jnp.asarray(feats), jnp.array([64, 64]), train=False
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-4, rtol=1e-3)


class TorchPredJoint(tnn.Module):
    """torch mini-reference: RNNT prediction (embed+LSTM) + joint, reference
    key layout (decoder.prediction.*, joint.*)."""

    def __init__(self, vocab=10, H=16, joint=12, enc_h=8):
        super().__init__()
        self.decoder = tnn.Module()
        self.decoder.prediction = tnn.ModuleDict({
            "embed": tnn.Embedding(vocab + 1, H, padding_idx=vocab),
            "dec_rnn": tnn.Module(),
        })
        self.decoder.prediction["dec_rnn"].lstm = tnn.LSTM(H, H, num_layers=1, batch_first=True)
        self.joint = tnn.Module()
        self.joint.enc = tnn.Linear(enc_h, joint)
        self.joint.pred = tnn.Linear(H, joint)
        self.joint.joint_net = tnn.Sequential(tnn.ReLU(), tnn.Linear(joint, vocab + 1))

    def pred_forward(self, tokens):  # [B, U] with SOS prepended as blank id
        x = self.decoder.prediction["embed"](tokens)
        out, _ = self.decoder.prediction["dec_rnn"].lstm(x)
        return out

    def joint_forward(self, enc, pred):
        h = self.joint.enc(enc) + self.joint.pred(pred)
        return self.joint.joint_net(h)


@pytest.mark.slow
def test_rnnt_prediction_joint_import_numerics():
    from nemo_tpu.core.config import ConfigDict
    from nemo_tpu.interop.nemo_import import convert_rnnt_state
    from nemo_tpu.models.asr.rnnt_models import EncDecRNNTModel, _RNNTNet

    torch.manual_seed(0)
    vocab, H, J, EH = 10, 16, 12, 8
    tm = TorchPredJoint(vocab, H, J, EH).eval()

    labels = [str(i) for i in range(vocab)]
    cfg = ConfigDict(
        sample_rate=16000, labels=labels,
        preprocessor={"features": 8, "dither": 0.0},
        encoder={"feat_in": 8, "jasper": [
            {"filters": EH, "repeat": 1, "kernel": 3, "separable": False}]},
        decoder={"pred_hidden": H, "pred_rnn_layers": 1, "vocabulary": labels},
        joint={"joint_hidden": J},
    )
    model = EncDecRNNTModel(cfg)

    # synthesize an encoder state dict so conversion has all keys
    sd = {k: v for k, v in tm.state_dict().items()}
    enc_t = TorchQuartzNetCTC.__new__(TorchQuartzNetCTC)  # not used
    # minimal ConvASR keys for one non-separable block
    import torch as _t
    sd["encoder.encoder.0.mconv.0.conv.weight"] = _t.randn(EH, 8, 3)
    sd["encoder.encoder.0.mconv.1.weight"] = _t.ones(EH)
    sd["encoder.encoder.0.mconv.1.bias"] = _t.zeros(EH)
    sd["encoder.encoder.0.mconv.1.running_mean"] = _t.zeros(EH)
    sd["encoder.encoder.0.mconv.1.running_var"] = _t.ones(EH)
    sd = {k: (v.detach().numpy() if hasattr(v, "detach") else v) for k, v in sd.items()}

    model.variables = convert_rnnt_state(cfg, sd, pred_rnn_layers=1)

    # prediction parity: torch runs [SOS(=blank id), y1, y2]; ours runs targets
    tokens = np.array([[3, 7]], np.int64)
    with torch.no_grad():
        t_in = torch.tensor(np.concatenate([[[vocab]], tokens], axis=1))
        ref_pred = tm.pred_forward(t_in).numpy()  # [1, 3, H]
    ours_pred = np.asarray(model.net.apply(
        model.variables, jnp.asarray(tokens.astype(np.int32)),
        method=type(model.net).predict,
    ))
    np.testing.assert_allclose(ours_pred, ref_pred, atol=1e-5)

    # joint parity
    enc_vec = np.random.RandomState(0).randn(1, EH).astype(np.float32)
    with torch.no_grad():
        ref_j = tm.joint_forward(torch.tensor(enc_vec), torch.tensor(ref_pred[:, -1])).numpy()
    ours_j = np.asarray(model.net.apply(
        model.variables, jnp.asarray(enc_vec), jnp.asarray(ours_pred[:, -1]),
        method=type(model.net).joint_logits,
    ))
    np.testing.assert_allclose(ours_j, ref_j, atol=1e-5)
