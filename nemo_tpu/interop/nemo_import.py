"""`.nemo` checkpoint importer: reference archives → nemo_tpu models.

Reference formats (SURVEY.md §5.4): `.nemo` = tar of `model_config.yaml` +
`model_weights.ckpt` (torch state dict) + artifacts
(save_restore_connector.py:49). This module converts:
- config: reference YAML (ASR config contract, SURVEY.md §2.4) → our ConfigDict
- weights: torch name/layout → flax variable tree
  (Conv1d [out,in/g,k]→[k,in/g,out]; Conv2d [out,in,kh,kw]→[kh,kw,in,out];
   Linear [out,in]→[in,out]; BN weight/bias/running_* → scale/bias + batch_stats)

Torch key layouts handled (verified against reference module definitions):
- ConvASREncoder:  encoder.encoder.{b}.mconv.{j}.(conv.weight|weight|bias|running_*)
                   with per-repeat mconv strides of 5 (separable: dw,pw,bn,act,drop)
                   or 4 (conv,bn,act,drop); last repeat omits act/drop; optional
                   res.0.{0,1} pointwise+BN; optional trailing SqueezeExcite
                   (jasper.py:743-844)
- ConformerEncoder: encoder.pre_encode.conv.{i}.*, encoder.pre_encode.out.*,
                   encoder.layers.{i}.{norm_*,feed_forward1/2.linear1/2,
                   self_attn.linear_{q,k,v,out,pos},self_attn.pos_bias_{u,v},
                   conv.pointwise_conv1/2,conv.depthwise_conv,conv.batch_norm}
                   (conformer_modules.py:94-158,277-311)
- ConvASRDecoder:  decoder.decoder_layers.0.{weight,bias}
"""

from __future__ import annotations

import io
import tarfile
from typing import Any, Dict, Tuple

import numpy as np
import yaml

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.utils.logging import logging


# ---------------------------------------------------------------------------
# Archive reading
# ---------------------------------------------------------------------------


def load_nemo_archive(path: str) -> Tuple[ConfigDict, Dict[str, np.ndarray]]:
    """Read (model_config, torch state dict as numpy) from a .nemo tar."""
    import torch

    with tarfile.open(path, "r:*") as tar:
        names = tar.getnames()
        if any(n.startswith("/") or ".." in n for n in names):
            raise ValueError("Unsafe tar member paths")
        cfg_name = next(n for n in names if n.endswith("model_config.yaml"))
        cfg = ConfigDict(yaml.safe_load(tar.extractfile(cfg_name).read()))
        wname = next(
            n for n in names if n.endswith("model_weights.ckpt") or n.endswith(".pt")
        )
        buf = io.BytesIO(tar.extractfile(wname).read())
    sd = torch.load(buf, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return cfg, {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}


# ---------------------------------------------------------------------------
# Layout converters
# ---------------------------------------------------------------------------


def t2f_conv1d(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 1, 0))


def t2f_conv2d(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def t2f_linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w)


class _Tree:
    def __init__(self):
        self.params: Dict[str, Any] = {}
        self.batch_stats: Dict[str, Any] = {}

    @staticmethod
    def _set(root: dict, path: str, value: np.ndarray):
        parts = path.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(value)

    def p(self, path: str, value: np.ndarray):
        self._set(self.params, path, value)

    def bs(self, path: str, value: np.ndarray):
        self._set(self.batch_stats, path, value)

    def bn(self, our: str, sd: Dict[str, np.ndarray], torch_prefix: str):
        self.p(f"{our}/scale", sd[f"{torch_prefix}.weight"])
        self.p(f"{our}/bias", sd[f"{torch_prefix}.bias"])
        self.bs(f"{our}/mean", sd[f"{torch_prefix}.running_mean"])
        self.bs(f"{our}/var", sd[f"{torch_prefix}.running_var"])

    def ln(self, our: str, sd: Dict[str, np.ndarray], torch_prefix: str):
        self.p(f"{our}/scale", sd[f"{torch_prefix}.weight"])
        self.p(f"{our}/bias", sd[f"{torch_prefix}.bias"])

    def dense(self, our: str, sd: Dict[str, np.ndarray], torch_prefix: str):
        self.p(f"{our}/kernel", t2f_linear(sd[f"{torch_prefix}.weight"]))
        if f"{torch_prefix}.bias" in sd:
            self.p(f"{our}/bias", sd[f"{torch_prefix}.bias"])

    def conv1d_as_dense(self, our: str, sd: Dict[str, np.ndarray], torch_prefix: str):
        """torch Conv1d k=1 [out,in,1] → flax Dense [in,out]."""
        w = sd[f"{torch_prefix}.weight"][:, :, 0]
        self.p(f"{our}/kernel", t2f_linear(w))
        if f"{torch_prefix}.bias" in sd:
            self.p(f"{our}/bias", sd[f"{torch_prefix}.bias"])

    def variables(self) -> Dict[str, Any]:
        out = {"params": self.params}
        if self.batch_stats:
            out["batch_stats"] = self.batch_stats
        return out


# ---------------------------------------------------------------------------
# ConvASR (Jasper/QuartzNet/Citrinet) encoder conversion
# ---------------------------------------------------------------------------


def convert_conv_asr(jasper_cfg, sd: Dict[str, np.ndarray], tree: _Tree, prefix="encoder"):
    for b, blk in enumerate(jasper_cfg):
        blk = dict(blk)
        repeat = int(blk.get("repeat", 1))
        separable = bool(blk.get("separable", False))
        tb = f"encoder.encoder.{b}"
        ours = f"{prefix}/block{b}"
        idx = 0
        for r in range(repeat):
            if separable:
                tree.p(f"{ours}/dw{r}/conv/kernel", t2f_conv1d(sd[f"{tb}.mconv.{idx}.conv.weight"]))
                tree.p(f"{ours}/pw{r}/conv/kernel", t2f_conv1d(sd[f"{tb}.mconv.{idx+1}.conv.weight"]))
                tree.bn(f"{ours}/bn{r}", sd, f"{tb}.mconv.{idx+2}")
                idx += 3
            else:
                tree.p(f"{ours}/conv{r}/conv/kernel", t2f_conv1d(sd[f"{tb}.mconv.{idx}.conv.weight"]))
                tree.bn(f"{ours}/bn{r}", sd, f"{tb}.mconv.{idx+1}")
                idx += 2
            if r < repeat - 1:
                idx += 2  # activation + dropout entries hold no params
        if bool(blk.get("residual", False)):
            tree.p(f"{ours}/res_pw/conv/kernel", t2f_conv1d(sd[f"{tb}.res.0.0.conv.weight"]))
            tree.bn(f"{ours}/res_bn", sd, f"{tb}.res.0.1")
        if bool(blk.get("se", False)):
            tree.dense(f"{ours}/se/fc1", sd, f"{tb}.mconv.{idx}.fc.0")
            tree.dense(f"{ours}/se/fc2", sd, f"{tb}.mconv.{idx}.fc.2")


# ---------------------------------------------------------------------------
# Conformer encoder conversion
# ---------------------------------------------------------------------------


def convert_conformer(enc_cfg, sd: Dict[str, np.ndarray], tree: _Tree, prefix="encoder"):
    import math

    n_layers = int(enc_cfg["n_layers"])
    subsampling = str(enc_cfg.get("subsampling", "striding"))
    factor = int(enc_cfg.get("subsampling_factor", 4))
    n_sub = int(math.log2(factor))

    # pre_encode convs: torch Sequential indices skip activations
    t_idx = 0
    for i in range(n_sub):
        if subsampling == "dw_striding" and i > 0:
            tree.p(
                f"{prefix}/pre_encode/dw{i}/kernel",
                t2f_conv2d(sd[f"encoder.pre_encode.conv.{t_idx}.weight"]),
            )
            tree.p(f"{prefix}/pre_encode/dw{i}/bias", sd[f"encoder.pre_encode.conv.{t_idx}.bias"])
            tree.p(
                f"{prefix}/pre_encode/pw{i}/kernel",
                t2f_conv2d(sd[f"encoder.pre_encode.conv.{t_idx+1}.weight"]),
            )
            tree.p(f"{prefix}/pre_encode/pw{i}/bias", sd[f"encoder.pre_encode.conv.{t_idx+1}.bias"])
            t_idx += 3  # dw, pw, act
        else:
            tree.p(
                f"{prefix}/pre_encode/conv{i}/kernel",
                t2f_conv2d(sd[f"encoder.pre_encode.conv.{t_idx}.weight"]),
            )
            tree.p(f"{prefix}/pre_encode/conv{i}/bias", sd[f"encoder.pre_encode.conv.{t_idx}.bias"])
            t_idx += 2  # conv, act

    # pre_encode.out: torch flattens [B,C,T,F]→(c,f); ours is [B,T,F,C]→(f,c).
    w = sd["encoder.pre_encode.out.weight"]  # [d_model, C*F]
    d_model = w.shape[0]
    conv_ch = int(enc_cfg.get("subsampling_conv_channels") or -1)
    if conv_ch <= 0:
        conv_ch = d_model
    f_out = w.shape[1] // conv_ch
    w = w.reshape(d_model, conv_ch, f_out).transpose(0, 2, 1).reshape(d_model, f_out * conv_ch)
    tree.p(f"{prefix}/pre_encode/out/kernel", t2f_linear(w))
    tree.p(f"{prefix}/pre_encode/out/bias", sd["encoder.pre_encode.out.bias"])

    for i in range(n_layers):
        tl = f"encoder.layers.{i}"
        ol = f"{prefix}/layer{i}"
        tree.ln(f"{ol}/norm_ff1", sd, f"{tl}.norm_feed_forward1")
        tree.dense(f"{ol}/ff1/linear1", sd, f"{tl}.feed_forward1.linear1")
        tree.dense(f"{ol}/ff1/linear2", sd, f"{tl}.feed_forward1.linear2")
        tree.ln(f"{ol}/norm_attn", sd, f"{tl}.norm_self_att")
        for name in ("q", "k", "v", "out"):
            tree.dense(f"{ol}/attn/linear_{name}", sd, f"{tl}.self_attn.linear_{name}")
        tree.dense(f"{ol}/attn/linear_pos", sd, f"{tl}.self_attn.linear_pos")
        H = int(enc_cfg["n_heads"])
        tree.p(f"{ol}/attn/pos_bias_u", sd[f"{tl}.self_attn.pos_bias_u"].reshape(H, -1))
        tree.p(f"{ol}/attn/pos_bias_v", sd[f"{tl}.self_attn.pos_bias_v"].reshape(H, -1))
        tree.ln(f"{ol}/norm_conv", sd, f"{tl}.norm_conv")
        tree.conv1d_as_dense(f"{ol}/conv/pointwise1", sd, f"{tl}.conv.pointwise_conv1")
        tree.p(
            f"{ol}/conv/depthwise/kernel", t2f_conv1d(sd[f"{tl}.conv.depthwise_conv.weight"])
        )
        if f"{tl}.conv.depthwise_conv.bias" in sd:
            tree.p(f"{ol}/conv/depthwise/bias", sd[f"{tl}.conv.depthwise_conv.bias"])
        norm_type = str(enc_cfg.get("conv_norm_type", "batch_norm"))
        if norm_type == "batch_norm":
            tree.bn(f"{ol}/conv/norm", sd, f"{tl}.conv.batch_norm")
        else:
            tree.ln(f"{ol}/conv/norm", sd, f"{tl}.conv.batch_norm")
        tree.conv1d_as_dense(f"{ol}/conv/pointwise2", sd, f"{tl}.conv.pointwise_conv2")
        tree.ln(f"{ol}/norm_ff2", sd, f"{tl}.norm_feed_forward2")
        tree.dense(f"{ol}/ff2/linear1", sd, f"{tl}.feed_forward2.linear1")
        tree.dense(f"{ol}/ff2/linear2", sd, f"{tl}.feed_forward2.linear2")
        tree.ln(f"{ol}/norm_out", sd, f"{tl}.norm_out")


# ---------------------------------------------------------------------------
# Config + model conversion
# ---------------------------------------------------------------------------


def convert_asr_config(nemo_cfg: ConfigDict) -> ConfigDict:
    """Reference model_config.yaml → our EncDecCTCModel config."""
    cfg = ConfigDict()
    cfg.sample_rate = nemo_cfg.get("sample_rate", 16000)
    labels = nemo_cfg.get("labels") or nemo_cfg.get("decoder", {}).get("vocabulary")
    if labels is not None:
        cfg.labels = list(labels)
    pre = dict(nemo_cfg.get("preprocessor", {}))
    pre.pop("_target_", None)
    cfg.preprocessor = pre
    enc = dict(nemo_cfg.get("encoder", {}))
    tgt = enc.pop("_target_", "")
    if tgt.endswith("ConformerEncoder"):
        enc["_target_"] = "nemo_tpu.models.asr.modules.conformer.ConformerEncoder"
    cfg.encoder = enc
    dec = dict(nemo_cfg.get("decoder", {}))
    dec.pop("_target_", None)
    cfg.decoder = dec
    return cfg


def import_ctc_model(path: str):
    """`.nemo` CTC checkpoint (QuartzNet/Jasper/Citrinet/Conformer-CTC) →
    EncDecCTCModel with converted weights (reference: llm.import_ckpt-style
    connector flow, io/connector.py:86)."""
    from nemo_tpu.models.asr.ctc_models import EncDecCTCModel

    nemo_cfg, sd = load_nemo_archive(path)
    cfg = convert_asr_config(nemo_cfg)
    model = EncDecCTCModel(cfg, init_params=True)
    model.variables = convert_ctc_state(cfg, sd)
    logging.info(f"Imported .nemo checkpoint from {path}")
    return model


def convert_ctc_state(cfg: ConfigDict, sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree = _Tree()
    enc = cfg.encoder
    if "d_model" in enc or str(enc.get("_target_", "")).endswith("ConformerEncoder"):
        convert_conformer(enc, sd, tree)
    else:
        convert_conv_asr(enc["jasper"], sd, tree)
    # decoder: Conv1d k=1 → our nn.Conv (1,in,out) kernel
    w = sd["decoder.decoder_layers.0.weight"]  # [V+1, C, 1]
    tree.p("decoder/proj/kernel", np.transpose(w, (2, 1, 0)))
    tree.p("decoder/proj/bias", sd["decoder.decoder_layers.0.bias"])
    return tree.variables()


# ---------------------------------------------------------------------------
# RNNT / Transducer conversion (Conformer-Transducer .nemo)
# ---------------------------------------------------------------------------


def _t2f_lstm(tree: _Tree, our: str, sd: Dict[str, np.ndarray], torch_prefix: str,
              layer: int) -> None:
    """torch LSTM layer → flax OptimizedLSTMCell params.

    torch packs gates (i, f, g, o) along dim 0 of weight_ih/weight_hh
    [4H, in]; flax keeps per-gate Dense kernels [in, H] named
    {i,h}{i,f,g,o}, with bias only on the hidden side → bias = b_ih + b_hh.
    """
    w_ih = sd[f"{torch_prefix}.weight_ih_l{layer}"]
    w_hh = sd[f"{torch_prefix}.weight_hh_l{layer}"]
    b = sd[f"{torch_prefix}.bias_ih_l{layer}"] + sd[f"{torch_prefix}.bias_hh_l{layer}"]
    H = w_hh.shape[1]
    gates = ("i", "f", "g", "o")
    for g_i, g in enumerate(gates):
        sl = slice(g_i * H, (g_i + 1) * H)
        tree.p(f"{our}/i{g}/kernel", np.transpose(w_ih[sl]))
        tree.p(f"{our}/h{g}/kernel", np.transpose(w_hh[sl]))
        tree.p(f"{our}/h{g}/bias", b[sl])


def convert_rnnt_state(cfg: ConfigDict, sd: Dict[str, np.ndarray],
                       pred_rnn_layers: int = 1) -> Dict[str, Any]:
    """Reference EncDecRNNTModel state dict → our _RNNTNet variables.

    Torch layout (asr/modules/rnnt.py): decoder.prediction.embed (blank_as_pad:
    V+1 rows, blank row ≡ 0 = our zero-SOS), decoder.prediction.dec_rnn.lstm.*,
    joint.{enc,pred}.{weight,bias}, joint.joint_net.<last>.{weight,bias}.
    """
    tree = _Tree()
    enc = cfg.encoder
    if "d_model" in enc or str(enc.get("_target_", "")).endswith("ConformerEncoder"):
        convert_conformer(enc, sd, tree)
    else:
        convert_conv_asr(enc["jasper"], sd, tree)

    # prediction net: drop the blank/pad row (ours embeds V tokens, SOS = zeros)
    emb = sd["decoder.prediction.embed.weight"]
    vocab = len(cfg.get("labels") or cfg.decoder.vocabulary)
    tree.p("prediction/embed/embedding", emb[:vocab])
    for i in range(pred_rnn_layers):
        _t2f_lstm(tree, f"prediction/rnn/lstm{i}", sd,
                  "decoder.prediction.dec_rnn.lstm", i)

    tree.dense("joint/enc_proj", sd, "joint.enc")
    tree.dense("joint/pred_proj", sd, "joint.pred")
    out_key = next(
        k[: -len(".weight")] for k in sd
        if k.startswith("joint.joint_net.") and k.endswith(".weight")
    )
    tree.dense("joint/out_proj", sd, out_key)
    return tree.variables()


def import_rnnt_model(path: str):
    """`.nemo` transducer checkpoint → EncDecRNNTModel."""
    from nemo_tpu.models.asr.rnnt_models import EncDecRNNTModel

    nemo_cfg, sd = load_nemo_archive(path)
    cfg = convert_asr_config(nemo_cfg)
    if "decoder" in nemo_cfg:
        pn = nemo_cfg.decoder.get("prednet", {})
        cfg.decoder = {
            "pred_hidden": pn.get("pred_hidden", 640),
            "pred_rnn_layers": pn.get("pred_rnn_layers", 1),
            "vocabulary": cfg.get("labels"),
        }
    if "joint" in nemo_cfg:
        jn = nemo_cfg.joint.get("jointnet", {})
        cfg.joint = {"joint_hidden": jn.get("joint_hidden", 640)}
    model = EncDecRNNTModel(cfg, init_params=True)
    model.variables = convert_rnnt_state(
        cfg, sd, pred_rnn_layers=int(cfg.decoder.get("pred_rnn_layers", 1))
    )
    logging.info(f"Imported transducer .nemo checkpoint from {path}")
    return model


def model_from_reference_yaml(path: str, labels=None, overrides=None):
    """Build an EncDecCTCModel from a reference example config YAML
    (SURVEY §2.4 config contract: `examples/asr/conf/**` — model node with
    `_target_` submodules, e.g. conformer/conformer_ctc_bpe.yaml).

    BPE configs carry `decoder.num_classes: -1` + a tokenizer dir instead
    of an explicit vocabulary — pass `labels=` (the tokenizer's vocab) for
    those. `overrides` is a dotted-key dict applied after conversion."""
    from nemo_tpu.core.config import load_yaml, resolve_interpolations
    from nemo_tpu.models.asr.ctc_models import EncDecCTCModel

    raw = resolve_interpolations(load_yaml(path))
    model_node = raw.get("model", raw)  # example YAMLs wrap under `model:`
    cfg = convert_asr_config(model_node)
    if labels is not None:
        cfg.labels = list(labels)
        if "decoder" in cfg:
            cfg.decoder.vocabulary = list(labels)
            cfg.decoder.num_classes = len(labels)
    if not cfg.get("labels"):
        raise ValueError(
            "config carries no vocabulary (BPE/tokenizer config) — pass "
            "labels=[...] with the tokenizer's tokens")
    for k, v in (overrides or {}).items():
        node = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    return EncDecCTCModel(cfg)


# ---------------------------------------------------------------------------
# TTS: FastPitch conversion (reference tts/models/fastpitch.py:169 — the
# module tree lives under the `fastpitch.` prefix; layer layouts per
# tts/modules/transformer.py + tts/modules/fastpitch.py)
# ---------------------------------------------------------------------------


def convert_fastpitch_config(nemo_cfg: ConfigDict, sd) -> ConfigDict:
    """Reference FastPitch YAML (examples/tts/conf/fastpitch_align_v1.05.yaml
    model node: input_fft/output_fft/duration_predictor/pitch_predictor) →
    FastPitchModel ConfigDict in reference-compat mode (post-norm FFT blocks,
    concatenated sin|cos positions, decoupled d_head)."""
    in_fft = nemo_cfg.get("input_fft", ConfigDict())
    out_fft = nemo_cfg.get("output_fft", ConfigDict())
    dp = nemo_cfg.get("duration_predictor", ConfigDict())
    d_model = int(nemo_cfg.get("symbols_embedding_dim",
                               in_fft.get("d_model", 384)))
    n_symbols = int(sd["fastpitch.encoder.word_emb.weight"].shape[0])
    return ConfigDict(
        n_symbols=n_symbols,
        n_mels=int(nemo_cfg.get("n_mel_channels", 80)),
        d_model=d_model,
        n_heads=int(in_fft.get("n_head", 1)),
        d_head=int(in_fft.get("d_head", 64)),
        d_ff=int(in_fft.get("d_inner", 1536)),
        enc_layers=int(in_fft.get("n_layer", 6)),
        dec_layers=int(out_fft.get("n_layer", 6)),
        kernel_size=int(in_fft.get("kernel_size", 3)),
        pitch_embedding_kernel=int(
            nemo_cfg.get("pitch_embedding_kernel_size", 3)),
        max_token_duration=int(nemo_cfg.get("max_token_duration", 75)),
        predictor_filter_size=int(dp.get("filter_size", 256)),
        predictor_kernel_size=int(dp.get("kernel_size", 3)),
        predictor_n_layers=int(dp.get("n_layers", 2)),
        norm_style="post",
        pos_concat=True,
    )


def _convert_fft_stack(tree: _Tree, sd, our_prefix: str, t_prefix: str,
                       n_layers: int):
    """FFTransformer{Encoder,Decoder} layers → our post-norm FFTBlocks.

    Torch keys per layer (transformer.py:98-189): dec_attn.qkv_net
    (fused [3·H·dh, D] + bias → split thirds into q/k/v), dec_attn.o_net
    (no bias), dec_attn.layer_norm (post-attention), pos_ff.CoreNet.{0,2}
    (two Conv1d), pos_ff.layer_norm (post-FF)."""
    for i in range(n_layers):
        t = f"{t_prefix}.layers.{i}"
        o = f"{our_prefix}/layer{i}"
        qkv_w = sd[f"{t}.dec_attn.qkv_net.weight"]
        qkv_b = sd[f"{t}.dec_attn.qkv_net.bias"]
        third = qkv_w.shape[0] // 3
        for j, name in enumerate(("q", "k", "v")):
            tree.p(f"{o}/{name}/kernel",
                   t2f_linear(qkv_w[j * third:(j + 1) * third]))
            tree.p(f"{o}/{name}/bias", qkv_b[j * third:(j + 1) * third])
        tree.p(f"{o}/o/kernel", t2f_linear(sd[f"{t}.dec_attn.o_net.weight"]))
        tree.ln(f"{o}/norm1", sd, f"{t}.dec_attn.layer_norm")
        tree.p(f"{o}/ff1/kernel", t2f_conv1d(sd[f"{t}.pos_ff.CoreNet.0.weight"]))
        tree.p(f"{o}/ff1/bias", sd[f"{t}.pos_ff.CoreNet.0.bias"])
        tree.p(f"{o}/ff2/kernel", t2f_conv1d(sd[f"{t}.pos_ff.CoreNet.2.weight"]))
        tree.p(f"{o}/ff2/bias", sd[f"{t}.pos_ff.CoreNet.2.bias"])
        tree.ln(f"{o}/norm2", sd, f"{t}.pos_ff.layer_norm")


def _convert_temporal_predictor(tree: _Tree, sd, our_prefix: str,
                                t_prefix: str, n_layers: int = 2):
    """TemporalPredictor (fastpitch.py:107): ConvReLUNorm layers + fc."""
    for i in range(n_layers):
        tree.p(f"{our_prefix}/conv{i}/kernel",
               t2f_conv1d(sd[f"{t_prefix}.layers.{i}.conv.weight"]))
        tree.p(f"{our_prefix}/conv{i}/bias", sd[f"{t_prefix}.layers.{i}.conv.bias"])
        tree.ln(f"{our_prefix}/norm{i}", sd, f"{t_prefix}.layers.{i}.norm")
    tree.dense(f"{our_prefix}/fc", sd, f"{t_prefix}.fc")


def convert_fastpitch_state(cfg: ConfigDict, sd) -> Dict[str, Any]:
    if any(k.startswith("fastpitch.speaker_emb") for k in sd):
        logging.warning("multi-speaker FastPitch: speaker_emb ignored "
                        "(imported as single-speaker)")
    if any(k.startswith("fastpitch.energy_") for k in sd):
        logging.warning("energy conditioning weights present but not "
                        "imported (energy predictor unsupported)")
    tree = _Tree()
    tree.p("symbol_emb/embedding", sd["fastpitch.encoder.word_emb.weight"])
    _convert_fft_stack(tree, sd, "encoder", "fastpitch.encoder",
                       int(cfg.enc_layers))
    _convert_fft_stack(tree, sd, "decoder", "fastpitch.decoder",
                       int(cfg.dec_layers))
    _convert_temporal_predictor(tree, sd, "duration_predictor",
                                "fastpitch.duration_predictor",
                                int(cfg.get("predictor_n_layers", 2)))
    _convert_temporal_predictor(tree, sd, "pitch_predictor",
                                "fastpitch.pitch_predictor",
                                int(cfg.get("predictor_n_layers", 2)))
    tree.p("pitch_emb/kernel", t2f_conv1d(sd["fastpitch.pitch_emb.weight"]))
    tree.p("pitch_emb/bias", sd["fastpitch.pitch_emb.bias"])
    tree.dense("mel_proj", sd, "fastpitch.proj")
    return tree.variables()


def import_fastpitch_model(path: str):
    """`.nemo` FastPitch checkpoint → FastPitchModel (inference parity:
    post-norm FFT stacks, duration clamp per modules/fastpitch.py:84)."""
    from nemo_tpu.models.tts.fastpitch_model import FastPitchModel

    nemo_cfg, sd = load_nemo_archive(path)
    cfg = convert_fastpitch_config(nemo_cfg, sd)
    model = FastPitchModel(cfg, init_params=True)
    model.variables = convert_fastpitch_state(cfg, sd)
    logging.info(f"Imported FastPitch .nemo checkpoint from {path}")
    return model


# ---------------------------------------------------------------------------
# TTS: HiFi-GAN conversion (reference tts/models/hifigan.py — generator
# under the `generator.` prefix; every conv is weight-normed)
# ---------------------------------------------------------------------------


def _wn_weight(sd, prefix: str) -> np.ndarray:
    """Resolve a (possibly) weight-normed torch conv weight:
    w = g · v / ‖v‖ with the norm over all dims except 0 (torch
    weight_norm default dim=0). Plain `.weight` passes through."""
    if f"{prefix}.weight" in sd:
        return sd[f"{prefix}.weight"]
    g = sd[f"{prefix}.weight_g"]
    v = sd[f"{prefix}.weight_v"]
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt(np.sum(v.astype(np.float64) ** 2, axis=axes, keepdims=True))
    return (g * (v / norm)).astype(v.dtype)


def t2f_convtranspose1d(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose1d [in, out, k] → flax ConvTranspose [k, in, out]
    (flax's default transpose_kernel=False applies the kernel mirrored
    relative to torch's gradient-of-conv semantics, so flip taps)."""
    return np.transpose(w, (2, 0, 1))[::-1]


def convert_hifigan_state(gen_cfg: ConfigDict, sd) -> Dict[str, Any]:
    tree = _Tree()
    pre = _wn_weight(sd, "generator.conv_pre")
    tree.p("pre/kernel", t2f_conv1d(pre))
    tree.p("pre/bias", sd["generator.conv_pre.bias"])
    rates = list(gen_cfg.get("upsample_rates", (8, 8, 2, 2)))
    kernels = list(gen_cfg.get("resblock_kernel_sizes", (3, 7, 11)))
    dils = list(gen_cfg.get("resblock_dilation_sizes", ((1, 3, 5),) * 3))
    for i in range(len(rates)):
        w = _wn_weight(sd, f"generator.ups.{i}")
        tree.p(f"up{i}/kernel", t2f_convtranspose1d(w))
        tree.p(f"up{i}/bias", sd[f"generator.ups.{i}.bias"])
        for j in range(len(kernels)):
            t = f"generator.resblocks.{i}.{j}"
            for c in range(len(dils[j])):
                tree.p(f"res{i}_{j}/c1_{c}/kernel",
                       t2f_conv1d(_wn_weight(sd, f"{t}.convs1.{c}")))
                tree.p(f"res{i}_{j}/c1_{c}/bias", sd[f"{t}.convs1.{c}.bias"])
                tree.p(f"res{i}_{j}/c2_{c}/kernel",
                       t2f_conv1d(_wn_weight(sd, f"{t}.convs2.{c}")))
                tree.p(f"res{i}_{j}/c2_{c}/bias", sd[f"{t}.convs2.{c}.bias"])
    post = _wn_weight(sd, "generator.conv_post")
    tree.p("post/kernel", t2f_conv1d(post))
    tree.p("post/bias", sd["generator.conv_post.bias"])
    return tree.variables()


def import_hifigan_model(path: str):
    """`.nemo` HiFi-GAN checkpoint → HifiGanModel (generator weights;
    discriminators are training-only and skipped)."""
    from nemo_tpu.models.tts.hifigan_model import HifiGanModel

    nemo_cfg, sd = load_nemo_archive(path)
    gen_cfg = ConfigDict(nemo_cfg.get("generator", {}))
    cfg = ConfigDict(
        sample_rate=int(nemo_cfg.get("sample_rate", 22050)),
        generator=dict(
            upsample_rates=tuple(gen_cfg.get("upsample_rates", (8, 8, 2, 2))),
            upsample_kernel_sizes=tuple(
                gen_cfg.get("upsample_kernel_sizes", (16, 16, 4, 4))),
            upsample_initial_channel=int(
                gen_cfg.get("upsample_initial_channel", 512)),
            resblock_kernel_sizes=tuple(
                gen_cfg.get("resblock_kernel_sizes", (3, 7, 11))),
            resblock_dilation_sizes=tuple(
                tuple(d) for d in gen_cfg.get("resblock_dilation_sizes",
                                              ((1, 3, 5),) * 3)),
        ),
    )
    model = HifiGanModel(cfg, init_params=False)
    model.variables = {
        "params": {"generator":
                   convert_hifigan_state(cfg.generator, sd)["params"]}}
    logging.info(f"Imported HiFi-GAN .nemo checkpoint from {path}")
    return model
