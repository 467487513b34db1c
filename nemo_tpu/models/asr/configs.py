"""Canonical ASR model configs as Python builders.

Mirrors the reference YAMLs in `examples/asr/conf/**` (quartznet/jasper/
citrinet/conformer families); configs are plain ConfigDicts accepted by the
model constructors, so reference YAMLs load directly too.
"""

from __future__ import annotations

from typing import List, Optional

from nemo_tpu.core.config import ConfigDict

# Reference char vocabulary for English ASR (quartznet15x5.yaml labels)
EN_CHAR_LABELS = [
    " ", "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l", "m",
    "n", "o", "p", "q", "r", "s", "t", "u", "v", "w", "x", "y", "z", "'",
]


def quartznet15x5(labels: Optional[List[str]] = None, feat_in: int = 64) -> ConfigDict:
    """QuartzNet15x5 (reference examples/asr/conf/quartznet/quartznet_15x5.yaml):
    prologue C1(k33,s2) → 15 separable residual blocks (B1-B5 ×3, R=5) →
    C2(k87,dil2) → C3(k1,1024) → decoder."""
    labels = labels or EN_CHAR_LABELS

    def block(filters, kernel, repeat=5, residual=True, separable=True, **kw):
        return dict(
            filters=filters,
            repeat=repeat,
            kernel=kernel,
            stride=1,
            dilation=1,
            dropout=0.0,
            residual=residual,
            separable=separable,
            **kw,
        )

    jasper = [block(256, 33, repeat=1, residual=False, stride=2)]
    for filters, kernel in [(256, 33), (256, 39), (512, 51), (512, 63), (512, 75)]:
        for _ in range(3):
            jasper.append(block(filters, kernel))
    jasper.append(block(512, 87, repeat=1, residual=False, dilation=2))
    jasper.append(block(1024, 1, repeat=1, residual=False, separable=False))

    return ConfigDict(
        sample_rate=16000,
        labels=labels,
        preprocessor=dict(
            features=feat_in,
            window_size=0.02,
            window_stride=0.01,
            normalize="per_feature",
            dither=1e-5,
            pad_to=16,
        ),
        encoder=dict(feat_in=feat_in, jasper=jasper),
        decoder=dict(feat_in=1024, vocabulary=labels),
    )


_CONFORMER_SIZES = {
    # name: (d_model, n_layers, n_heads)  — conformer_ctc_bpe.yaml:7-17
    "small": (176, 16, 4),
    "medium": (256, 18, 4),
    "large": (512, 18, 8),
    "xlarge": (1024, 24, 8),
}


def conformer_ctc(
    size: str = "large",
    labels: Optional[List[str]] = None,
    feat_in: int = 80,
    subsampling: str = "striding",
    subsampling_factor: int = 4,
    compute_dtype: str = "float32",
) -> ConfigDict:
    """Conformer-CTC (reference examples/asr/conf/conformer/conformer_ctc_bpe.yaml):
    mel-80 → ConvSubsampling ×4 → N×ConformerLayer(rel_pos MHSA, conv k=31)."""
    labels = labels or EN_CHAR_LABELS
    d_model, n_layers, n_heads = _CONFORMER_SIZES[size]
    return ConfigDict(
        sample_rate=16000,
        labels=labels,
        preprocessor=dict(features=feat_in, window_size=0.025, window_stride=0.01,
                          normalize="per_feature", dither=1e-5, pad_to=0),
        encoder=dict(
            _target_="nemo_tpu.models.asr.modules.conformer.ConformerEncoder",
            feat_in=feat_in,
            n_layers=n_layers,
            d_model=d_model,
            n_heads=n_heads,
            subsampling=subsampling,
            subsampling_factor=subsampling_factor,
            subsampling_conv_channels=-1,
            ff_expansion_factor=4,
            conv_kernel_size=31,
            conv_norm_type="batch_norm",
            dropout=0.1,
            dropout_att=0.1,
            xscaling=True,
            pos_emb_max_len=5000,
            compute_dtype=compute_dtype,
            # measured default (v5e, full transcribe, Conformer-L bf16):
            # r04 @ B=32 x 30 s — decomposed 4888 RTFx after the
            # weight-side trig slicing fix (ops/attention.py) vs
            # decomposed_flash 3099 and rel-shift einsum ~1800-equiv;
            # the augmented rel-pos features pad the flash kernel's head
            # dim to 640 at this shape, so XLA's fused einsum wins.
            # decomposed_flash remains the choice for long-audio T'
            # (O(T²) score memory); select via encoder.att_impl.
            att_impl="decomposed",
        ),
        decoder=dict(feat_in=d_model, vocabulary=labels),
    )


def conformer_transducer(
    size: str = "large",
    labels: Optional[List[str]] = None,
    compute_dtype: str = "float32",
    decoding_strategy: str = "greedy_batch",
) -> ConfigDict:
    """Conformer-Transducer (reference examples/asr/conf/conformer/
    conformer_transducer_bpe.yaml): the conformer_ctc encoder + LSTM
    prediction network (pred_hidden 640, 1 layer) + additive joint
    (joint_hidden 640), greedy label-looping decode by default."""
    cfg = conformer_ctc(size, labels, compute_dtype=compute_dtype)
    cfg.decoder = ConfigDict(pred_hidden=640, pred_rnn_layers=1,
                             vocabulary=cfg.labels)
    cfg.joint = ConfigDict(joint_hidden=640)
    cfg.decoding = ConfigDict(strategy=decoding_strategy, max_symbols=10)
    return cfg


def fastconformer_ctc(size: str = "large", labels: Optional[List[str]] = None) -> ConfigDict:
    """FastConformer: ×8 depthwise-striding subsampling (fastconformer yamls)."""
    cfg = conformer_ctc(size, labels, subsampling="dw_striding", subsampling_factor=8)
    cfg.encoder.subsampling_conv_channels = 256
    return cfg


def citrinet_512(labels: Optional[List[str]] = None, feat_in: int = 80) -> ConfigDict:
    """Citrinet-512 shape (reference examples/asr/conf/citrinet/): SE blocks,
    stride_last + stride_add residuals, kernels 5..41, x8 total stride."""
    labels = labels or EN_CHAR_LABELS
    C = 512

    def blk(kernel, stride=1, repeat=5, **kw):
        return dict(filters=C, repeat=repeat, kernel=kernel, stride=stride,
                    separable=True, residual=True, se=True, se_reduction_ratio=8,
                    stride_last=True, residual_mode="stride_add" if stride > 1 else "add",
                    **kw)

    jasper = [dict(filters=C, repeat=1, kernel=5, separable=True, residual=False,
                   se=True, se_reduction_ratio=8)]
    for k in (11, 13, 15, 17, 19, 21):
        jasper.append(blk(k))
    jasper.append(blk(13, stride=2))
    for k in (15, 17, 19, 21, 23, 25):
        jasper.append(blk(k))
    jasper.append(blk(25, stride=2))
    for k in (27, 29, 31, 33, 35, 37, 39):
        jasper.append(blk(k))
    jasper.append(dict(filters=640, repeat=1, kernel=41, separable=True,
                       residual=False, se=True, se_reduction_ratio=8))
    return ConfigDict(
        sample_rate=16000,
        labels=labels,
        preprocessor=dict(features=feat_in, window_size=0.025, window_stride=0.01,
                          normalize="per_feature", dither=1e-5, pad_to=16),
        encoder=dict(feat_in=feat_in, jasper=jasper),
        decoder=dict(feat_in=640, vocabulary=labels),
    )


def quartznet_tiny(labels: Optional[List[str]] = None, feat_in: int = 64) -> ConfigDict:
    """Small test-sized variant (same topology shape, 2 blocks)."""
    labels = labels or EN_CHAR_LABELS
    jasper = [
        dict(filters=32, repeat=1, kernel=33, stride=2, dilation=1, dropout=0.0,
             residual=False, separable=True),
        dict(filters=32, repeat=2, kernel=33, stride=1, dilation=1, dropout=0.0,
             residual=True, separable=True),
        dict(filters=64, repeat=1, kernel=1, stride=1, dilation=1, dropout=0.0,
             residual=False, separable=False),
    ]
    return ConfigDict(
        sample_rate=16000,
        labels=labels,
        preprocessor=dict(features=feat_in, dither=1e-5),
        encoder=dict(feat_in=feat_in, jasper=jasper),
        decoder=dict(feat_in=64, vocabulary=labels),
    )
