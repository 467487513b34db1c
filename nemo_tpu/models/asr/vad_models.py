"""Voice activity detection (MarbleNet-style frame classifier).

Reference parity: EncDecClassificationModel / MarbleNet VAD
(`asr/models/classification_models.py`, `examples/asr/conf/marblenet/`):
small ConvASR encoder → per-segment speech/non-speech classification, with
a sliding-window `predict_segments` inference API feeding the diarization
stack.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.core.model import Model
from nemo_tpu.data.audio_io import read_wav
from nemo_tpu.models.asr.ctc_models import _mel_cfg_from, build_encoder
from nemo_tpu.ops.audio import mel_spectrogram


class _VADNet(nn.Module):
    enc_cfg: Any
    feat_in: int
    num_classes: int = 2

    @nn.compact
    def __call__(self, feats, lengths, *, train=False):
        encoder = build_encoder(ConfigDict(dict(self.enc_cfg)), self.feat_in, name="encoder")
        enc, enc_len = encoder(feats, lengths, train=train)  # [B, C, T]
        x = jnp.transpose(enc, (0, 2, 1))
        mask = (jnp.arange(x.shape[1])[None, :] < enc_len[:, None])[..., None]
        pooled = jnp.sum(jnp.where(mask, x, 0.0), axis=1) / jnp.maximum(
            enc_len[:, None], 1
        )
        return nn.Dense(self.num_classes, name="classifier")(pooled)


def marblenet_config(feat_in: int = 64) -> ConfigDict:
    """MarbleNet-3x2 shape (reference marblenet_3x2x64.yaml)."""
    jasper = [
        dict(filters=128, repeat=1, kernel=11, stride=1, separable=True, residual=False),
        dict(filters=64, repeat=2, kernel=13, separable=True, residual=True),
        dict(filters=64, repeat=2, kernel=15, separable=True, residual=True),
        dict(filters=64, repeat=2, kernel=17, separable=True, residual=True),
        dict(filters=128, repeat=1, kernel=29, dilation=2, separable=True, residual=False),
    ]
    return ConfigDict(
        sample_rate=16000,
        preprocessor=dict(features=feat_in, window_size=0.025, window_stride=0.01),
        encoder=dict(feat_in=feat_in, jasper=jasper),
        labels=["background", "speech"],
    )


class EncDecClassificationModel(Model):
    """Segment classifier; `predict_segments` = sliding-window VAD."""

    def __init__(self, cfg: Optional[ConfigDict] = None, init_params: bool = True):
        cfg = ConfigDict(cfg or marblenet_config())
        super().__init__(cfg)
        self.sample_rate = int(cfg.get("sample_rate", 16000))
        self.mel_cfg = _mel_cfg_from(cfg.get("preprocessor", {}))
        self.labels = list(cfg.get("labels", ["background", "speech"]))
        self.net = _VADNet(
            enc_cfg=cfg.encoder.to_dict(),
            feat_in=int(cfg.encoder.get("feat_in", self.mel_cfg.features)),
            num_classes=len(self.labels),
        )
        if init_params:
            feats = jnp.zeros((1, self.mel_cfg.features, 64), jnp.float32)
            self.variables = self.net.init(
                jax.random.PRNGKey(0), feats, jnp.array([64], jnp.int32)
            )
        self._jit = jax.jit(self._forward)

    def _forward(self, variables, signal, length):
        feats, feat_len = mel_spectrogram(signal, length, self.mel_cfg, training=False)
        return self.net.apply(variables, feats, feat_len, train=False)

    def classify(self, audio: np.ndarray) -> Tuple[str, float]:
        T = max(len(audio), 400)
        sig = np.zeros((1, T), np.float32)
        sig[0, : len(audio)] = audio
        logits = self._jit(self.variables, jnp.asarray(sig), jnp.array([len(audio)]))
        probs = np.asarray(jax.nn.softmax(logits[0]))
        k = int(np.argmax(probs))
        return self.labels[k], float(probs[k])

    def predict_segments_postprocessed(
        self, audio: Union[str, np.ndarray], window: float = 0.63,
        shift: float = 0.16, **binarize_kw,
    ) -> List[dict]:
        """Sliding-window speech probs → hysteresis binarization
        (reference vad_utils binarization/filtering parameters)."""
        probs, starts = self._window_probs(audio, window, shift)
        return binarize_speech_probs(
            probs, frame_shift=shift, frame_window=window, **binarize_kw)

    def _window_probs(self, audio, window: float, shift: float):
        if isinstance(audio, str):
            x, _ = read_wav(audio, target_sr=self.sample_rate)
        else:
            x = np.asarray(audio, np.float32)
        sr = self.sample_rate
        win, hop = int(window * sr), int(shift * sr)
        wins, starts = [], []
        for s in range(0, max(len(x) - win + 1, 1), hop):
            seg = x[s : s + win]
            if len(seg) < win:
                seg = np.pad(seg, (0, win - len(seg)))
            wins.append(seg)
            starts.append(s / sr)
        sig = jnp.asarray(np.stack(wins))
        logits = self._jit(self.variables, sig,
                           jnp.full((len(wins),), win, jnp.int32))
        probs = np.asarray(jax.nn.softmax(logits, axis=-1))[
            :, self.labels.index("speech")]
        return probs, starts

    def predict_segments(
        self, audio: Union[str, np.ndarray], window: float = 0.63, shift: float = 0.16,
        threshold: float = 0.5,
    ) -> List[dict]:
        """Sliding-window speech segments (reference vad_utils flow)."""
        if isinstance(audio, str):
            x, _ = read_wav(audio, target_sr=self.sample_rate)
        else:
            x = np.asarray(audio, np.float32)
        sr = self.sample_rate
        win, hop = int(window * sr), int(shift * sr)
        wins, starts = [], []
        for s in range(0, max(len(x) - win + 1, 1), hop):
            seg = x[s : s + win]
            if len(seg) < win:
                seg = np.pad(seg, (0, win - len(seg)))
            wins.append(seg)
            starts.append(s / sr)
        sig = jnp.asarray(np.stack(wins))
        logits = self._jit(self.variables, sig, jnp.full((len(wins),), win, jnp.int32))
        speech = np.asarray(jax.nn.softmax(logits, axis=-1))[:, self.labels.index("speech")]
        segments = []
        for t0, p in zip(starts, speech):
            if p < threshold:
                continue
            if segments and t0 <= segments[-1]["end"]:
                segments[-1]["end"] = t0 + window
            else:
                segments.append({"start": t0, "end": t0 + window, "prob": float(p)})
        return segments


def binarize_speech_probs(
    probs: np.ndarray,
    frame_shift: float,
    frame_window: float = 0.0,
    *,
    onset: float = 0.5,
    offset: float = 0.3,
    min_duration_on: float = 0.2,
    min_duration_off: float = 0.2,
    pad_onset: float = 0.0,
    pad_offset: float = 0.0,
) -> List[dict]:
    """Hysteresis binarization of per-frame speech probabilities
    (reference: asr/parts/utils/vad_utils.py binarization + filtering —
    the pyannote-style onset/offset dual-threshold postprocessor).

    A segment opens when prob rises above `onset` and closes when it
    falls below `offset`; gaps shorter than `min_duration_off` are
    bridged, segments shorter than `min_duration_on` are dropped, and
    boundaries are padded by pad_onset/pad_offset seconds.
    """
    segs: List[dict] = []
    active = False
    start = 0.0
    for i, p in enumerate(np.asarray(probs, np.float32)):
        t = i * frame_shift
        if not active and p >= onset:
            active, start = True, t
        elif active and p < offset:
            segs.append({"start": start, "end": t + frame_window})
            active = False
    if active:
        segs.append(
            {"start": start, "end": (len(probs) - 1) * frame_shift + frame_window})
    # pad boundaries
    for s in segs:
        s["start"] = max(0.0, s["start"] - pad_onset)
        s["end"] = s["end"] + pad_offset
    # bridge short gaps
    merged: List[dict] = []
    for s in segs:
        if merged and s["start"] - merged[-1]["end"] < min_duration_off:
            merged[-1]["end"] = max(merged[-1]["end"], s["end"])
        else:
            merged.append(dict(s))
    # drop short segments
    return [s for s in merged if s["end"] - s["start"] >= min_duration_on]
