"""Speaker-recognition models (TitaNet / ECAPA style).

Reference parity: EncDecSpeakerLabelModel (`asr/models/label_models.py` —
ConvASR/SE encoder → attentive statistics pooling → bottleneck embedding →
classifier with angular-margin softmax; `get_embedding`/`verify_speakers`
APIs used by the diarization stack).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.core.model import Model
from nemo_tpu.data.audio_io import read_wav
from nemo_tpu.models.asr.ctc_models import _bucket, _mel_cfg_from, build_encoder
from nemo_tpu.ops.audio import mel_spectrogram


class AttentiveStatsPooling(nn.Module):
    """Attention-weighted mean+std pooling (titanet/ecapa pooling)."""

    attention_dim: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray, length: jnp.ndarray) -> jnp.ndarray:
        # x: [B, T, C]
        B, T, C = x.shape
        mask = (jnp.arange(T)[None, :] < length[:, None])[..., None]
        h = nn.tanh(nn.Dense(self.attention_dim, name="att1")(x))
        scores = nn.Dense(1, name="att2")(h)  # [B, T, 1]
        scores = jnp.where(mask, scores, -1e30)
        w = jax.nn.softmax(scores, axis=1)
        mean = jnp.sum(w * x, axis=1)
        var = jnp.sum(w * jnp.square(x - mean[:, None]), axis=1)
        std = jnp.sqrt(jnp.maximum(var, 1e-8))
        return jnp.concatenate([mean, std], axis=-1)  # [B, 2C]


class _SpeakerNet(nn.Module):
    enc_cfg: Any
    feat_in: int
    emb_dim: int
    num_classes: int

    @nn.compact
    def __call__(self, feats, lengths, *, train=False):
        encoder = build_encoder(ConfigDict(dict(self.enc_cfg)), self.feat_in, name="encoder")
        enc, enc_len = encoder(feats, lengths, train=train)  # [B, C, T]
        x = jnp.transpose(enc, (0, 2, 1))
        pooled = AttentiveStatsPooling(name="pooling")(x, enc_len)
        emb = nn.Dense(self.emb_dim, name="emb")(pooled)
        emb = nn.BatchNorm(use_running_average=not train, name="emb_bn")(emb)
        logits = nn.Dense(self.num_classes, use_bias=False, name="classifier")(
            emb / jnp.linalg.norm(emb, axis=-1, keepdims=True).clip(1e-6)
        )
        return emb, logits


def angular_margin_loss(logits, labels, scale: float = 30.0, margin: float = 0.2):
    """Additive-angular-margin softmax (reference: angular softmax loss)."""
    # logits here are cosine similarities (normalized emb × normalized W rows
    # approximated by unnormalized classifier — clamp to [-1,1])
    cos = jnp.clip(logits, -1.0 + 1e-6, 1.0 - 1e-6)
    theta = jnp.arccos(cos)
    onehot = jax.nn.one_hot(labels, logits.shape[-1])
    cos_m = jnp.cos(theta + margin)
    adj = cos * (1 - onehot) + cos_m * onehot
    logp = jax.nn.log_softmax(scale * adj, axis=-1)
    return -jnp.mean(jnp.sum(onehot * logp, axis=-1))


class EncDecSpeakerLabelModel(Model):
    def __init__(self, cfg: ConfigDict, init_params: bool = True):
        super().__init__(cfg)
        cfg = self.cfg
        self.sample_rate = int(cfg.get("sample_rate", 16000))
        self.mel_cfg = _mel_cfg_from(cfg.get("preprocessor", {}))
        self.num_classes = int(cfg.decoder.get("num_classes", 2))
        self.net = _SpeakerNet(
            enc_cfg=cfg.encoder.to_dict(),
            feat_in=int(cfg.encoder.get("feat_in", self.mel_cfg.features)),
            emb_dim=int(cfg.decoder.get("emb_sizes", 192)),
            num_classes=self.num_classes,
        )
        if init_params:
            feats = jnp.zeros((1, self.mel_cfg.features, 128), jnp.float32)
            self.variables = self.net.init(
                jax.random.PRNGKey(0), feats, jnp.array([128], jnp.int32)
            )
        self._jit_emb = jax.jit(self._emb_fn)

    def _emb_fn(self, variables, signal, length):
        feats, feat_len = mel_spectrogram(signal, length, self.mel_cfg, training=False)
        emb, logits = self.net.apply(variables, feats, feat_len, train=False)
        return emb, logits

    def get_embedding(self, audio: Union[str, np.ndarray]) -> np.ndarray:
        """Speaker embedding for one utterance (reference label_models.py)."""
        if isinstance(audio, str):
            x, _ = read_wav(audio, target_sr=self.sample_rate)
        else:
            x = np.asarray(audio, np.float32)
        T = _bucket(len(x))
        sig = np.zeros((1, T), np.float32)
        sig[0, : len(x)] = x
        emb, _ = self._jit_emb(self.variables, jnp.asarray(sig), jnp.array([len(x)], jnp.int32))
        return np.asarray(emb[0])

    def verify_speakers(self, a, b, threshold: float = 0.7) -> bool:
        """Cosine-similarity verification (reference verify_speakers)."""
        ea, eb = self.get_embedding(a), self.get_embedding(b)
        cos = float(np.dot(ea, eb) / (np.linalg.norm(ea) * np.linalg.norm(eb) + 1e-9))
        return cos >= threshold
