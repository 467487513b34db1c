"""Self-supervised speech pretraining models.

Reference parity: `nemo/collections/asr/models/ssl_models.py` —
SpeechEncDecSelfSupervisedModel (masked-feature contrastive SSL,
wav2vec2-style) and EncDecDenoiseMaskedTokenPredModel (NEST: masked
token prediction against a frozen random-projection quantizer, BEST-RQ).

TPU-first shape: masking is vectorized PRNG (no python loops), the
random-projection quantizer is a single argmin-over-codebook matmul,
the contrastive loss draws its negatives from the batch's own masked
frames via one gather — everything static-shaped under jit.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.core.model import Model
from nemo_tpu.models.asr.ctc_models import _mel_cfg_from, build_encoder
from nemo_tpu.ops.audio import mel_spectrogram


def span_mask(rng, batch: int, frames: int, lengths: jnp.ndarray,
              mask_prob: float = 0.065, span: int = 10) -> jnp.ndarray:
    """wav2vec2-style span masking: each frame starts a span with
    p=mask_prob; the union of spans is masked. Returns bool [B, T]
    (True = masked). Vectorized: start indicators → windowed max."""
    starts = jax.random.bernoulli(rng, mask_prob, (batch, frames))
    starts = starts & (jnp.arange(frames)[None, :] < lengths[:, None])
    # dilate starts rightward by `span` frames via cumulative trick
    k = jnp.ones((span,), jnp.float32)
    dil = jax.lax.conv_general_dilated(
        starts.astype(jnp.float32)[:, None, :], k[None, None, :],
        window_strides=(1,), padding=((span - 1, 0),),
        dimension_numbers=("NCH", "IOH", "NCH"))[:, 0]
    mask = dil > 0
    return mask & (jnp.arange(frames)[None, :] < lengths[:, None])


class RandomProjectionQuantizer(nn.Module):
    """BEST-RQ frozen quantizer: project stacked mel frames with a fixed
    random matrix, take the nearest (cosine) codebook entry as the target
    label. Parameters are created once and never trained (stop_gradient +
    excluded by the SSL train step's optimizer mask is unnecessary — the
    loss never differentiates w.r.t. them)."""

    feat_dim: int
    code_dim: int = 16
    num_codes: int = 8192

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        proj = self.param("proj", nn.initializers.normal(1.0),
                          (self.feat_dim, self.code_dim), jnp.float32)
        codes = self.param("codebook", nn.initializers.normal(1.0),
                           (self.num_codes, self.code_dim), jnp.float32)
        proj = jax.lax.stop_gradient(proj)
        codes = jax.lax.stop_gradient(codes)
        z = feats.astype(jnp.float32) @ proj  # [B, T, c]
        z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-8)
        cb = codes / (jnp.linalg.norm(codes, axis=-1, keepdims=True) + 1e-8)
        sim = jnp.einsum("btc,vc->btv", z, cb)
        return jnp.argmax(sim, axis=-1)  # [B, T] int targets


class _MaskedPredNet(nn.Module):
    """mel → (mask) → encoder → per-frame code logits."""

    enc_cfg: dict
    feat_in: int
    num_codes: int
    code_dim: int
    mask_prob: float
    mask_span: int
    stack: int  # frames stacked per quantizer target (≈ encoder stride)

    @nn.compact
    def __call__(self, feats, feat_len, rng, *, train: bool = True):
        B, D, T = feats.shape
        # targets from the *clean* features, stacked to encoder frame rate
        Ts = (T // self.stack) * self.stack
        stacked = feats[:, :, :Ts].reshape(B, D, Ts // self.stack, self.stack)
        stacked = jnp.moveaxis(stacked, 1, 2).reshape(
            B, Ts // self.stack, D * self.stack)
        targets = RandomProjectionQuantizer(
            feat_dim=D * self.stack, code_dim=self.code_dim,
            num_codes=self.num_codes, name="quantizer")(stacked)

        rng_mask, _ = jax.random.split(rng)
        mask = span_mask(rng_mask, B, T, feat_len, self.mask_prob, self.mask_span)
        mask_emb = self.param("mask_embedding", nn.initializers.normal(0.1),
                              (D,), jnp.float32)
        masked = jnp.where(mask[:, None, :], mask_emb[None, :, None], feats)

        enc = build_encoder(ConfigDict(self.enc_cfg), self.feat_in, name="encoder")
        encoded, enc_len = enc(masked, feat_len, train=train)  # [B, d, T']
        encoded = jnp.transpose(encoded, (0, 2, 1))  # [B, T', d]
        logits = nn.Dense(self.num_codes, name="head")(encoded)  # [B, T', V]

        # align mask to encoder frame rate (a target frame is "masked" if any
        # of its input frames was)
        Tm = (T // self.stack) * self.stack
        m = mask[:, :Tm].reshape(B, Tm // self.stack, self.stack).any(-1)
        n = min(logits.shape[1], targets.shape[1], m.shape[1])
        return logits[:, :n], targets[:, :n], m[:, :n], enc_len


@dataclasses.dataclass
class SSLTrainOutput:
    loss: jnp.ndarray
    accuracy: jnp.ndarray


class EncDecMaskedTokenPredModel(Model):
    """NEST/BEST-RQ masked token prediction (reference ssl_models.py
    EncDecDenoiseMaskedTokenPredModel, simplified: no noise-mixing aug)."""

    def __init__(self, cfg: ConfigDict, init_params: bool = True):
        super().__init__(cfg)
        cfg = self.cfg
        self.mel_cfg = _mel_cfg_from(cfg.get("preprocessor", {}))
        enc_cfg = cfg.encoder
        self.net = _MaskedPredNet(
            enc_cfg=enc_cfg.to_dict(),
            feat_in=int(enc_cfg.get("feat_in", self.mel_cfg.features)),
            num_codes=int(cfg.get("num_codes", 8192)),
            code_dim=int(cfg.get("code_dim", 16)),
            mask_prob=float(cfg.get("mask_prob", 0.065)),
            mask_span=int(cfg.get("mask_span", 10)),
            stack=int(cfg.get("target_stack", cfg.encoder.get("subsampling_factor", 4))),
        )
        if init_params:
            feats = jnp.zeros((1, self.mel_cfg.features, 64), jnp.float32)
            self.variables = self.net.init(
                jax.random.PRNGKey(0), feats, jnp.array([64]),
                jax.random.PRNGKey(1), train=False)

    def loss_fn(self, params, batch_stats, audio, audio_len, rng):
        """Returns (loss, (accuracy, new_batch_stats)) — BatchNorm stats are
        threaded like models/asr/train.py's ASRTrainModule."""
        feats, feat_len = mel_spectrogram(audio, audio_len, self.mel_cfg, training=False)
        (logits, targets, mask, _), upd = self.net.apply(
            {"params": params, "batch_stats": batch_stats}, feats, feat_len, rng,
            train=True, mutable=["batch_stats"], rngs={"dropout": rng})
        lp = jax.nn.log_softmax(logits.astype(jnp.float32))
        nll = -jnp.take_along_axis(lp, targets[..., None], axis=-1)[..., 0]
        denom = jnp.maximum(jnp.sum(mask), 1)
        loss = jnp.sum(nll * mask) / denom
        acc = jnp.sum((jnp.argmax(logits, -1) == targets) * mask) / denom
        return loss, (acc, upd["batch_stats"])


class _ContrastiveNet(nn.Module):
    """mel → mask → encoder; loss contrasts encoder outputs at masked
    positions against quantized targets of the clean features."""

    enc_cfg: dict
    feat_in: int
    proj_dim: int
    mask_prob: float
    mask_span: int
    stack: int

    @nn.compact
    def __call__(self, feats, feat_len, rng, *, train: bool = True):
        B, D, T = feats.shape
        Ts = (T // self.stack) * self.stack
        stacked = feats[:, :, :Ts].reshape(B, D, Ts // self.stack, self.stack)
        stacked = jnp.moveaxis(stacked, 1, 2).reshape(B, Ts // self.stack, D * self.stack)
        # frozen random target projection (BEST-RQ-style stability: the
        # teacher can't collapse if it never moves)
        targets = jax.lax.stop_gradient(
            nn.Dense(self.proj_dim, name="target_proj")(stacked))

        rng_mask, _ = jax.random.split(rng)
        mask = span_mask(rng_mask, B, T, feat_len, self.mask_prob, self.mask_span)
        mask_emb = self.param("mask_embedding", nn.initializers.normal(0.1), (D,), jnp.float32)
        masked = jnp.where(mask[:, None, :], mask_emb[None, :, None], feats)
        enc = build_encoder(ConfigDict(self.enc_cfg), self.feat_in, name="encoder")
        encoded, enc_len = enc(masked, feat_len, train=train)  # [B, d, T']
        encoded = jnp.transpose(encoded, (0, 2, 1))
        preds = nn.Dense(self.proj_dim, name="pred_proj")(encoded)
        Tm = (T // self.stack) * self.stack
        m = mask[:, :Tm].reshape(B, Tm // self.stack, self.stack).any(-1)
        n = min(preds.shape[1], targets.shape[1], m.shape[1])
        return preds[:, :n], targets[:, :n], m[:, :n]


class SpeechSelfSupervisedModel(Model):
    """wav2vec2-style contrastive SSL (reference ssl_models.py
    SpeechEncDecSelfSupervisedModel + ContrastiveLoss): InfoNCE over
    in-batch negatives at masked frames, temperature τ."""

    def __init__(self, cfg: ConfigDict, init_params: bool = True):
        super().__init__(cfg)
        cfg = self.cfg
        self.mel_cfg = _mel_cfg_from(cfg.get("preprocessor", {}))
        enc_cfg = cfg.encoder
        self.temperature = float(cfg.get("temperature", 0.1))
        self.num_negatives = int(cfg.get("num_negatives", 64))
        self.net = _ContrastiveNet(
            enc_cfg=enc_cfg.to_dict(),
            feat_in=int(enc_cfg.get("feat_in", self.mel_cfg.features)),
            proj_dim=int(cfg.get("proj_dim", 128)),
            mask_prob=float(cfg.get("mask_prob", 0.065)),
            mask_span=int(cfg.get("mask_span", 10)),
            stack=int(cfg.get("target_stack", cfg.encoder.get("subsampling_factor", 4))),
        )
        if init_params:
            feats = jnp.zeros((1, self.mel_cfg.features, 64), jnp.float32)
            self.variables = self.net.init(
                jax.random.PRNGKey(0), feats, jnp.array([64]),
                jax.random.PRNGKey(1), train=False)

    def loss_fn(self, params, batch_stats, audio, audio_len, rng):
        feats, feat_len = mel_spectrogram(audio, audio_len, self.mel_cfg, training=False)
        (preds, targets, mask), upd = self.net.apply(
            {"params": params, "batch_stats": batch_stats}, feats, feat_len, rng,
            train=True, mutable=["batch_stats"], rngs={"dropout": rng})
        B, T, C = preds.shape
        p = preds.reshape(B * T, C)
        t = targets.reshape(B * T, C)
        mflat = mask.reshape(B * T)
        pn = p * jax.lax.rsqrt(jnp.sum(jnp.square(p), -1, keepdims=True) + 1e-6)
        tn = t * jax.lax.rsqrt(jnp.sum(jnp.square(t), -1, keepdims=True) + 1e-6)
        # negatives: K shifted masked frames (static gather)
        rng_neg, _ = jax.random.split(rng)
        K = self.num_negatives
        offs = jax.random.randint(rng_neg, (K,), 1, B * T)
        idx = (jnp.arange(B * T)[:, None] + offs[None, :]) % (B * T)  # [N, K]
        neg = tn[idx]  # [N, K, C]
        pos_sim = jnp.sum(pn * tn, -1, keepdims=True)  # [N,1]
        neg_sim = jnp.einsum("nc,nkc->nk", pn, neg)
        logits = jnp.concatenate([pos_sim, neg_sim], -1) / self.temperature
        nll = -jax.nn.log_softmax(logits)[:, 0]
        denom = jnp.maximum(jnp.sum(mflat), 1)
        loss = jnp.sum(nll * mflat) / denom
        acc = jnp.sum((jnp.argmax(logits, -1) == 0) * mflat) / denom
        return loss, (acc, upd["batch_stats"])
