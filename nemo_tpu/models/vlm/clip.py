"""CLIP: contrastive language-image pretraining (TPU-native).

Reference parity: `nemo/collections/vlm/clip/` — CLIPModel = ViT image
tower + causal text transformer, pooled/projected embeddings, symmetric
InfoNCE with a learnable logit temperature; used by NeVA as the frozen
vision encoder once pretrained.

TPU-first: both towers are the existing ViT/GPTModel; the contrastive
loss is a single [B, B] bf16 matmul on the MXU; under dp sharding the
in-batch negatives span the LOCAL batch (the reference's
local_loss=True default — no gather of global features)."""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from nemo_tpu.models.llm.config import GPTConfig, tiny_test
from nemo_tpu.models.llm.gpt import GPTModel
from nemo_tpu.models.vision.vit import ViT, ViTConfig


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    vision: ViTConfig = dataclasses.field(default_factory=ViTConfig)
    text: GPTConfig = dataclasses.field(default_factory=lambda: tiny_test())
    proj_dim: int = 512
    logit_scale_init: float = 2.6593  # ln(1/0.07), the CLIP default


class CLIPModel(nn.Module):
    cfg: CLIPConfig

    def setup(self):
        self.vision = ViT(self.cfg.vision, name="vision")
        self.text = GPTModel(self.cfg.text, name="text")
        self.img_proj = nn.Dense(self.cfg.proj_dim, use_bias=False,
                                 name="img_proj")
        self.txt_proj = nn.Dense(self.cfg.proj_dim, use_bias=False,
                                 name="txt_proj")
        self.logit_scale = self.param(
            "logit_scale",
            lambda *_: jnp.asarray(self.cfg.logit_scale_init, jnp.float32),
            (), jnp.float32)

    def encode_image(self, images, *, train=False):
        feats = self.vision(images, train=train)
        pooled = feats[:, 0] if self.cfg.vision.use_cls_token else feats.mean(1)
        z = self.img_proj(pooled.astype(jnp.float32))
        return z / jnp.linalg.norm(z, axis=-1, keepdims=True)

    def encode_text(self, tokens, token_len, *, train=False):
        """Causal text tower; the embedding at the LAST real token is the
        sequence representation (CLIP's EOT pooling)."""
        hidden = self.text(tokens, train=train, output_hidden=True)
        last = jnp.clip(token_len - 1, 0, tokens.shape[1] - 1)
        pooled = jnp.take_along_axis(
            hidden, last[:, None, None].repeat(hidden.shape[-1], 2), axis=1
        )[:, 0]
        z = self.txt_proj(pooled.astype(jnp.float32))
        return z / jnp.linalg.norm(z, axis=-1, keepdims=True)

    def __call__(self, images, tokens, token_len, *, train=False):
        zi = self.encode_image(images, train=train)
        zt = self.encode_text(tokens, token_len, train=train)
        scale = jnp.exp(jnp.clip(self.logit_scale, -10.0, 4.6052))  # ≤ e^100x
        logits = scale * zi @ zt.T  # [B, B]
        return logits, zi, zt

    def loss(self, images, tokens, token_len, *, train=True):
        """Symmetric InfoNCE over the in-batch pairing (row i ↔ col i)."""
        logits, _, _ = self(images, tokens, token_len, train=train)
        B = logits.shape[0]
        labels = jnp.arange(B)
        li = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        lt = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
        return 0.5 * (jnp.mean(li) + jnp.mean(lt))


def make_clip_train_step(model: CLIPModel, lr: float = 1e-3):
    tx = optax.adamw(lr)

    @jax.jit
    def step(params, opt_state, images, tokens, token_len, rng):
        def f(p):
            return model.apply(p, images, tokens, token_len, train=True,
                               method=CLIPModel.loss,
                               rngs={"dropout": rng})

        loss, grads = jax.value_and_grad(f)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return tx, step
