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


class CLIPTrainModule:
    """Trainer-protocol contrastive pretraining (reference
    vlm/clip/model + recipes/clip_b32: symmetric InfoNCE over in-batch
    pairs). batch: {"images" [B,S,S,3], "tokens" [B,L], "token_len" [B]}."""

    def __init__(self, cfg: CLIPConfig, lr_schedule=None):
        self.cfg = cfg
        self.model = CLIPModel(cfg)
        sched = lr_schedule or (lambda step: 1e-3)
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(1.0), optax.adamw(sched))
        self._jit = None

    def init_state(self, seed: int = 0):
        from nemo_tpu.models.llm.train import TrainState

        S = self.cfg.vision.image_size
        images = jnp.zeros((2, S, S, 3), jnp.float32)
        tokens = jnp.zeros((2, 8), jnp.int32)
        tl = jnp.full((2,), 8, jnp.int32)
        params = nn.meta.unbox(self.model.init(
            jax.random.PRNGKey(seed), images, tokens, tl)["params"])
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=self.optimizer.init(params))

    def train_step(self, state, batch, rng=None):
        from nemo_tpu.models.llm.train import TrainState

        if self._jit is None:
            opt, model = self.optimizer, self.model

            def step(state, batch, rng):
                def lf(p):
                    return model.apply(
                        {"params": p}, batch["images"], batch["tokens"],
                        batch["token_len"], train=True,
                        method=CLIPModel.loss, rngs={"dropout": rng})

                loss, grads = jax.value_and_grad(lf)(state.params)
                updates, new_opt = opt.update(grads, state.opt_state,
                                              state.params)
                params = optax.apply_updates(state.params, updates)
                return (TrainState(step=state.step + 1, params=params,
                                   opt_state=new_opt),
                        {"loss": loss,
                         "grad_norm": optax.global_norm(grads)})

            self._jit = jax.jit(step, donate_argnums=(0,))
        if rng is None:
            rng = jax.random.PRNGKey(int(state.step))
        return self._jit(state, batch, rng)


class MockImageTextDataModule:
    """Random contrastive (image, caption) batches (reference
    vlm/clip/data/mock.py)."""

    def __init__(self, image_size: int = 32, seq_length: int = 16,
                 global_batch_size: int = 4, vocab_size: int = 256,
                 seed: int = 0):
        self.image_size = image_size
        self.seq_length = seq_length
        self.global_batch_size = global_batch_size
        self.vocab_size = vocab_size
        self.seed = seed
        self.micro_batch_size = None

    def train_batches(self, start_step: int = 0):
        import numpy as np

        rng = np.random.RandomState(self.seed + start_step)
        B, S, L = (self.global_batch_size, self.image_size, self.seq_length)
        while True:
            yield {
                "images": jnp.asarray(
                    rng.randn(B, S, S, 3).astype(np.float32)),
                "tokens": jnp.asarray(
                    rng.randint(1, self.vocab_size, (B, L)).astype(np.int32)),
                "token_len": jnp.full((B,), L, jnp.int32),
            }


def clip_b32(**kw) -> CLIPConfig:
    """reference recipes clip_b32 (ViT-B/32 vision tower + 12-layer text
    tower, 512-d joint space)."""
    from nemo_tpu.models.llm.config import _cfg

    d = dict(
        vision=ViTConfig(image_size=224, patch_size=32, hidden_size=768,
                         num_layers=12, num_heads=12, ffn_hidden_size=3072),
        text=_cfg(num_layers=12, hidden_size=512, ffn_hidden_size=2048,
                  num_attention_heads=8, vocab_size=49408, seq_length=77),
        proj_dim=512)
    d.update(kw)
    return CLIPConfig(**d)
