"""ViT image encoder (CLIP-style), TPU-native.

Reference parity: the vlm vision backbone
(`nemo/collections/vlm/neva/model/base.py` vision_model = CLIP-ViT /
SigLIP via megatron CLIPViTModel). Bidirectional pre-norm transformer on
conv patch embeddings with learned absolute position embeddings and an
optional [CLS] token; returns patch-token features for the projector.

All-einsum attention (no causal mask) — XLA fuses QKᵀ·softmax·V fine at
ViT sequence lengths (≤ few thousand patches); batched matmuls ride the
MXU in bf16.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_hidden_size: int = 3072
    layernorm_epsilon: float = 1e-5
    use_cls_token: bool = True
    compute_dtype: str = "float32"
    # HF-CLIP-compat knobs (interop/vlm_import.py): OpenAI CLIP applies a
    # LayerNorm right after the embeddings (pre_layrnorm), uses quick_gelu,
    # and LLaVA consumes hidden states from layer -2 with no final LN
    pre_layernorm: bool = False
    hidden_act: str = "gelu"  # gelu (tanh approx) | gelu_exact | quick_gelu
    drop_last_layers: int = 0  # >0: stop that many blocks early
    final_layernorm: bool = True
    patch_bias: bool = True

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


class _Block(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, *, train=False):
        cfg = self.cfg
        H = cfg.num_heads
        D = cfg.hidden_size // H
        h = nn.LayerNorm(epsilon=cfg.layernorm_epsilon, name="ln1")(x)
        q = nn.DenseGeneral((H, D), name="q")(h)
        k = nn.DenseGeneral((H, D), name="k")(h)
        v = nn.DenseGeneral((H, D), name="v")(h)
        scores = jnp.einsum("bshd,bthd->bhst", q, k) / np.sqrt(D)
        probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(x.dtype)
        o = jnp.einsum("bhst,bthd->bshd", probs, v)
        x = x + nn.DenseGeneral(cfg.hidden_size, axis=(-2, -1), name="o")(o)
        h = nn.LayerNorm(epsilon=cfg.layernorm_epsilon, name="ln2")(x)
        h = nn.Dense(cfg.ffn_hidden_size, name="fc1")(h)
        act = {"gelu": lambda t: nn.gelu(t, approximate=True),
               "gelu_exact": lambda t: nn.gelu(t, approximate=False),
               "quick_gelu": lambda t: t * jax.nn.sigmoid(1.702 * t)}[cfg.hidden_act]
        h = act(h)
        return x + nn.Dense(cfg.hidden_size, name="fc2")(h)


class ViT(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, images, *, train=False):
        """images [B, H, W, C] → patch features [B, P(+1), hidden]."""
        cfg = self.cfg
        dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[cfg.compute_dtype]
        x = nn.Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
                    use_bias=cfg.patch_bias,
                    dtype=dtype, name="patch_embed")(images.astype(dtype))
        B = x.shape[0]
        x = x.reshape(B, -1, cfg.hidden_size)
        P = x.shape[1]
        n_tok = P + (1 if cfg.use_cls_token else 0)
        if cfg.use_cls_token:
            cls = self.param("cls_token", nn.initializers.zeros,
                             (1, 1, cfg.hidden_size), jnp.float32)
            x = jnp.concatenate([jnp.broadcast_to(cls.astype(dtype),
                                                  (B, 1, cfg.hidden_size)), x], 1)
        pos = self.param("pos_embedding", nn.initializers.normal(0.02),
                         (1, n_tok, cfg.hidden_size), jnp.float32)
        x = x + pos.astype(dtype)
        if cfg.pre_layernorm:  # OpenAI CLIP pre_layrnorm
            x = nn.LayerNorm(epsilon=cfg.layernorm_epsilon, name="ln_pre")(x)
        for i in range(cfg.num_layers - cfg.drop_last_layers):
            x = _Block(cfg, name=f"block{i}")(x, train=train)
        if not cfg.final_layernorm:  # LLaVA feature layer -2: raw hidden
            return x
        return nn.LayerNorm(epsilon=cfg.layernorm_epsilon, name="ln_final")(x)
