"""NeVA (LLaVA-style) vision-language model.

Reference parity: `nemo/collections/vlm/neva/model/base.py` —
NevaModel = vision encoder (CLIP-ViT) + MultimodalProjector (mlp2x_gelu)
+ GPT LLM; image features replace the IMAGE_TOKEN placeholder positions
in the token embedding sequence; CE loss on text positions only
(labels = -100 on image positions in the reference; here a loss mask).

TPU-first: the image splice is a static-shape prefix concat (image
tokens always occupy the first P positions of the sequence), so the
compiled step never depends on where the placeholder landed — the
collator arranges [image | prompt | answer] order up front.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from nemo_tpu.models.llm.config import GPTConfig
from nemo_tpu.models.llm.gpt import GPTModel
from nemo_tpu.models.vision.vit import ViT, ViTConfig


@dataclasses.dataclass(frozen=True)
class NevaConfig:
    llm: GPTConfig = dataclasses.field(default_factory=GPTConfig)
    vision: ViTConfig = dataclasses.field(default_factory=ViTConfig)
    projector_type: str = "mlp2x_gelu"  # reference default
    freeze_vision: bool = True
    drop_cls_token: bool = True  # LLaVA uses patch tokens only
    image_token_id: int = -1  # ≥0 → dynamic placeholder splicing (features
    #                           land wherever this id appears in tokens)


class NevaModel(nn.Module):
    cfg: NevaConfig

    def setup(self):
        self.vision = ViT(self.cfg.vision, name="vision")
        self.llm = GPTModel(self.cfg.llm, name="llm")
        H = self.cfg.llm.hidden_size
        if self.cfg.projector_type == "mlp2x_gelu":
            self.proj1 = nn.Dense(H, name="proj1")
            self.proj2 = nn.Dense(H, name="proj2")
        else:
            self.proj1 = nn.Dense(H, name="proj1")
            self.proj2 = None

    def encode_images(self, images, *, train=False):
        feats = self.vision(images, train=train)
        if self.cfg.freeze_vision:
            feats = jax.lax.stop_gradient(feats)
        if self.cfg.vision.use_cls_token and self.cfg.drop_cls_token:
            feats = feats[:, 1:]
        x = self.proj1(feats.astype(jnp.float32))
        if self.proj2 is not None:
            x = self.proj2(nn.gelu(x, approximate=True))
        return x  # [B, P, H_llm]

    def encode_images_tiled(self, tiles, *, train=False):
        """llava_next (AnyRes) multi-tile encoding: tiles [B, T, H, W, C] →
        [B, T·P, H_llm] — each tile through the shared vision tower, features
        concatenated in tile order (reference: vlm/llava_next multi-tile
        feature packing). Host collators pick the grid via
        `anyres_grid_shape`."""
        B, T = tiles.shape[:2]
        flat = tiles.reshape((B * T,) + tiles.shape[2:])
        feats = self.encode_images(flat, train=train)  # [B*T, P, H]
        P, H = feats.shape[1], feats.shape[2]
        return feats.reshape(B, T * P, H)

    def splice(self, tokens, img, *, train=False):
        """Dynamic placeholder splicing: IMAGE placeholder ids may sit at
        ARBITRARY positions in `tokens` (and multiple images per row) —
        the i-th placeholder position in a row receives the i-th image
        feature (reference: neva/model/base.py scatters media features
        into input_ids == media_token positions). Static shapes: the
        collator must emit exactly img.shape[1] placeholders per row."""
        is_img = tokens == self.cfg.image_token_id
        txt = self.llm.embed_tokens(jnp.where(is_img, 0, tokens))
        # i-th placeholder → i-th image feature (per row)
        idx = jnp.cumsum(is_img.astype(jnp.int32), axis=1) - 1
        gathered = jnp.take_along_axis(
            img.astype(txt.dtype), jnp.clip(idx, 0, img.shape[1] - 1)[..., None],
            axis=1)
        return jnp.where(is_img[..., None], gathered, txt)

    def __call__(self, images, tokens, *, train=False, tiles=None):
        """Two input conventions:
        - prefix mode (images [B,H,W,C], no placeholders in tokens):
          [image tokens | text tokens] → logits [B, P+S, V];
        - placeholder mode (tokens contain image_token_id): features are
          spliced at the placeholder positions → logits [B, S, V].
        `tiles` [B,T,H,W,C] switches the vision tower to AnyRes tiling."""
        if tiles is not None:
            img = self.encode_images_tiled(tiles, train=train)
        else:
            img = self.encode_images(images, train=train)
        has_placeholder = self.cfg.image_token_id >= 0
        if has_placeholder:
            x = self.splice(tokens, img, train=train)
        else:
            txt = self.llm.embed_tokens(tokens)
            x = jnp.concatenate([img.astype(txt.dtype), txt], axis=1)
        return self.llm(tokens=None, inputs_embeds=x, train=train)

    def loss(self, images, tokens, loss_mask, *, train=True, tiles=None):
        logits = self(images, tokens, train=train, tiles=tiles)
        S = tokens.shape[1]
        text_logits = logits[:, -S:-1]
        labels = tokens[:, 1:]
        mask = loss_mask[:, 1:]
        if self.cfg.image_token_id >= 0:
            mask = mask * (labels != self.cfg.image_token_id)
        lp = jax.nn.log_softmax(text_logits.astype(jnp.float32))
        nll = -jnp.take_along_axis(lp, labels[..., None], -1)[..., 0]
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)


def anyres_grid_shape(height: int, width: int, tile: int = 336,
                      max_tiles: int = 4):
    """Pick the AnyRes tile grid (rows, cols) that best matches the image
    aspect ratio within the tile budget (reference llava_next
    select_best_resolution)."""
    best, best_eff, best_waste = (1, 1), -1.0, float("inf")
    for r in range(1, max_tiles + 1):
        for c in range(1, max_tiles + 1):
            if r * c > max_tiles:
                continue
            scale = min(r * tile / height, c * tile / width, 1.0)
            eff = scale * height * scale * width
            waste = r * c * tile * tile - eff
            # maximize effective resolution, then minimize padding waste
            if eff > best_eff + 1e-6 or (abs(eff - best_eff) <= 1e-6
                                         and waste < best_waste):
                best, best_eff, best_waste = (r, c), eff, waste
    return best


def neva_8b(**kw) -> NevaConfig:
    """llama3-8B LLM + CLIP-ViT-L/14-336 (reference vlm recipes neva_llama3_8b)."""
    from nemo_tpu.models.llm.config import llama3_8b

    d = dict(llm=llama3_8b(), vision=ViTConfig(
        image_size=336, patch_size=14, hidden_size=1024, num_layers=24,
        num_heads=16, ffn_hidden_size=4096))
    d.update(kw)
    return NevaConfig(**d)
