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

    def __call__(self, images, tokens, *, train=False):
        """[image tokens | text tokens] → logits [B, P+S, V]."""
        img = self.encode_images(images, train=train)
        txt = self.llm.embed_tokens(tokens)
        x = jnp.concatenate([img.astype(txt.dtype), txt], axis=1)
        return self.llm(tokens=None, inputs_embeds=x, train=train)

    def loss(self, images, tokens, loss_mask, *, train=True):
        logits = self(images, tokens, train=train)
        S = tokens.shape[1]
        text_logits = logits[:, -S:-1]
        labels = tokens[:, 1:]
        mask = loss_mask[:, 1:]
        lp = jax.nn.log_softmax(text_logits.astype(jnp.float32))
        nll = -jnp.take_along_axis(lp, labels[..., None], -1)[..., 0]
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)


def neva_8b(**kw) -> NevaConfig:
    """llama3-8B LLM + CLIP-ViT-L/14-336 (reference vlm recipes neva_llama3_8b)."""
    from nemo_tpu.models.llm.config import llama3_8b

    d = dict(llm=llama3_8b(), vision=ViTConfig(
        image_size=336, patch_size=14, hidden_size=1024, num_layers=24,
        num_heads=16, ffn_hidden_size=4096))
    d.update(kw)
    return NevaConfig(**d)
