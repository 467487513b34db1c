"""Llama-4 omni (Scout/Maverick) vision-language model.

Reference parity: `nemo/collections/vlm` llama4 omni (HF
Llama4ForConditionalGeneration semantics): a ViT tower encodes 336×336
tiles into 24×24 patch tokens; the Llama4VisionPixelShuffleMLP compresses
them 4× spatially by folding 2×2 patch neighborhoods into channels
(pixel_shuffle ratio 0.5: 576 tokens × 1408ch → 144 tokens × 5632ch) and
MLPs into the projector space; a bias-free linear maps into the LLM
hidden; features land at the image-placeholder positions of the llama4
MoE LLM (already in the zoo: llama4_scout/llama4_maverick presets with
interleaved NoPE/chunked-attention and every-other-layer MoE).

TPU-first: pixel shuffle is pure reshapes/transposes (layout moves XLA
fuses into the following GEMM); the tower reuses the shared ViT (learned
absolute position embeddings — the reference tower's 2D-rope variant is
not modeled; the adapter/projector stack is exact).
"""

from __future__ import annotations

import dataclasses
import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from nemo_tpu.models.llm.config import GPTConfig
from nemo_tpu.models.llm.gpt import GPTModel
from nemo_tpu.models.vision.vit import ViT, ViTConfig


def pixel_shuffle(x: jnp.ndarray, ratio: float = 0.5) -> jnp.ndarray:
    """[B, P, C] square patch grid → [B, P·ratio², C/ratio²] — the HF
    llama4 pixel_shuffle reshape/permute sequence (fold 1/ratio × 1/ratio
    spatial neighborhoods into channels)."""
    B, P, C = x.shape
    side = int(math.sqrt(P))
    assert side * side == P, "pixel_shuffle needs a square patch grid"
    x = x.reshape(B, side, side, C)
    x = x.reshape(B, side, int(side * ratio), int(C / ratio))
    x = jnp.transpose(x, (0, 2, 1, 3))
    x = x.reshape(B, int(side * ratio), int(side * ratio),
                  int(C / (ratio * ratio)))
    x = jnp.transpose(x, (0, 2, 1, 3))
    return x.reshape(B, int(P * ratio * ratio), int(C / (ratio * ratio)))


@dataclasses.dataclass(frozen=True)
class Llama4VLConfig:
    llm: GPTConfig = dataclasses.field(default_factory=GPTConfig)
    vision: ViTConfig = dataclasses.field(default_factory=ViTConfig)
    image_token_id: int = 200092  # HF <|image|>
    pixel_shuffle_ratio: float = 0.5
    projector_input_dim: int = 4096  # adapter MLP width (vision_output_dim)
    freeze_vision: bool = False

    @property
    def tokens_per_image(self) -> int:
        r = self.pixel_shuffle_ratio
        return int(self.vision.num_patches * r * r)


class Llama4VLModel(nn.Module):
    cfg: Llama4VLConfig

    def setup(self):
        self.vision = ViT(self.cfg.vision, name="vision")
        self.llm = GPTModel(self.cfg.llm, name="llm")
        D = self.cfg.projector_input_dim
        # Llama4VisionPixelShuffleMLP: fc1(shuffled→D)·gelu → fc2(D→D)·gelu
        self.adapter_fc1 = nn.Dense(D, use_bias=False, name="adapter_fc1")
        self.adapter_fc2 = nn.Dense(D, use_bias=False, name="adapter_fc2")
        # Llama4MultiModalProjector: bias-free linear into the LLM hidden
        self.mm_proj = nn.Dense(self.cfg.llm.hidden_size, use_bias=False,
                                name="mm_projector")

    def encode_images(self, images, *, train=False):
        """[B, H, W, 3] → [B, tokens_per_image, H_llm]."""
        feats = self.vision(images, train=train)  # [B, P, C] (no CLS)
        if self.cfg.freeze_vision:
            feats = jax.lax.stop_gradient(feats)
        x = pixel_shuffle(feats.astype(jnp.float32),
                          self.cfg.pixel_shuffle_ratio)
        x = nn.gelu(self.adapter_fc1(x), approximate=False)
        x = nn.gelu(self.adapter_fc2(x), approximate=False)
        return self.mm_proj(x)

    def __call__(self, images, tokens, *, train=False):
        """images [B·N, H, W, 3], tokens [B, S] with N·tokens_per_image
        placeholders per row → logits [B, S, V]."""
        B, S = tokens.shape
        img = self.encode_images(images, train=train)
        n = img.shape[0] // B
        img = img.reshape(B, n * img.shape[1], img.shape[2])
        is_img = tokens == self.cfg.image_token_id
        txt = self.llm.embed_tokens(jnp.where(is_img, 0, tokens))
        idx = jnp.cumsum(is_img.astype(jnp.int32), axis=1) - 1
        gathered = jnp.take_along_axis(
            img.astype(txt.dtype),
            jnp.clip(idx, 0, img.shape[1] - 1)[..., None], axis=1)
        x = jnp.where(is_img[..., None], gathered, txt)
        return self.llm(tokens=None, inputs_embeds=x, train=train)

    def loss(self, images, tokens, loss_mask, *, train=True):
        logits = self(images, tokens, train=train)
        labels = tokens[:, 1:]
        mask = loss_mask[:, 1:] * (labels != self.cfg.image_token_id)
        lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32))
        nll = -jnp.take_along_axis(lp, labels[..., None], -1)[..., 0]
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)


def _llama4_vision_tower() -> ViTConfig:
    """HF Llama4VisionModel dims: hidden 1408, 34 layers, 16 heads,
    MLP 5632, 336/14 patches (2D-rope tower approximated by the shared
    learned-pos-emb ViT — see module docstring)."""
    return ViTConfig(
        image_size=336, patch_size=14, hidden_size=1408, num_layers=34,
        num_heads=16, ffn_hidden_size=5632, use_cls_token=False,
        hidden_act="gelu", layernorm_epsilon=1e-5)


def llama4vl_scout(**kw) -> Llama4VLConfig:
    from nemo_tpu.models.llm.config import llama4_scout

    d = dict(llm=llama4_scout(), vision=_llama4_vision_tower())
    d.update(kw)
    return Llama4VLConfig(**d)


def llama4vl_maverick(**kw) -> Llama4VLConfig:
    from nemo_tpu.models.llm.config import llama4_maverick

    d = dict(llm=llama4_maverick(), vision=_llama4_vision_tower())
    d.update(kw)
    return Llama4VLConfig(**d)
