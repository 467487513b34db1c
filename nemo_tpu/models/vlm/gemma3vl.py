"""Gemma3-VL: SigLIP vision tower + pooled projector + Gemma-3 LLM.

Reference parity: `nemo/collections/vlm` gemma3vl (Gemma3ForConditional-
Generation semantics): a SigLIP so400m tower encodes 896×896 images into
64×64 patch tokens; the multimodal projector average-pools 4×4 → 256
tokens, RMS-norms in vision space and linearly maps to LLM hidden; the
features land at the image-placeholder token positions; image tokens of
one image attend to each other BIDIRECTIONALLY while everything else
stays causal (HF's token_type_ids mask — it overrides the sliding window
on gemma3's local layers too).

TPU-first: the splice and the span mask are static-shape tensor ops
(cumsum span labelling, one where); the bidirectional mask rides the
`bidir_ids` argument of the shared GPT attention (one OR on the causal
mask in the einsum path), so the whole model stays a single jitted
program with scan-stacked LLM layers.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from nemo_tpu.models.llm.config import GPTConfig
from nemo_tpu.models.llm.gpt import GPTModel
from nemo_tpu.models.vision.vit import ViT, ViTConfig


def image_span_ids(tokens: jnp.ndarray, image_token_id: int) -> jnp.ndarray:
    """[B,S] tokens → [B,S] int32 span labels: each contiguous run of
    image placeholders gets a distinct nonzero id per row, text gets 0 —
    the `bidir_ids` contract of gpt.causal_attention."""
    is_img = tokens == image_token_id
    prev = jnp.pad(is_img[:, :-1], ((0, 0), (1, 0)))
    starts = is_img & ~prev
    return (jnp.cumsum(starts.astype(jnp.int32), axis=1)
            * is_img.astype(jnp.int32))


@dataclasses.dataclass(frozen=True)
class Gemma3VLConfig:
    llm: GPTConfig = dataclasses.field(default_factory=GPTConfig)
    vision: ViTConfig = dataclasses.field(default_factory=ViTConfig)
    image_token_id: int = 255999  # HF <image_soft_token>
    # pooled image tokens per image = (patches_side / pool)^2
    pool: int = 4
    freeze_vision: bool = False
    rms_eps: float = 1e-6

    @property
    def tokens_per_image(self) -> int:
        side = self.vision.image_size // self.vision.patch_size
        return (side // self.pool) ** 2


class Gemma3VLModel(nn.Module):
    cfg: Gemma3VLConfig

    def setup(self):
        self.vision = ViT(self.cfg.vision, name="vision")
        self.llm = GPTModel(self.cfg.llm, name="llm")
        V, H = self.cfg.vision.hidden_size, self.cfg.llm.hidden_size
        # HF Gemma3MultiModalProjector: RMSNorm (gemma (1+w) convention) in
        # vision space, then a bias-free linear into LLM hidden
        self.mm_norm_scale = self.param(
            "mm_soft_emb_norm", nn.initializers.zeros, (V,), jnp.float32)
        self.mm_proj = nn.DenseGeneral(
            H, use_bias=False, name="mm_input_projection")

    def encode_images(self, images, *, train=False):
        """[B, H, W, 3] → [B, tokens_per_image, H_llm]: SigLIP patches →
        4×4 avg pool on the patch grid → RMSNorm → linear."""
        cfg = self.cfg
        feats = self.vision(images, train=train)  # [B, P, V] (no CLS)
        if cfg.freeze_vision:
            feats = jax.lax.stop_gradient(feats)
        B, P, V = feats.shape
        side = cfg.vision.image_size // cfg.vision.patch_size
        k = cfg.pool
        grid = feats.reshape(B, side, side, V)
        pooled = nn.avg_pool(grid, (k, k), strides=(k, k))
        x = pooled.reshape(B, (side // k) ** 2, V).astype(jnp.float32)
        var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(var + cfg.rms_eps) * (1.0 + self.mm_norm_scale)
        return self.mm_proj(x)

    def splice(self, tokens, img):
        """Image features land at the placeholder positions (i-th
        placeholder of a row ← i-th pooled feature; the collator emits
        exactly n_images·tokens_per_image placeholders per row). Gemma
        scales TEXT embeddings by sqrt(hidden) inside the LLM
        (embedding_multiplier) but image features enter UNSCALED — the
        spliced features are pre-divided so the LLM's multiplier cancels."""
        is_img = tokens == self.cfg.image_token_id
        txt = self.llm.embed_tokens(jnp.where(is_img, 0, tokens))
        m = self.cfg.llm.embedding_multiplier or 1.0
        idx = jnp.cumsum(is_img.astype(jnp.int32), axis=1) - 1
        gathered = jnp.take_along_axis(
            (img / m).astype(txt.dtype),
            jnp.clip(idx, 0, img.shape[1] - 1)[..., None], axis=1)
        return jnp.where(is_img[..., None], gathered, txt)

    def __call__(self, images, tokens, *, train=False):
        """images [B·N, H, W, 3] (N images per row, row-major), tokens
        [B, S] containing N·tokens_per_image placeholders → logits [B,S,V].
        """
        B, S = tokens.shape
        img = self.encode_images(images, train=train)  # [B·N, T, H]
        n = img.shape[0] // B
        img = img.reshape(B, n * img.shape[1], img.shape[2])
        x = self.splice(tokens, img)
        bidir = image_span_ids(tokens, self.cfg.image_token_id)
        return self.llm(tokens=None, inputs_embeds=x, bidir_ids=bidir,
                        train=train)

    def loss(self, images, tokens, loss_mask, *, train=True):
        logits = self(images, tokens, train=train)
        labels = tokens[:, 1:]
        mask = loss_mask[:, 1:] * (labels != self.cfg.image_token_id)
        lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32))
        nll = -jnp.take_along_axis(lp, labels[..., None], -1)[..., 0]
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)


def _siglip_so400m(image_size: int = 896) -> ViTConfig:
    """SigLIP so400m/14 tower (HF siglip-so400m-patch14: hidden 1152,
    27 layers, 16 heads, MLP 4304, gelu_pytorch_tanh, no CLS)."""
    return ViTConfig(
        image_size=image_size, patch_size=14, hidden_size=1152,
        num_layers=27, num_heads=16, ffn_hidden_size=4304,
        use_cls_token=False, hidden_act="gelu", layernorm_epsilon=1e-6)


def gemma3vl_4b(**kw) -> Gemma3VLConfig:
    from nemo_tpu.models.llm.config import gemma3_4b

    d = dict(llm=gemma3_4b(), vision=_siglip_so400m())
    d.update(kw)
    return Gemma3VLConfig(**d)


def gemma3vl_12b(**kw) -> Gemma3VLConfig:
    from nemo_tpu.models.llm.config import gemma3_12b

    d = dict(llm=gemma3_12b(), vision=_siglip_so400m())
    d.update(kw)
    return Gemma3VLConfig(**d)


def gemma3vl_27b(**kw) -> Gemma3VLConfig:
    from nemo_tpu.models.llm.config import gemma3_27b

    d = dict(llm=gemma3_27b(), vision=_siglip_so400m())
    d.update(kw)
    return Gemma3VLConfig(**d)
