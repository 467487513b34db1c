"""Qwen2-VL: multimodal LLM with M-RoPE (multimodal rotary embedding).

Reference parity: `nemo/collections/vlm/qwen2vl/` — the defining
mechanics are (a) M-RoPE: 3-axis (temporal, height, width) position ids
with per-frequency-section rotation (`mrope_section`), text tokens
carrying identical ids on all axes; (b) the spatial patch merger
compressing 2×2 neighbor patches into one LLM token; (c) vision features
spliced at image-placeholder positions.

TPU-first: M-RoPE is a gather over a static section-index table + the
same fused sin/cos rotation as 1-D RoPE (`models/llm/gpt.py:apply_mrope`)
— zero extra matmuls; position-id construction (data-dependent) runs in
the host collator (numpy), keeping the jitted graph free of dynamic
shapes, exactly like the reference's CPU-side get_rope_index.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nemo_tpu.models.llm.config import GPTConfig
from nemo_tpu.models.llm.gpt import GPTModel
from nemo_tpu.models.vision.vit import ViT, ViTConfig


@dataclasses.dataclass(frozen=True)
class Qwen2VLConfig:
    vision: ViTConfig = dataclasses.field(
        default_factory=lambda: ViTConfig(use_cls_token=False))
    llm: GPTConfig = dataclasses.field(default_factory=GPTConfig)
    image_token_id: int = 0
    spatial_merge_size: int = 2   # 2×2 patch merger


class PatchMerger(nn.Module):
    """2×2 neighbor-patch merge → MLP → LLM hidden (qwen2vl PatchMerger):
    [B, h, w, D] grid → [B, h/m · w/m, H_llm]."""

    out_dim: int
    merge: int = 2

    @nn.compact
    def __call__(self, grid):
        B, h, w, D = grid.shape
        m = self.merge
        x = grid.reshape(B, h // m, m, w // m, m, D)
        x = jnp.einsum("bhpwqd->bhwpqd", x).reshape(
            B, (h // m) * (w // m), m * m * D)
        x = nn.LayerNorm(name="ln_q")(x)
        x = nn.Dense(m * m * D, name="fc1")(x)
        return nn.Dense(self.out_dim, name="fc2")(nn.gelu(x, approximate=True))


def get_mrope_positions(tokens: np.ndarray, image_token_id: int,
                        grids: Sequence[Sequence[Tuple[int, int, int]]]
                        ) -> np.ndarray:
    """Host-side 3-axis position ids (qwen2vl get_rope_index):

    text runs get one sequential id on all three axes; an image span with
    merged grid (t,h,w) gets temporal/row/col ids offset by the running
    position; text resumes at offset + max(t,h,w). tokens [B,S] (each row
    must contain exactly sum(t·h·w) placeholders for its grids) →
    [B, S, 3] int32."""
    B, S = tokens.shape
    out = np.zeros((B, S, 3), np.int64)
    for b in range(B):
        gi = 0
        pos = 0
        s = 0
        row = tokens[b]
        while s < S:
            if row[s] == image_token_id:
                t, h, w = grids[b][gi]
                n = t * h * w
                tt = np.repeat(np.arange(t), h * w)
                hh = np.tile(np.repeat(np.arange(h), w), t)
                ww = np.tile(np.arange(w), t * h)
                out[b, s:s + n, 0] = pos + tt
                out[b, s:s + n, 1] = pos + hh
                out[b, s:s + n, 2] = pos + ww
                pos += max(t, h, w)
                s += n
                gi += 1
            else:
                out[b, s] = pos
                pos += 1
                s += 1
    return out.astype(np.int32)


class Qwen2VLModel(nn.Module):
    cfg: Qwen2VLConfig

    def setup(self):
        self.vision = ViT(self.cfg.vision, name="vision")
        self.llm = GPTModel(self.cfg.llm, name="llm")
        self.merger = PatchMerger(self.cfg.llm.hidden_size,
                                  self.cfg.spatial_merge_size, name="merger")

    def encode_images(self, images, *, train=False):
        """[B,H,W,C] → merged vision tokens [B, P/m², H_llm]."""
        feats = self.vision(images, train=train)  # [B, P, D]
        g = self.cfg.vision.image_size // self.cfg.vision.patch_size
        grid = feats.reshape(feats.shape[0], g, g, feats.shape[-1])
        return self.merger(grid)

    def __call__(self, images, tokens, positions, *, train=False):
        """positions [B,S,3] from `get_mrope_positions` → logits [B,S,V]."""
        img = self.encode_images(images, train=train)
        is_img = tokens == self.cfg.image_token_id
        txt = self.llm.embed_tokens(jnp.where(is_img, 0, tokens))
        idx = jnp.cumsum(is_img.astype(jnp.int32), axis=1) - 1
        gathered = jnp.take_along_axis(
            img.astype(txt.dtype),
            jnp.clip(idx, 0, img.shape[1] - 1)[..., None], axis=1)
        x = jnp.where(is_img[..., None], gathered, txt)
        return self.llm(tokens=None, inputs_embeds=x, positions=positions,
                        train=train)

    def loss(self, images, tokens, positions, loss_mask, *, train=True):
        logits = self(images, tokens, positions, train=train)
        labels = tokens[:, 1:]
        mask = loss_mask[:, 1:] * (labels != self.cfg.image_token_id)
        lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32))
        nll = -jnp.take_along_axis(lp, labels[..., None], -1)[..., 0]
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)


def qwen2vl_2b(**kw) -> Qwen2VLConfig:
    """Qwen2-VL-2B shape: 1536-hidden 28-layer LLM w/ mrope (16,24,24),
    675M ViT w/ 2×2 merger (HF Qwen/Qwen2-VL-2B-Instruct)."""
    llm = GPTConfig(
        num_layers=28, hidden_size=1536, ffn_hidden_size=8960,
        num_attention_heads=12, num_query_groups=2, vocab_size=151936,
        seq_length=32768, rotary_base=1000000.0,
        mrope_sections=(16, 24, 24), add_qkv_bias=True)
    vision = ViTConfig(image_size=336, patch_size=14, hidden_size=1280,
                       num_layers=32, num_heads=16, ffn_hidden_size=5120,
                       use_cls_token=False)
    cfg = Qwen2VLConfig(vision=vision, llm=llm, image_token_id=151655)
    return dataclasses.replace(cfg, **kw) if kw else cfg
