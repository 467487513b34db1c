"""MLlama (Llama-3.2-Vision): gated cross-attention multimodal LLM.

Reference parity: `nemo/collections/vlm/mllama/` — a llama text stack
where every k-th layer is a CROSS-attention block attending to vision
features, gated by zero-initialized tanh gates (attn + FFN gates), so the
model starts numerically identical to the pretrained text LLM; vision
tower runs per-tile with a projection into the text hidden space.

TPU-first: self-attention layers are the repo's GPT TransformerLayer
(flash/einsum paths, KV cache); the cross-attention block is one batched
einsum over [text S × vision P] — no mask, no cache needed (vision keys
are static per request).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nemo_tpu.models.llm.config import GPTConfig
from nemo_tpu.models.llm.gpt import RMSNorm, TransformerLayer, _dtype
from nemo_tpu.models.vision.vit import ViT, ViTConfig


@dataclasses.dataclass(frozen=True)
class MLlamaConfig:
    vision: ViTConfig = dataclasses.field(default_factory=ViTConfig)
    llm: GPTConfig = dataclasses.field(default_factory=GPTConfig)
    # which text layers are cross-attention blocks (reference
    # cross_attention_layers, e.g. every 5th: 3, 8, 13, ...)
    cross_attention_layers: Tuple[int, ...] = (1,)
    freeze_vision: bool = False


class GatedCrossAttentionBlock(nn.Module):
    """x + tanh(g_attn)·CrossAttn(norm(x), vision) + tanh(g_ffn)·MLP —
    zero-init gates ⇒ identity at step 0 (mllama cross-attn layer)."""

    cfg: GPTConfig

    @nn.compact
    def __call__(self, x, vision, *, train=False):
        cfg = self.cfg
        H, D = cfg.num_attention_heads, cfg.head_dim
        dtype = x.dtype
        h = RMSNorm(cfg, name="input_norm")(x)
        q = nn.DenseGeneral((H, D), use_bias=False, dtype=dtype,
                            name="q_proj")(h)
        q = RMSNorm(cfg, dim=D, name="q_norm")(q)
        kv_in = vision.astype(dtype)
        k = nn.DenseGeneral((H, D), use_bias=False, dtype=dtype,
                            name="k_proj")(kv_in)
        k = RMSNorm(cfg, dim=D, name="k_norm")(k)
        v = nn.DenseGeneral((H, D), use_bias=False, dtype=dtype,
                            name="v_proj")(kv_in)
        scores = jnp.einsum("bshd,bphd->bhsp", q, k) / np.sqrt(D)
        probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(dtype)
        att = jnp.einsum("bhsp,bphd->bshd", probs, v)
        att = nn.DenseGeneral(cfg.hidden_size, axis=(-2, -1), use_bias=False,
                              dtype=dtype, name="o_proj")(att)
        g_attn = self.param("attn_gate", nn.initializers.zeros, (1,))
        x = x + jnp.tanh(g_attn).astype(dtype) * att

        h = RMSNorm(cfg, name="post_norm")(x)
        up = nn.Dense(cfg.ffn_hidden_size, use_bias=False, dtype=dtype,
                      name="up_proj")(h)
        gate = nn.Dense(cfg.ffn_hidden_size, use_bias=False, dtype=dtype,
                        name="gate_proj")(h)
        mlp = nn.Dense(cfg.hidden_size, use_bias=False, dtype=dtype,
                       name="down_proj")(nn.silu(gate) * up)
        g_ffn = self.param("ffn_gate", nn.initializers.zeros, (1,))
        return x + jnp.tanh(g_ffn).astype(dtype) * mlp


class MLlamaModel(nn.Module):
    cfg: MLlamaConfig

    @nn.compact
    def __call__(self, images, tokens, *, train=False):
        """images [B,H,W,C], tokens [B,S] → logits [B,S,V]. Cross-attn
        gates are zero-init, so at step 0 the output equals the pure text
        LLM on `tokens` — tested."""
        cfg = self.cfg.llm
        dtype = _dtype(cfg.compute_dtype)
        vis = ViT(self.cfg.vision, name="vision")(images, train=train)
        if self.cfg.freeze_vision:
            vis = jax.lax.stop_gradient(vis)
        vis = nn.Dense(cfg.hidden_size, name="vision_proj")(
            vis.astype(jnp.float32))

        embed = self.param(
            "embedding", nn.initializers.normal(cfg.init_method_std),
            (cfg.vocab_size, cfg.hidden_size), _dtype(cfg.params_dtype))
        x = jnp.take(embed, tokens, axis=0).astype(dtype)
        B, S = tokens.shape
        positions = jnp.arange(S)[None, :].repeat(B, 0)
        for i in range(cfg.num_layers):
            if i in self.cfg.cross_attention_layers:
                x = GatedCrossAttentionBlock(cfg, name=f"xattn{i}")(
                    x, vis, train=train)
            else:
                x, _ = TransformerLayer(cfg, is_training=train,
                                        layer_idx=i, name=f"layer{i}")(
                    x, positions)
        x = RMSNorm(cfg, name="final_norm")(x)
        logits = jnp.einsum("bsd,vd->bsv", x, embed.astype(dtype))
        return logits.astype(jnp.float32)

    def loss(self, images, tokens, loss_mask, *, train=True):
        logits = self(images, tokens, train=train)
        labels = tokens[:, 1:]
        mask = loss_mask[:, 1:]
        lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32))
        nll = -jnp.take_along_axis(lp, labels[..., None], -1)[..., 0]
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)


def mllama_11b(**kw) -> MLlamaConfig:
    """Llama-3.2-11B-Vision shape: llama3-8B text stack + cross-attn every
    5th layer + 630M ViT-H/14 vision tower (HF meta-llama/Llama-3.2-11B-
    Vision)."""
    llm = GPTConfig(num_layers=40, hidden_size=4096, ffn_hidden_size=14336,
                    num_attention_heads=32, num_query_groups=8,
                    vocab_size=128256, seq_length=8192,
                    rotary_base=500000.0, rope_scaling="llama3")
    vision = ViTConfig(image_size=448, patch_size=14, hidden_size=1280,
                       num_layers=32, num_heads=16, ffn_hidden_size=5120)
    cfg = MLlamaConfig(vision=vision, llm=llm,
                       cross_attention_layers=tuple(range(3, 40, 5)))
    return dataclasses.replace(cfg, **kw) if kw else cfg
