"""BERT family (encoder-only, MLM).

Reference parity: `nemo/collections/llm/bert/` (BertConfig variants incl.
embedding models; MCore bert). Bidirectional attention, learned absolute
positions, post-LN or pre-LN, MLM head with tied embeddings.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class BertConfig:
    num_layers: int = 12
    hidden_size: int = 768
    ffn_hidden_size: int = 3072
    num_attention_heads: int = 12
    vocab_size: int = 30522
    seq_length: int = 512
    num_token_types: int = 2
    layernorm_epsilon: float = 1e-12
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    compute_dtype: str = "float32"


def bert_base(**kw) -> BertConfig:
    d = dict(num_layers=12, hidden_size=768, ffn_hidden_size=3072, num_attention_heads=12)
    d.update(kw)
    return BertConfig(**d)


def bert_large(**kw) -> BertConfig:
    d = dict(num_layers=24, hidden_size=1024, ffn_hidden_size=4096, num_attention_heads=16)
    d.update(kw)
    return BertConfig(**d)


class BertLayer(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x, mask, *, train=False):
        cfg = self.cfg
        H = cfg.num_attention_heads
        D = cfg.hidden_size
        dh = D // H
        h = x
        q = nn.Dense(D, name="q")(h).reshape(*h.shape[:2], H, dh)
        k = nn.Dense(D, name="k")(h).reshape(*h.shape[:2], H, dh)
        v = nn.Dense(D, name="v")(h).reshape(*h.shape[:2], H, dh)
        s = jnp.einsum("bihd,bjhd->bhij", q, k, preferred_element_type=jnp.float32)
        s = s / np.sqrt(dh)
        s = jnp.where(mask[:, None, None, :], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        p = nn.Dropout(cfg.attention_dropout, deterministic=not train)(p)
        att = jnp.einsum("bhij,bjhd->bihd", p.astype(v.dtype), v).reshape(*h.shape)
        att = nn.Dense(D, name="o")(att)
        att = nn.Dropout(cfg.hidden_dropout, deterministic=not train)(att)
        x = nn.LayerNorm(epsilon=cfg.layernorm_epsilon, name="ln1")(x + att)  # post-LN

        h = nn.Dense(cfg.ffn_hidden_size, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(D, name="fc2")(h)
        h = nn.Dropout(cfg.hidden_dropout, deterministic=not train)(h)
        return nn.LayerNorm(epsilon=cfg.layernorm_epsilon, name="ln2")(x + h)


class BertModel(nn.Module):
    """Returns (sequence_output [B,S,D], mlm_logits [B,S,V])."""

    cfg: BertConfig

    @nn.compact
    def __call__(self, tokens, attention_mask=None, token_type_ids=None, *, train=False):
        cfg = self.cfg
        B, S = tokens.shape
        if attention_mask is None:
            attention_mask = jnp.ones((B, S), bool)
        emb = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="word_emb")
        x = emb(tokens)
        pos = self.param("pos_emb", nn.initializers.normal(0.02),
                         (cfg.seq_length, cfg.hidden_size))
        x = x + pos[None, :S]
        if token_type_ids is not None:
            x = x + nn.Embed(cfg.num_token_types, cfg.hidden_size, name="type_emb")(token_type_ids)
        x = nn.LayerNorm(epsilon=cfg.layernorm_epsilon, name="emb_ln")(x)
        x = nn.Dropout(cfg.hidden_dropout, deterministic=not train)(x)
        for i in range(cfg.num_layers):
            x = BertLayer(cfg, name=f"layer{i}")(x, attention_mask, train=train)
        # MLM head: transform + tied-embedding decoder
        h = nn.Dense(cfg.hidden_size, name="mlm_dense")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.LayerNorm(epsilon=cfg.layernorm_epsilon, name="mlm_ln")(h)
        logits = h @ emb.embedding.T + self.param(
            "mlm_bias", nn.initializers.zeros, (cfg.vocab_size,))
        return x, logits.astype(jnp.float32)


def mlm_loss(logits, labels, mask):
    """Masked-LM cross entropy over masked positions."""
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    nll = (lse - gold) * mask
    return jnp.sum(nll) / jnp.maximum(jnp.sum(mask), 1.0)
