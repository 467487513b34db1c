"""T5 family (encoder-decoder with relative position bias buckets).

Reference parity: `nemo/collections/llm/t5/model/t5.py` (T5Config 220M/3B/11B,
MCore T5). RMSNorm pre-LN, relative-position bias shared from the first
layer of each stack, ReLU or gated-GELU MLP, cross attention, tied
embeddings with scaled output head.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class T5Config:
    num_layers: int = 12  # encoder layers (decoder same)
    hidden_size: int = 768
    ffn_hidden_size: int = 3072
    num_attention_heads: int = 12
    kv_channels: int = 64
    vocab_size: int = 32128
    seq_length: int = 512
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layernorm_epsilon: float = 1e-6
    gated_gelu: bool = True
    dropout: float = 0.1
    compute_dtype: str = "float32"


def t5_220m(**kw) -> T5Config:
    d = dict(num_layers=12, hidden_size=768, ffn_hidden_size=2048,
             num_attention_heads=12, gated_gelu=True)
    d.update(kw)
    return T5Config(**d)


def t5_3b(**kw) -> T5Config:
    """(reference: t5/model/t5.py T5Config3B / recipes/t5_3b.py)"""
    d = dict(num_layers=24, hidden_size=2048, ffn_hidden_size=5120,
             num_attention_heads=32, kv_channels=64, gated_gelu=True)
    d.update(kw)
    return T5Config(**d)


def t5_11b(**kw) -> T5Config:
    """(reference: t5/model/t5.py T5Config11B / recipes/t5_11b.py)"""
    d = dict(num_layers=24, hidden_size=4096, ffn_hidden_size=10240,
             num_attention_heads=64, kv_channels=64, gated_gelu=True)
    d.update(kw)
    return T5Config(**d)


def _rel_bucket(rel, bidirectional, num_buckets, max_dist):
    ret = 0
    n = -rel
    if bidirectional:
        num_buckets //= 2
        ret = (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    log_ratio = jnp.log(n.astype(jnp.float32) / max_exact + 1e-6) / np.log(max_dist / max_exact)
    large = max_exact + (log_ratio * (num_buckets - max_exact)).astype(jnp.int32)
    large = jnp.minimum(large, num_buckets - 1)
    return ret + jnp.where(is_small, n, large)


class T5RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
        return (x * jax.lax.rsqrt(var + self.eps) * scale).astype(x.dtype)


class T5Attention(nn.Module):
    cfg: T5Config
    has_bias: bool = False  # first layer holds the relative bias table
    bidirectional: bool = True

    @nn.compact
    def __call__(self, x, kv, mask, pos_bias=None, *, train=False):
        cfg = self.cfg
        H, dh = cfg.num_attention_heads, cfg.kv_channels
        inner = H * dh
        q = nn.Dense(inner, use_bias=False, name="q")(x).reshape(*x.shape[:2], H, dh)
        k = nn.Dense(inner, use_bias=False, name="k")(kv).reshape(*kv.shape[:2], H, dh)
        v = nn.Dense(inner, use_bias=False, name="v")(kv).reshape(*kv.shape[:2], H, dh)
        s = jnp.einsum("bihd,bjhd->bhij", q, k, preferred_element_type=jnp.float32)
        if self.has_bias:
            Tq, Tk = x.shape[1], kv.shape[1]
            rel = jnp.arange(Tk)[None, :] - jnp.arange(Tq)[:, None]
            buckets = _rel_bucket(rel, self.bidirectional,
                                  cfg.relative_attention_num_buckets,
                                  cfg.relative_attention_max_distance)
            table = self.param("rel_bias", nn.initializers.normal(0.02),
                               (cfg.relative_attention_num_buckets, H))
            pos_bias = jnp.transpose(table[buckets], (2, 0, 1))[None]  # [1,H,Tq,Tk]
        if pos_bias is not None:
            s = s + pos_bias
        s = jnp.where(mask, s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        p = nn.Dropout(cfg.dropout, deterministic=not train)(p)
        o = jnp.einsum("bhij,bjhd->bihd", p.astype(v.dtype), v).reshape(*x.shape[:2], inner)
        return nn.Dense(x.shape[-1], use_bias=False, name="o")(o), pos_bias


class T5MLP(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x, *, train=False):
        cfg = self.cfg
        if cfg.gated_gelu:
            g = nn.Dense(cfg.ffn_hidden_size, use_bias=False, name="wi0")(x)
            u = nn.Dense(cfg.ffn_hidden_size, use_bias=False, name="wi1")(x)
            h = nn.gelu(g, approximate=True) * u
        else:
            h = nn.relu(nn.Dense(cfg.ffn_hidden_size, use_bias=False, name="wi")(x))
        h = nn.Dropout(cfg.dropout, deterministic=not train)(h)
        return nn.Dense(x.shape[-1], use_bias=False, name="wo")(h)


class T5Block(nn.Module):
    cfg: T5Config
    is_decoder: bool = False
    first: bool = False

    @nn.compact
    def __call__(self, x, enc_out, self_mask, cross_mask, pos_bias, *, train=False):
        cfg = self.cfg
        drop = lambda h: nn.Dropout(cfg.dropout, deterministic=not train)(h)

        h = T5RMSNorm(cfg.layernorm_epsilon, name="ln1")(x)
        att, pos_bias = T5Attention(
            cfg, has_bias=self.first, bidirectional=not self.is_decoder,
            name="self_attn",
        )(h, h, self_mask, pos_bias, train=train)
        x = x + drop(att)

        if self.is_decoder:
            h = T5RMSNorm(cfg.layernorm_epsilon, name="ln_cross")(x)
            att, _ = T5Attention(cfg, has_bias=False, name="cross_attn")(
                h, enc_out, cross_mask, None, train=train
            )
            x = x + drop(att)

        h = T5RMSNorm(cfg.layernorm_epsilon, name="ln2")(x)
        x = x + drop(T5MLP(cfg, name="mlp")(h, train=train))
        return x, pos_bias


class T5Model(nn.Module):
    """Encoder-decoder LM. __call__(enc_tokens, dec_tokens, ...) → logits."""

    cfg: T5Config

    @nn.compact
    def __call__(self, enc_tokens, dec_tokens, enc_mask=None, dec_mask=None, *, train=False):
        cfg = self.cfg
        B, Se = enc_tokens.shape
        Sd = dec_tokens.shape[1]
        if enc_mask is None:
            enc_mask = jnp.ones((B, Se), bool)
        if dec_mask is None:
            dec_mask = jnp.ones((B, Sd), bool)

        emb = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="shared_emb")

        # encoder
        x = nn.Dropout(cfg.dropout, deterministic=not train)(emb(enc_tokens))
        self_mask = enc_mask[:, None, None, :]
        pos_bias = None
        for i in range(cfg.num_layers):
            x, pos_bias = T5Block(cfg, is_decoder=False, first=(i == 0),
                                  name=f"enc{i}")(x, None, self_mask, None,
                                                  pos_bias, train=train)
        enc_out = T5RMSNorm(cfg.layernorm_epsilon, name="enc_final_ln")(x)

        # decoder (causal self-attention + cross attention)
        y = nn.Dropout(cfg.dropout, deterministic=not train)(emb(dec_tokens))
        causal = jnp.tril(jnp.ones((Sd, Sd), bool))
        dself = causal[None, None] & dec_mask[:, None, None, :]
        cross = enc_mask[:, None, None, :]
        pos_bias_d = None
        for i in range(cfg.num_layers):
            y, pos_bias_d = T5Block(cfg, is_decoder=True, first=(i == 0),
                                    name=f"dec{i}")(y, enc_out, dself, cross,
                                                    pos_bias_d, train=train)
        y = T5RMSNorm(cfg.layernorm_epsilon, name="dec_final_ln")(y)
        # tied output head with T5's 1/sqrt(d) scaling
        logits = (y * (cfg.hidden_size ** -0.5)) @ emb.embedding.T
        return logits.astype(jnp.float32)


def t5_loss(logits, labels, mask):
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    nll = (lse - gold) * mask
    return jnp.sum(nll) / jnp.maximum(jnp.sum(mask), 1.0)


def t5_greedy_decode(model, variables, enc_tokens, max_len: int, bos_id: int = 0,
                     eos_id: int = 1):
    """Simple greedy seq2seq decode (re-encodes per step; fine for eval)."""
    B = enc_tokens.shape[0]
    dec = jnp.full((B, 1), bos_id, jnp.int32)
    for _ in range(max_len):
        logits = model.apply(variables, enc_tokens, dec)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        dec = jnp.concatenate([dec, nxt[:, None]], axis=1)
    return dec[:, 1:]
