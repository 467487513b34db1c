"""Text embedding + reranker models on the GPT stack.

Reference parity: `nemo/collections/llm/gpt/model/llama_embedding.py`
(LlamaEmbeddingModel: decoder hidden states → masked average pooling →
L2-normalized embeddings; HardNegativeRankingLoss / in-batch-negatives
ranking loss with ce_loss_scale, bert/loss.py) and
`nemo/collections/llm/gpt/model/reranker.py` (ReRankerModel: pooled
hidden → scalar score head, listwise CE over 1 positive + N negatives
with label smoothing).

TPU-first: the pooling/losses are pure jnp over [B,S,D] hidden states from
the shared `GPTModel` (same shardings, fused-CE machinery unused here);
group structure (query, pos, negs) is static so the whole contrastive step
jits once.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from nemo_tpu.models.llm.config import GPTConfig, llama32_1b, llama32_3b
from nemo_tpu.models.llm.gpt import GPTModel, _dtype, _init


@dataclasses.dataclass(frozen=True)
class EmbeddingConfig:
    llm: GPTConfig = dataclasses.field(default_factory=GPTConfig)
    pool_type: str = "avg"  # avg | last | weighted_avg | cls
    ce_loss_scale: float = 50.0  # reference Llama32EmbeddingConfig1B
    num_hard_negatives: int = 4
    in_batch_negatives: bool = False
    label_smoothing: float = 0.0


def pool_hidden(h: jnp.ndarray, mask: jnp.ndarray, pool_type: str) -> jnp.ndarray:
    """[B,S,D] hidden + [B,S] validity mask → [B,D] (reference
    llama_embedding.py _average_pool / reranker.py pool)."""
    m = mask.astype(h.dtype)
    if pool_type == "avg":
        return jnp.sum(h * m[..., None], axis=1) / jnp.maximum(
            jnp.sum(m, axis=1, keepdims=True), 1.0)
    if pool_type == "weighted_avg":
        # later positions weigh more (position-weighted mean)
        w = m * jnp.cumsum(m, axis=1)
        return jnp.sum(h * w[..., None], axis=1) / jnp.maximum(
            jnp.sum(w, axis=1, keepdims=True), 1.0)
    if pool_type == "last":
        idx = jnp.maximum(jnp.sum(mask, axis=1).astype(jnp.int32) - 1, 0)
        return jnp.take_along_axis(h, idx[:, None, None], axis=1)[:, 0]
    if pool_type == "cls":
        return h[:, 0]
    raise ValueError(f"unknown pool_type {pool_type}")


class EmbeddingModel(nn.Module):
    """GPT decoder → pooled, L2-normalized sentence embedding."""

    cfg: EmbeddingConfig

    def setup(self):
        self.llm = GPTModel(self.cfg.llm, name="llm")

    def __call__(self, tokens, mask, *, train=False):
        """tokens/mask [B,S] → embeddings [B,D] (unit L2 norm)."""
        h = self.llm(tokens, train=train, output_hidden=True)
        pooled = pool_hidden(h.astype(jnp.float32), mask, self.cfg.pool_type)
        return pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-9)

    def ranking_loss(self, q_tokens, q_mask, d_tokens, d_mask, *, train=True):
        """Contrastive ranking loss. Documents are grouped per query as
        [1 positive + num_hard_negatives], flattened:
        d_tokens [B·(1+N), S]. With in_batch_negatives, other queries'
        positives join the candidate set (reference
        BERTInBatchExclusiveHardNegativesRankingLoss); otherwise only the
        query's own group competes (HardNegativeRankingLoss)."""
        cfg = self.cfg
        G = 1 + cfg.num_hard_negatives
        q = self(q_tokens, q_mask, train=train)        # [B, D]
        d = self(d_tokens, d_mask, train=train)        # [B*G, D]
        B = q.shape[0]
        scores_own = jnp.einsum(
            "bd,bgd->bg", q, d.reshape(B, G, -1)) * cfg.ce_loss_scale
        if cfg.in_batch_negatives:
            pos = d.reshape(B, G, -1)[:, 0]            # [B, D]
            sc_all = jnp.einsum("bd,cd->bc", q, pos) * cfg.ce_loss_scale
            # exclude self-column (it already appears in scores_own[:, 0])
            sc_all = jnp.where(jnp.eye(B, dtype=bool), -1e30, sc_all)
            logits = jnp.concatenate([scores_own, sc_all], axis=1)
        else:
            logits = scores_own
        lp = jax.nn.log_softmax(logits, axis=-1)
        n_cls = logits.shape[-1]
        eps = cfg.label_smoothing
        loss = -(1 - eps) * lp[:, 0] - eps * jnp.mean(lp, axis=-1) * (
            n_cls / max(n_cls - 1, 1))
        acc = jnp.mean((jnp.argmax(logits, -1) == 0).astype(jnp.float32))
        return jnp.mean(loss), {"accuracy": acc}


class RerankerModel(nn.Module):
    """GPT decoder over (query ⊕ document) pairs → scalar relevance score
    (reference reranker.py ReRankerModel + ReRankerLoss)."""

    cfg: EmbeddingConfig

    def setup(self):
        self.llm = GPTModel(self.cfg.llm, name="llm")
        self.score = nn.Dense(
            1, use_bias=False, dtype=jnp.float32,
            param_dtype=_dtype(self.cfg.llm.params_dtype),
            kernel_init=_init(self.cfg.llm.init_method_std, ("embed", None)))

    def __call__(self, tokens, mask, *, train=False):
        """tokens [B,S] (query+doc concatenated) → scores [B]."""
        h = self.llm(tokens, train=train, output_hidden=True)
        pooled = pool_hidden(h.astype(jnp.float32), mask, self.cfg.pool_type)
        return self.score(pooled)[:, 0]

    def loss(self, tokens, mask, *, train=True):
        """tokens [B·(1+N), S] grouped per query (positive first): listwise
        CE over each group with label smoothing."""
        cfg = self.cfg
        G = 1 + cfg.num_hard_negatives
        scores = self(tokens, mask, train=train).reshape(-1, G)
        scores = scores * cfg.ce_loss_scale
        lp = jax.nn.log_softmax(scores, axis=-1)
        eps = cfg.label_smoothing
        loss = -(1 - eps) * lp[:, 0] - eps * jnp.mean(lp, axis=-1) * (
            G / max(G - 1, 1))
        acc = jnp.mean((jnp.argmax(scores, -1) == 0).astype(jnp.float32))
        return jnp.mean(loss), {"accuracy": acc}


def llama32_1b_embedding(**kw) -> EmbeddingConfig:
    """reference Llama32EmbeddingConfig1B (avg pool, scale 50, 4 negs)."""
    cfg = EmbeddingConfig(llm=llama32_1b())
    return dataclasses.replace(cfg, **kw) if kw else cfg


def llama32_3b_embedding(**kw) -> EmbeddingConfig:
    cfg = EmbeddingConfig(llm=llama32_3b())
    return dataclasses.replace(cfg, **kw) if kw else cfg


def llama32_1b_reranker(**kw) -> EmbeddingConfig:
    """reference Llama32Reranker1BConfig (avg pool, scale 50)."""
    cfg = EmbeddingConfig(llm=llama32_1b())
    return dataclasses.replace(cfg, **kw) if kw else cfg
