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
        """tokens/mask [B,S] → embeddings [B,D] (unit L2 norm). The mask
        gates ATTENTION too (kv_valid): pad content must not bleed into
        real positions' hidden states before pooling."""
        h = self.llm(tokens, kv_valid=mask.astype(bool), train=train,
                     output_hidden=True)
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
        h = self.llm(tokens, kv_valid=mask.astype(bool), train=train,
                     output_hidden=True)
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
    """reference Llama32EmbeddingConfig1B (avg pool, scale 50, 4 negs;
    bidirectional attention — get_nv_embedding_layer_spec,
    llama_embedding.py:67)."""
    cfg = EmbeddingConfig(llm=llama32_1b(causal=False))
    return dataclasses.replace(cfg, **kw) if kw else cfg


def llama32_3b_embedding(**kw) -> EmbeddingConfig:
    cfg = EmbeddingConfig(llm=llama32_3b(causal=False))
    return dataclasses.replace(cfg, **kw) if kw else cfg


def llama32_1b_reranker(**kw) -> EmbeddingConfig:
    """reference Llama32Reranker1BConfig (avg pool, scale 50; bidirectional
    — reranker.py:32 imports get_nv_embedding_layer_spec)."""
    cfg = EmbeddingConfig(llm=llama32_1b(causal=False))
    return dataclasses.replace(cfg, **kw) if kw else cfg


def bert_embedding_340m(**kw) -> EmbeddingConfig:
    """reference bert_embedding/e5_340m recipes (BERT-large-geometry
    bidirectional encoder). Expressed here as a GPTConfig backbone with
    causal=False + learned absolute positions + LayerNorm + gelu — the
    same architecture BERT is, on the shared GPT stack."""
    llm = GPTConfig(num_layers=24, hidden_size=1024, ffn_hidden_size=4096,
                    num_attention_heads=16, vocab_size=30522, seq_length=512,
                    causal=False, normalization="LayerNorm",
                    gated_linear_unit=False, activation="gelu",
                    add_bias_linear=True,
                    position_embedding_type="learned_absolute")
    cfg = EmbeddingConfig(llm=llm, pool_type="avg")
    return dataclasses.replace(cfg, **kw) if kw else cfg


def bert_embedding_110m(**kw) -> EmbeddingConfig:
    """BERT-base-geometry bidirectional embedder (see bert_embedding_340m)."""
    cfg = bert_embedding_340m()
    llm = dataclasses.replace(cfg.llm, num_layers=12, hidden_size=768,
                              ffn_hidden_size=3072, num_attention_heads=12)
    cfg = dataclasses.replace(cfg, llm=llm)
    return dataclasses.replace(cfg, **kw) if kw else cfg


class EmbeddingTrainModule:
    """Trainer-protocol module for contrastive embedding / reranker
    training (reference finetune path of llama_embedding/reranker recipes).

    batch (embedding): {"q_tokens" [B,S], "q_mask", "d_tokens" [B·G,S],
    "d_mask"} with G = 1 + num_hard_negatives.
    batch (reranker): {"tokens" [B·G,S], "mask"}."""

    def __init__(self, cfg: EmbeddingConfig, mesh_cfg=None, lr_schedule=None,
                 reranker: bool = False):
        import optax

        self.cfg = cfg
        self.reranker = reranker
        self.model = RerankerModel(cfg) if reranker else EmbeddingModel(cfg)
        sched = lr_schedule or (lambda step: 1e-5)
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(1.0), optax.adamw(sched))
        self._jit = None

    def init_state(self, seed: int = 0):
        from nemo_tpu.models.llm.train import TrainState

        S = self.cfg.llm.seq_length
        toks = jnp.zeros((2, min(S, 64)), jnp.int32)
        mask = jnp.ones_like(toks)
        params = nn.meta.unbox(
            self.model.init(jax.random.PRNGKey(seed), toks, mask)["params"])
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=self.optimizer.init(params))

    def train_step(self, state, batch, rng=None):
        import optax

        from nemo_tpu.models.llm.train import TrainState

        if self._jit is None:
            opt = self.optimizer
            model, rr = self.model, self.reranker

            def step(state, batch, rng):
                def lf(p):
                    if rr:
                        return model.apply(
                            {"params": p}, batch["tokens"], batch["mask"],
                            method=RerankerModel.loss,
                            rngs={"dropout": rng})
                    return model.apply(
                        {"params": p}, batch["q_tokens"], batch["q_mask"],
                        batch["d_tokens"], batch["d_mask"],
                        method=EmbeddingModel.ranking_loss,
                        rngs={"dropout": rng})

                (loss, aux), grads = jax.value_and_grad(lf, has_aux=True)(
                    state.params)
                updates, new_opt = opt.update(grads, state.opt_state,
                                              state.params)
                params = optax.apply_updates(state.params, updates)
                return (TrainState(step=state.step + 1, params=params,
                                   opt_state=new_opt),
                        {"loss": loss, **aux})

            self._jit = jax.jit(step, donate_argnums=(0,))
        if rng is None:
            rng = jax.random.PRNGKey(int(state.step))
        return self._jit(state, batch, rng)


class MockContrastiveDataModule:
    """Random (query, pos+negs) batches for embedding/reranker recipes
    (the mock.py analog for the contrastive batch shape)."""

    def __init__(self, seq_length: int, global_batch_size: int,
                 vocab_size: int, num_hard_negatives: int = 4,
                 reranker: bool = False, seed: int = 0, **_):
        self.seq_length = min(seq_length, 128)
        self.global_batch_size = global_batch_size
        self.vocab_size = vocab_size
        self.G = 1 + num_hard_negatives
        self.reranker = reranker
        self.seed = seed
        self.micro_batch_size = None

    def train_batches(self, start_step: int = 0):
        import numpy as np

        rng = np.random.RandomState(self.seed + start_step)
        B, S, G = self.global_batch_size, self.seq_length, self.G
        while True:
            if self.reranker:
                yield {"tokens": jnp.asarray(
                           rng.randint(1, self.vocab_size, (B * G, S))),
                       "mask": jnp.ones((B * G, S), jnp.int32)}
            else:
                yield {"q_tokens": jnp.asarray(
                           rng.randint(1, self.vocab_size, (B, S))),
                       "q_mask": jnp.ones((B, S), jnp.int32),
                       "d_tokens": jnp.asarray(
                           rng.randint(1, self.vocab_size, (B * G, S))),
                       "d_mask": jnp.ones((B * G, S), jnp.int32)}
