"""Embedding + reranker models (reference llama_embedding.py / reranker.py):
pooling math, contrastive ranking losses, and a short training run that
separates a learnable toy retrieval task."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nemo_tpu.models.llm.config import GPTConfig
from nemo_tpu.models.llm.embedding import (
    EmbeddingConfig, EmbeddingModel, RerankerModel, llama32_1b_embedding,
    llama32_1b_reranker, pool_hidden)


def _tiny_cfg(**kw):
    llm = GPTConfig(num_layers=2, hidden_size=32, ffn_hidden_size=64,
                    num_attention_heads=4, num_query_groups=2, vocab_size=32,
                    seq_length=16, params_dtype="float32",
                    compute_dtype="float32", remat="none")
    base = dict(llm=llm, num_hard_negatives=2)
    base.update(kw)
    return EmbeddingConfig(**base)


def test_pool_hidden_variants():
    h = jnp.asarray(np.arange(24, dtype=np.float32).reshape(1, 4, 6))
    mask = jnp.asarray([[1, 1, 1, 0]])
    avg = pool_hidden(h, mask, "avg")
    np.testing.assert_allclose(np.asarray(avg[0]),
                               np.asarray(h[0, :3].mean(0)), atol=1e-6)
    last = pool_hidden(h, mask, "last")
    np.testing.assert_allclose(np.asarray(last[0]), np.asarray(h[0, 2]))
    cls = pool_hidden(h, mask, "cls")
    np.testing.assert_allclose(np.asarray(cls[0]), np.asarray(h[0, 0]))
    w = pool_hidden(h, mask, "weighted_avg")
    ref = (1 * h[0, 0] + 2 * h[0, 1] + 3 * h[0, 2]) / 6
    np.testing.assert_allclose(np.asarray(w[0]), np.asarray(ref), atol=1e-6)


def test_embeddings_unit_norm():
    cfg = _tiny_cfg()
    m = EmbeddingModel(cfg)
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, 32, (3, 8)))
    mask = jnp.ones((3, 8), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), toks, mask)
    emb = m.apply(params, toks, mask)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb), axis=-1), 1.0, atol=1e-5)


def _toy_retrieval_batch(rng, B, G, S, vocab):
    """Toy task the model must LEARN: query token t's positive doc is
    (t+7) % vocab — not equal to t, so cosine at init carries no signal."""
    qs = rng.integers(1, vocab, B)
    q_tokens = np.tile(qs[:, None], (1, S))
    d_tokens = np.zeros((B, G, S), np.int64)
    for b in range(B):
        d_tokens[b, 0] = (qs[b] + 7) % vocab
        for g in range(1, G):
            neg = rng.integers(0, vocab)
            while neg == (qs[b] + 7) % vocab:
                neg = rng.integers(0, vocab)
            d_tokens[b, g] = neg
    return (jnp.asarray(q_tokens), jnp.asarray(d_tokens.reshape(B * G, S)))


def test_embedding_training_separates_toy_task():
    cfg = _tiny_cfg(num_hard_negatives=2, ce_loss_scale=10.0)
    m = EmbeddingModel(cfg)
    rng = np.random.default_rng(1)
    B, G, S = 4, 3, 8
    q, d = _toy_retrieval_batch(rng, B, G, S, 32)
    mask_q = jnp.ones(q.shape, jnp.int32)
    mask_d = jnp.ones(d.shape, jnp.int32)
    params = m.init(jax.random.PRNGKey(0), q, mask_q)
    opt = optax.adam(3e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state, q, d):
        def lf(p):
            loss, aux = m.apply(p, q, mask_q, d, mask_d,
                                method=EmbeddingModel.ranking_loss)
            return loss, aux
        (loss, aux), grads = jax.value_and_grad(lf, has_aux=True)(params)
        upd, state = opt.update(grads, state)
        return optax.apply_updates(params, upd), state, loss, aux

    losses, accs = [], []
    for i in range(100):
        q, d = _toy_retrieval_batch(rng, B, G, S, 32)
        params, state, loss, aux = step(params, state, q, d)
        losses.append(float(loss))
        accs.append(float(aux["accuracy"]))
    assert np.mean(losses[-10:]) < np.mean(losses[:10]), losses[::10]
    assert np.mean(accs[-10:]) >= 0.75


def test_in_batch_negatives_path():
    cfg = _tiny_cfg(in_batch_negatives=True)
    m = EmbeddingModel(cfg)
    rng = np.random.default_rng(2)
    q, d = _toy_retrieval_batch(rng, 4, 3, 8, 32)
    mq, md = jnp.ones(q.shape, jnp.int32), jnp.ones(d.shape, jnp.int32)
    params = m.init(jax.random.PRNGKey(0), q, mq)
    loss, aux = m.apply(params, q, mq, d, md,
                        method=EmbeddingModel.ranking_loss)
    assert np.isfinite(float(loss)) and 0.0 <= float(aux["accuracy"]) <= 1.0


def test_reranker_training_learns_toy_task():
    cfg = _tiny_cfg(num_hard_negatives=2, label_smoothing=0.05,
                    ce_loss_scale=1.0)
    m = RerankerModel(cfg)
    rng = np.random.default_rng(3)
    B, G, S = 4, 3, 8

    def batch():
        # pair tokens: positive pairs are constant rows, negatives alternate
        toks = np.zeros((B * G, S), np.int64)
        for b in range(B):
            t = rng.integers(1, 16)
            toks[b * G + 0] = t  # "matching" pair signature
            for g in range(1, G):
                toks[b * G + g, 0::2] = t
                toks[b * G + g, 1::2] = (t + rng.integers(1, 15)) % 16 + 16
        return jnp.asarray(toks)

    toks = batch()
    mask = jnp.ones(toks.shape, jnp.int32)
    params = m.init(jax.random.PRNGKey(0), toks, mask)
    opt = optax.adam(3e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state, toks):
        def lf(p):
            return m.apply(p, toks, mask, method=RerankerModel.loss)
        (loss, aux), grads = jax.value_and_grad(lf, has_aux=True)(params)
        upd, state = opt.update(grads, state)
        return optax.apply_updates(params, upd), state, loss, aux

    losses = []
    for i in range(60):
        params, state, loss, aux = step(params, state, batch())
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses[::10]
    assert float(aux["accuracy"]) >= 0.75


def test_presets_construct():
    assert llama32_1b_embedding().ce_loss_scale == 50.0
    assert llama32_1b_embedding(num_hard_negatives=8).num_hard_negatives == 8
    assert llama32_1b_reranker().pool_type == "avg"


def test_retrieval_datamodule_feeds_ranking_loss(tmp_path):
    """RetrievalDataModule batches drive EmbeddingModel.ranking_loss
    (reference CustomRetrievalDataModule → embedding finetune)."""
    import json as _json

    import jax
    import numpy as np

    from nemo_tpu.data.retrieval import RetrievalDataModule

    class ByteTok:
        def text_to_ids(self, t):
            return [1 + (b % 30) for b in t.encode()]

    p = tmp_path / "retr.jsonl"
    rows = [
        {"question": "capital of france", "pos_doc": ["paris is the capital"],
         "neg_doc": ["berlin", "madrid", "rome"]},
        {"question": "largest ocean", "pos_doc": "the pacific ocean",
         "neg_doc": ["the atlantic"]},
        {"question": "red planet", "pos_doc": "mars",
         "neg_doc": ["venus", "jupiter"]},
        {"question": "no negs drop", "pos_doc": "x", "neg_doc": []},
    ]
    with open(p, "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
    dm = RetrievalDataModule(str(p), ByteTok(), seq_length=16,
                             global_batch_size=3, num_hard_negatives=2)
    assert len(dm.examples) == 3  # zero-negative row dropped
    batch = next(dm.train_batches(0))
    assert batch["q_tokens"].shape == (3, 16)
    assert batch["d_tokens"].shape == (3 * 3, 16)

    cfg = _tiny_cfg(num_hard_negatives=2)
    model = EmbeddingModel(cfg)
    params = model.init(jax.random.PRNGKey(0), batch["q_tokens"],
                        batch["q_mask"])
    loss, aux = model.apply(params, batch["q_tokens"], batch["q_mask"],
                            batch["d_tokens"], batch["d_mask"],
                            train=False, method=EmbeddingModel.ranking_loss)
    assert np.isfinite(float(loss))
