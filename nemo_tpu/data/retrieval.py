"""Retrieval / reranker fine-tuning datamodule.

Reference parity: CustomRetrievalDataModule
(`nemo/collections/llm/gpt/data/retrieval.py:30` — jsonl rows with
configurable query/pos_doc/neg_doc keys, one positive + a list of hard
negatives per query). Batches are shaped for
`EmbeddingModel.ranking_loss` / `RerankerModel.loss`
(`models/llm/embedding.py`): queries [B, S] and documents flattened
[B·(1+num_hard_negatives), S] with the positive first in each group.
"""

from __future__ import annotations

import json
from typing import Dict, Iterator, List

import numpy as np


class RetrievalDataModule:
    def __init__(
        self,
        path: str,
        tokenizer,
        seq_length: int,
        global_batch_size: int,
        num_hard_negatives: int = 4,
        query_key: str = "question",
        pos_doc_key: str = "pos_doc",
        neg_doc_key: str = "neg_doc",
        seed: int = 0,
    ):
        self.tokenizer = tokenizer
        self.seq_length = seq_length
        self.global_batch_size = global_batch_size
        self.num_hard_negatives = num_hard_negatives
        self.seed = seed
        self.examples: List[Dict] = []
        with open(path) as f:
            for line in f:
                if not line.strip():
                    continue
                o = json.loads(line)
                pos = o[pos_doc_key]
                pos = pos[0] if isinstance(pos, list) else pos
                neg = o[neg_doc_key]
                neg = neg if isinstance(neg, list) else [neg]
                if not neg:
                    continue
                self.examples.append(
                    {"query": o[query_key], "pos_doc": pos, "neg_doc": neg})

    def _ids(self, text: str) -> np.ndarray:
        ids = self.tokenizer.text_to_ids(text)[: self.seq_length]
        out = np.zeros(self.seq_length, np.int32)
        out[: len(ids)] = ids
        return out

    def _mask(self, text: str) -> np.ndarray:
        n = min(len(self.tokenizer.text_to_ids(text)), self.seq_length)
        out = np.zeros(self.seq_length, np.float32)
        out[:n] = 1.0
        return out

    def train_batches(self, start_step: int = 0) -> Iterator[Dict]:
        import jax.numpy as jnp

        rng = np.random.RandomState(self.seed)
        B, N, S = self.global_batch_size, self.num_hard_negatives, self.seq_length
        step = 0
        while True:
            order = rng.permutation(len(self.examples))
            for i in range(0, len(order) - B + 1, B):
                group = [self.examples[j] for j in order[i : i + B]]
                q_tok = np.stack([self._ids(g["query"]) for g in group])
                q_mask = np.stack([self._mask(g["query"]) for g in group])
                d_tok = np.zeros((B, 1 + N, S), np.int32)
                d_mask = np.zeros((B, 1 + N, S), np.float32)
                for b, g in enumerate(group):
                    docs = [g["pos_doc"]]
                    negs = g["neg_doc"]
                    # sample N hard negatives, cycling when fewer exist
                    picks = rng.permutation(len(negs))
                    docs += [negs[picks[k % len(negs)]] for k in range(N)]
                    for k, doc in enumerate(docs):
                        d_tok[b, k] = self._ids(doc)
                        d_mask[b, k] = self._mask(doc)
                if step >= start_step:
                    yield {
                        "q_tokens": jnp.asarray(q_tok),
                        "q_mask": jnp.asarray(q_mask),
                        "d_tokens": jnp.asarray(d_tok.reshape(B * (1 + N), S)),
                        "d_mask": jnp.asarray(d_mask.reshape(B * (1 + N), S)),
                    }
                step += 1
