"""LLM evaluation: log-likelihood scoring + multiple-choice harness adapter.

Reference parity: `nemo/collections/llm/evaluation/base.py:38` NeMoFWLMEval —
an lm-evaluation-harness `LM` adapter (loglikelihood / generate_until
requests against a deployed model). Here scoring runs in-process on the
jitted model; the same three primitives (loglikelihood, loglikelihood_
rolling, generate_until) are exposed so an external harness can plug in.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nemo_tpu.models.llm.config import GPTConfig
from nemo_tpu.models.llm.gpt import GPTModel


class LMEvaluator:
    def __init__(self, cfg: GPTConfig, params, tokenizer, max_len: int = 2048):
        self.cfg = cfg
        self.model = GPTModel(cfg)
        self.params = params
        self.tokenizer = tokenizer
        self.max_len = max_len
        self._jit = {}

    def _logprobs(self, tokens: jnp.ndarray) -> jnp.ndarray:
        S = tokens.shape[1]
        if S not in self._jit:
            model, params = self.model, self.params

            @jax.jit
            def f(params, tokens):
                logits = model.apply({"params": params}, tokens)
                return jax.nn.log_softmax(logits, axis=-1)

            self._jit[S] = f
        return self._jit[S](self.params, tokens)

    def loglikelihood(self, context: str, continuation: str) -> Tuple[float, bool]:
        """(sum logprob of continuation | context, was it the greedy pick)."""
        c_ids = self.tokenizer.text_to_ids(context)
        x_ids = self.tokenizer.text_to_ids(continuation)
        ids = (c_ids + x_ids)[-self.max_len:]
        n_ctx = len(ids) - len(x_ids)
        S = 2 ** int(np.ceil(np.log2(max(len(ids), 8))))
        toks = np.zeros((1, S), np.int32)
        toks[0, : len(ids)] = ids
        lp = np.asarray(self._logprobs(jnp.asarray(toks)))[0]
        total, greedy = 0.0, True
        for pos in range(n_ctx, len(ids)):
            tgt = ids[pos]
            total += float(lp[pos - 1, tgt])
            if int(np.argmax(lp[pos - 1])) != tgt:
                greedy = False
        return total, greedy

    def loglikelihood_rolling(self, text: str) -> float:
        """Full-sequence logprob (perplexity tasks)."""
        ids = self.tokenizer.text_to_ids(text)[: self.max_len]
        S = 2 ** int(np.ceil(np.log2(max(len(ids), 8))))
        toks = np.zeros((1, S), np.int32)
        toks[0, : len(ids)] = ids
        lp = np.asarray(self._logprobs(jnp.asarray(toks)))[0]
        return float(sum(lp[p - 1, ids[p]] for p in range(1, len(ids))))

    def generate_until(self, prompt: str, stop: Sequence[str], max_new: int = 64) -> str:
        from nemo_tpu.models.llm.generate import GenerationEngine, SamplingParams

        engine = GenerationEngine(self.cfg, self.params)
        ids = self.tokenizer.text_to_ids(prompt)
        out = engine.generate_tokens([ids], SamplingParams(greedy=True, max_new_tokens=max_new))[0]
        text = self.tokenizer.ids_to_text(out)
        for s in stop:
            if s in text:
                text = text.split(s)[0]
        return text


def evaluate_multiple_choice(
    evaluator: LMEvaluator, samples: Sequence[Dict]
) -> Dict[str, float]:
    """samples: [{"context": str, "choices": [str], "answer": int}] → accuracy
    (the lm-eval MC protocol: argmax over per-choice loglikelihood)."""
    correct = 0
    for s in samples:
        scores = [evaluator.loglikelihood(s["context"], c)[0] for c in s["choices"]]
        if int(np.argmax(scores)) == s["answer"]:
            correct += 1
    return {"accuracy": correct / max(len(samples), 1), "n": len(samples)}
