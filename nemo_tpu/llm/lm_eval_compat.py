"""Vendored minimal lm-evaluation-harness API surface.

Reference parity: `nemo/collections/llm/evaluation/base.py:25-40` —
NeMoFWLMEval subclasses `lm_eval.api.model.LM` and answers the harness's
three request types (loglikelihood / loglikelihood_rolling /
generate_until), each delivered as `Instance`s whose `.args` carry the
request payload. The external `lm_eval` wheel is absent from this image,
so this module implements the exact call-signature contract those classes
expose: the adapter in `llm/evaluation.py` runs against THIS base when the
real package is missing, and a real harness drops in unchanged when it is
installed (same attribute names, same request/response shapes).

This is a clean-room implementation of the public protocol (per the
harness docs' LM interface), not vendored harness code.
"""

from __future__ import annotations

import abc
import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple


@dataclasses.dataclass
class Instance:
    """lm_eval.api.instance.Instance call shape: request_type selects the
    LM method; args is the positional payload ((context, continuation) for
    loglikelihood, (text,) for rolling, (context, gen_kwargs) for
    generate_until)."""

    request_type: str
    doc: Dict[str, Any]
    args: Tuple
    idx: int = 0


class LM(abc.ABC):
    """lm_eval.api.model.LM protocol: three request-batch methods, each
    list-in/list-out, order-preserving."""

    @abc.abstractmethod
    def loglikelihood(self, requests: Sequence[Instance]
                      ) -> List[Tuple[float, bool]]:
        """[(sum logprob of continuation | context, is_greedy)]"""

    @abc.abstractmethod
    def loglikelihood_rolling(self, requests: Sequence[Instance]
                              ) -> List[float]:
        """[full-text logprob] (perplexity tasks)"""

    @abc.abstractmethod
    def generate_until(self, requests: Sequence[Instance]) -> List[str]:
        """[generated text, truncated at gen_kwargs['until'] stops]"""


# --------------------------------------------------------------------------
# Task runner (the harness's evaluate() flow for the two task shapes the
# reference's evaluate() API exercises: multiple-choice and greedy-match)
# --------------------------------------------------------------------------


def build_requests(task: Dict[str, Any]) -> List[Instance]:
    """task:
      {"type": "multiple_choice",
       "docs": [{"query": str, "choices": [str], "gold": int}]}
    | {"type": "generate_until",
       "docs": [{"query": str, "answer": str}],
       "until": [str], "max_gen_toks": int}
    """
    reqs: List[Instance] = []
    if task["type"] == "multiple_choice":
        for i, doc in enumerate(task["docs"]):
            for choice in doc["choices"]:
                reqs.append(Instance("loglikelihood", doc,
                                     (doc["query"], choice), idx=i))
    elif task["type"] == "generate_until":
        until = list(task.get("until", ["\n"]))
        kw = {"until": until,
              "max_gen_toks": int(task.get("max_gen_toks", 32))}
        for i, doc in enumerate(task["docs"]):
            reqs.append(Instance("generate_until", doc,
                                 (doc["query"], kw), idx=i))
    else:
        raise ValueError(f"unknown task type {task['type']}")
    return reqs


def simple_evaluate(lm: LM, task: Dict[str, Any]) -> Dict[str, float]:
    """Run one task end-to-end through an LM (the harness's
    evaluator.simple_evaluate single-task core): dispatch the request
    batch to the protocol method, then score."""
    reqs = build_requests(task)
    if task["type"] == "multiple_choice":
        res = lm.loglikelihood(reqs)
        assert len(res) == len(reqs), "LM must answer every request"
        # regroup per doc in emission order
        acc = acc_norm = 0
        off = 0
        for doc in task["docs"]:
            n = len(doc["choices"])
            scores = [float(ll) for ll, _ in res[off:off + n]]
            norm = [s / max(len(c), 1)
                    for s, c in zip(scores, doc["choices"])]
            acc += int(scores.index(max(scores)) == doc["gold"])
            acc_norm += int(norm.index(max(norm)) == doc["gold"])
            off += n
        n_docs = max(len(task["docs"]), 1)
        return {"acc": acc / n_docs, "acc_norm": acc_norm / n_docs,
                "n": len(task["docs"])}
    res = lm.generate_until(reqs)
    assert len(res) == len(reqs)
    em = sum(int(out.strip() == doc["answer"].strip())
             for out, doc in zip(res, (r.doc for r in reqs)))
    n_docs = max(len(task["docs"]), 1)
    return {"exact_match": em / n_docs, "n": len(task["docs"])}
