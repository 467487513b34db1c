"""Endpoint evaluation + batched/length-normalized MC tests
(reference: llm/evaluation/base.py NeMoFWLMEval)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu.llm.evaluation import (
    EndpointEvaluator,
    LMEvaluator,
    evaluate_multiple_choice,
    make_lm_eval_adapter,
)
from nemo_tpu.models.llm.config import tiny_test
from nemo_tpu.models.llm.gpt import GPTModel


class ByteTok:
    def text_to_ids(self, t):
        return [b % 120 for b in t.encode()] or [1]

    def ids_to_text(self, ids):
        return bytes(max(32, min(126, i + 32)) for i in ids).decode(errors="replace")


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test()
    model = GPTModel(cfg)
    import flax.linen as nn
    params = nn.meta.unbox(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))["params"])
    return cfg, params


def test_batched_ll_matches_single(setup):
    cfg, params = setup
    ev = LMEvaluator(cfg, params, ByteTok(), max_len=64)
    pairs = [("hello ", "world"), ("abc", "defg"), ("x", "y")]
    batched = ev.loglikelihood_batch(pairs)
    single = [ev.loglikelihood(c, x) for c, x in pairs]
    for (bl, bg), (sl, sg) in zip(batched, single):
        assert bl == pytest.approx(sl, abs=1e-3)
        assert bg == sg


def test_mc_protocol_batched_and_norm(setup):
    cfg, params = setup
    ev = LMEvaluator(cfg, params, ByteTok(), max_len=64)
    samples = [{"context": "q1: ", "choices": ["aa", "bbbb"], "answer": 0},
               {"context": "q2: ", "choices": ["c", "dd", "eee"], "answer": 2}]
    out = evaluate_multiple_choice(ev, samples)
    assert set(out) == {"accuracy", "accuracy_norm", "n"}
    assert 0.0 <= out["accuracy"] <= 1.0 and out["n"] == 2


def test_endpoint_evaluator_matches_local(setup):
    from nemo_tpu.serve.openai_server import LLMServer

    cfg, params = setup
    srv = LLMServer(cfg, params, ByteTok(), max_slots=2, max_len=64)
    srv.serve(port=18131, blocking=False)
    try:
        local = LMEvaluator(cfg, params, ByteTok(), max_len=64)
        remote = EndpointEvaluator("http://127.0.0.1:18131", ByteTok())
        ll_l, _ = local.loglikelihood("hello ", "world")
        ll_r, _ = remote.loglikelihood("hello ", "world")
        assert ll_r == pytest.approx(ll_l, abs=1e-3)
        txt = remote.generate_until("hi", stop=[], max_new=4)
        assert isinstance(txt, str) and len(txt) > 0
    finally:
        srv.shutdown()


def test_lm_eval_adapter_always_constructs(setup):
    """The adapter now falls back to the vendored protocol base
    (llm/lm_eval_compat.py) when the external wheel is absent — it must
    construct and answer requests either way (full harness loop covered
    in test_lm_eval_harness.py)."""
    cfg, params = setup
    ev = LMEvaluator(cfg, params, ByteTok(), max_len=64)
    adapter = make_lm_eval_adapter(ev)
    assert adapter is not None
    from nemo_tpu.llm.lm_eval_compat import Instance

    out = adapter.loglikelihood(
        [Instance("loglikelihood", {}, ("a context", " cont"))])
    assert len(out) == 1 and out[0][0] < 0.0
