"""Vendored lm-eval harness contract: the adapter answers real harness-
shaped Instance request batches end-to-end — in-process AND against the
served endpoint (reference: evaluation/base.py:25-40 NeMoFWLMEval driven
by lm_eval's evaluator)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nemo_tpu.llm.evaluation import (LMEvaluator, EndpointEvaluator,
                                     evaluate_multiple_choice,
                                     make_lm_eval_adapter)
from nemo_tpu.llm.lm_eval_compat import Instance, build_requests, simple_evaluate
from nemo_tpu.models.llm.config import tiny_test
from nemo_tpu.models.llm.gpt import GPTModel

PORT = 18129


class ByteTok:
    eos_id = 0

    def text_to_ids(self, t):
        return [b % 120 for b in t.encode()] or [1]

    def ids_to_text(self, ids):
        return bytes(max(32, min(126, i + 32)) for i in ids).decode(
            errors="replace")


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test()
    model = GPTModel(cfg)
    import flax.linen as nn

    params = nn.meta.unbox(model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))["params"])
    return cfg, params


MC_TASK = {
    "type": "multiple_choice",
    "docs": [
        {"query": "The sky is", "choices": [" blue", " made of cheese"],
         "gold": 0},
        {"query": "Two plus two is", "choices": [" four", " seven", " red"],
         "gold": 0},
    ],
}


def test_harness_mc_matches_direct_protocol(setup):
    """simple_evaluate through the vendored LM base must reproduce the
    direct evaluate_multiple_choice numbers exactly (same scores, same
    length normalization)."""
    cfg, params = setup
    ev = LMEvaluator(cfg, params, ByteTok(), max_len=64)
    lm = make_lm_eval_adapter(ev)
    res = simple_evaluate(lm, MC_TASK)
    direct = evaluate_multiple_choice(ev, [
        {"context": d["query"], "choices": d["choices"], "answer": d["gold"]}
        for d in MC_TASK["docs"]])
    assert res["n"] == 2
    assert res["acc"] == direct["accuracy"]
    assert res["acc_norm"] == direct["accuracy_norm"]


def test_harness_request_shapes(setup):
    reqs = build_requests(MC_TASK)
    assert len(reqs) == 5  # 2 + 3 choices
    assert all(isinstance(r, Instance) for r in reqs)
    assert reqs[0].request_type == "loglikelihood"
    assert reqs[0].args == ("The sky is", " blue")
    gen = build_requests({"type": "generate_until", "until": ["\n"],
                          "docs": [{"query": "Q: hi\nA:", "answer": "x"}],
                          "max_gen_toks": 4})
    assert gen[0].args[1] == {"until": ["\n"], "max_gen_toks": 4}


def test_harness_generate_and_rolling(setup):
    cfg, params = setup
    ev = LMEvaluator(cfg, params, ByteTok(), max_len=64)
    lm = make_lm_eval_adapter(ev)
    out = simple_evaluate(lm, {
        "type": "generate_until", "until": ["\n"], "max_gen_toks": 4,
        "docs": [{"query": "Q: hi\nA:", "answer": "zz-never-matches"}]})
    assert out["n"] == 1 and 0.0 <= out["exact_match"] <= 1.0
    rolled = lm.loglikelihood_rolling(
        [Instance("loglikelihood_rolling", {}, ("some text here",))])
    assert len(rolled) == 1 and rolled[0] < 0.0


def test_harness_against_served_endpoint(setup):
    """The full harness loop against a LIVE OpenAI endpoint: the adapter's
    loglikelihood rides /v1/completions logprobs+echo+max_tokens=0."""
    cfg, params = setup
    from nemo_tpu.serve.openai_server import LLMServer

    srv = LLMServer(cfg, params, ByteTok())
    srv.serve(port=PORT, blocking=False)
    try:
        ev = EndpointEvaluator(f"http://127.0.0.1:{PORT}", ByteTok())
        lm = make_lm_eval_adapter(ev)
        res = simple_evaluate(lm, MC_TASK)
        assert res["n"] == 2 and 0.0 <= res["acc"] <= 1.0
        # endpoint scores must match in-process scores (same model)
        ev_local = LMEvaluator(cfg, params, ByteTok(), max_len=64)
        ll_remote = lm.loglikelihood(build_requests(MC_TASK)[:2])
        ll_local = [ev_local.loglikelihood("The sky is", " blue"),
                    ev_local.loglikelihood("The sky is", " made of cheese")]
        for (r, _), (l, _) in zip(ll_remote, ll_local):
            assert abs(r - l) < 0.35, (r, l)  # bf16 server vs f32 path
    finally:
        srv.shutdown()
