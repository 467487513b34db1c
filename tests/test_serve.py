"""OpenAI-compatible server tests (in-process HTTP round trips)."""

import http.client
import json
import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu.models.llm.config import tiny_test
from nemo_tpu.models.llm.gpt import GPTModel
from nemo_tpu.serve.openai_server import LLMServer


class ByteTok:
    def text_to_ids(self, t):
        return [b % 120 for b in t.encode()] or [1]

    def ids_to_text(self, ids):
        return bytes(max(32, min(126, i + 32)) for i in ids).decode(errors="replace")


@pytest.fixture(scope="module")
def server():
    cfg = tiny_test()
    model = GPTModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    srv = LLMServer(cfg, variables["params"], ByteTok())
    httpd = srv.serve(port=18123, blocking=False)
    yield srv
    srv.shutdown()


def _post(path, payload):
    conn = http.client.HTTPConnection("127.0.0.1", 18123, timeout=120)
    conn.request("POST", path, json.dumps(payload), {"Content-Type": "application/json"})
    r = conn.getresponse()
    return r.status, json.loads(r.read())


def test_completions(server):
    status, out = _post("/v1/completions", {"prompt": "hello", "max_tokens": 4})
    assert status == 200
    assert out["object"] == "text_completion"
    assert isinstance(out["choices"][0]["text"], str)


def test_chat_completions(server):
    status, out = _post("/v1/chat/completions", {
        "messages": [{"role": "user", "content": "hi"}], "max_tokens": 4})
    assert status == 200
    assert out["choices"][0]["message"]["role"] == "assistant"


def test_models_and_health(server):
    conn = http.client.HTTPConnection("127.0.0.1", 18123, timeout=30)
    conn.request("GET", "/v1/models")
    out = json.loads(conn.getresponse().read())
    assert out["data"][0]["id"] == "nemo-tpu-llm"
    conn.request("GET", "/health")
    assert json.loads(conn.getresponse().read())["status"] == "ok"


def test_bad_json(server):
    conn = http.client.HTTPConnection("127.0.0.1", 18123, timeout=30)
    conn.request("POST", "/v1/completions", b"{not json", {"Content-Type": "application/json"})
    assert conn.getresponse().status == 400


def test_concurrent_requests_batched(server):
    results = {}

    def call(i):
        status, out = _post("/v1/completions", {"prompt": f"p{i}", "max_tokens": 4})
        results[i] = status

    threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(v == 200 for v in results.values())


def test_auto_prefix_caching(server):
    """Two requests sharing a ≥16-token prefix: the scheduler registers
    the common prefix and the second request's output is unaffected."""
    from nemo_tpu.models.llm.generate import SamplingParams

    sys_prompt = "You are a terse assistant. Answer in one word. " * 2
    p1 = sys_prompt + "Q: color of sky?"
    p2 = sys_prompt + "Q: color of grass?"
    sp = SamplingParams(greedy=True, max_new_tokens=4, eos_id=-1)
    # fresh-engine reference for p2 (no caching path possible)
    ref = server.submit(p2, sp)
    out1 = server.submit(p1, sp)
    assert isinstance(out1, str)
    # after two admissions with a shared prefix the store is populated
    assert len(server.engine._prefix_store) >= 1
    out2 = server.submit(p2, sp)  # now rides the cached prefix
    assert out2 == ref
