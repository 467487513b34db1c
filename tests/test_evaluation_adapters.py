"""Evaluation adapter interceptor chain (reference:
nemo/collections/llm/evaluation/adapters/)."""

import json
import urllib.request

from nemo_tpu.llm.evaluation_adapters import (
    AdapterServer,
    CachingInterceptor,
    RequestLoggingInterceptor,
    ResponseLoggingInterceptor,
    ResponseReasoningInterceptor,
    SystemMessageInterceptor,
)


def fake_endpoint(payload):
    msgs = payload.get("messages", [])
    sys_msg = next((m["content"] for m in msgs if m["role"] == "system"), "")
    user = next((m["content"] for m in msgs if m["role"] == "user"), "")
    return {
        "choices": [{"message": {
            "role": "assistant",
            "content": f"<think>secret chain for {user}</think>answer:{user}|sys:{sys_msg}",
        }}],
    }


def test_chain_system_reasoning_logging_cache(tmp_path):
    calls = {"n": 0}

    def endpoint(payload):
        calls["n"] += 1
        return fake_endpoint(payload)

    cache = CachingInterceptor(tmp_path / "cache")
    reasoning = ResponseReasoningInterceptor()
    server = AdapterServer(endpoint, [
        SystemMessageInterceptor("be terse"),
        RequestLoggingInterceptor(tmp_path),
        cache,
        reasoning,
        ResponseLoggingInterceptor(tmp_path),
    ])
    req = {"messages": [{"role": "user", "content": "2+2"}]}
    out = server.handle(req)
    text = out["choices"][0]["message"]["content"]
    # reasoning stripped, system message injected upstream
    assert "<think>" not in text and "secret" not in text
    assert text == "answer:2+2|sys:be terse"
    assert calls["n"] == 1 and cache.misses == 1

    # second identical request: served from cache, endpoint not hit
    out2 = server.handle(req)
    assert calls["n"] == 1 and cache.hits == 1
    assert out2["choices"][0]["message"]["content"] == text

    # logs written
    reqs = [json.loads(l) for l in (tmp_path / "requests.jsonl").read_text().splitlines()]
    resps = [json.loads(l) for l in (tmp_path / "responses.jsonl").read_text().splitlines()]
    assert len(reqs) == 2 and len(resps) == 2
    assert reqs[0]["payload"]["messages"][0]["role"] == "system"
    assert resps[1]["cached"] is True
    # cache sits before reasoning in the chain, so it stores the raw
    # upstream payload and the stripper runs on cached replays too
    assert reasoning.stats["stripped"] == 2


def test_http_proxy_roundtrip(tmp_path):
    server = AdapterServer(fake_endpoint, [ResponseReasoningInterceptor()])
    httpd, thread, port = server.serve_http()
    try:
        body = json.dumps(
            {"messages": [{"role": "user", "content": "hi"}]}).encode()
        r = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/chat/completions", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(r) as resp:
            out = json.loads(resp.read())
        assert out["choices"][0]["message"]["content"].startswith("answer:hi")
    finally:
        httpd.shutdown()


def test_completions_style_and_unfinished_reasoning():
    server = AdapterServer(
        lambda p: {"choices": [{"text": "<think>half-open reasoning"}]},
        [SystemMessageInterceptor("sys"),
         ResponseReasoningInterceptor(include_if_unfinished=False)],
    )
    out = server.handle({"prompt": "q"}, path="/v1/completions")
    assert out["choices"][0]["text"] == ""
