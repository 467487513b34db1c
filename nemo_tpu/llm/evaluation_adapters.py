"""Evaluation adapter server: an interceptor chain between the eval
harness and the model endpoint.

Reference parity: `nemo/collections/llm/evaluation/adapters/` — a local
proxy the lm-eval harness points at, which rewrites requests (system
message injection), logs request/response traffic, strips reasoning
(`<think>…</think>`) spans from responses before scoring, and caches
responses (interceptors/{system_message,logging,reasoning,caching,
endpoint}_interceptor.py, server.py).

Design here: the chain is a plain callable pipeline over JSON payloads —
usable in-process around `EndpointEvaluator`/`LMEvaluator` without any
sockets — plus a thin stdlib ThreadingHTTPServer proxy (`serve_http`) for
external harnesses that need a URL.
"""

from __future__ import annotations

import hashlib
import json
import re
import threading
import time
import urllib.request
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Union

from nemo_tpu.utils.logging import logging

__all__ = [
    "AdapterRequest",
    "AdapterResponse",
    "SystemMessageInterceptor",
    "RequestLoggingInterceptor",
    "ResponseLoggingInterceptor",
    "ResponseReasoningInterceptor",
    "CachingInterceptor",
    "AdapterServer",
]


@dataclass
class AdapterRequest:
    payload: Dict[str, Any]
    path: str = "/v1/chat/completions"
    meta: Dict[str, Any] = field(default_factory=dict)


@dataclass
class AdapterResponse:
    payload: Dict[str, Any]
    request: Optional[AdapterRequest] = None
    cached: bool = False


class SystemMessageInterceptor:
    """Inject/replace the system message of chat requests (reference
    system_message_interceptor.py)."""

    def __init__(self, system_message: str):
        self.system_message = system_message

    def intercept_request(self, req: AdapterRequest) -> AdapterRequest:
        msgs = req.payload.get("messages")
        if isinstance(msgs, list):
            msgs = [m for m in msgs if m.get("role") != "system"]
            req.payload["messages"] = (
                [{"role": "system", "content": self.system_message}] + msgs
            )
        else:  # completions style
            req.payload["prompt"] = (
                self.system_message + "\n" + req.payload.get("prompt", "")
            )
        return req


class RequestLoggingInterceptor:
    """JSONL dump of outgoing requests (reference logging_interceptor.py)."""

    def __init__(self, log_dir: Union[str, Path], max_requests: Optional[int] = None):
        self._path = Path(log_dir) / "requests.jsonl"
        self._path.parent.mkdir(parents=True, exist_ok=True)
        self._max = max_requests
        self._n = 0
        self._lock = threading.Lock()

    def intercept_request(self, req: AdapterRequest) -> AdapterRequest:
        with self._lock:
            if self._max is None or self._n < self._max:
                with self._path.open("a") as f:
                    f.write(json.dumps(
                        {"ts": time.time(), "path": req.path,
                         "payload": req.payload}) + "\n")
                self._n += 1
        return req


class ResponseLoggingInterceptor:
    def __init__(self, log_dir: Union[str, Path], max_responses: Optional[int] = None):
        self._path = Path(log_dir) / "responses.jsonl"
        self._path.parent.mkdir(parents=True, exist_ok=True)
        self._max = max_responses
        self._n = 0
        self._lock = threading.Lock()

    def intercept_response(self, resp: AdapterResponse) -> AdapterResponse:
        with self._lock:
            if self._max is None or self._n < self._max:
                with self._path.open("a") as f:
                    f.write(json.dumps(
                        {"ts": time.time(), "cached": resp.cached,
                         "payload": resp.payload}) + "\n")
                self._n += 1
        return resp


class ResponseReasoningInterceptor:
    """Strip reasoning spans from response text before the harness scores
    it (reference reasoning_interceptor.py: <think>…</think> removal,
    per-response stats)."""

    def __init__(self, start_tag: str = "<think>", end_tag: str = "</think>",
                 include_if_unfinished: bool = True):
        self._re = re.compile(
            re.escape(start_tag) + r".*?" + re.escape(end_tag), re.DOTALL)
        self._open_re = re.compile(re.escape(start_tag) + r".*\Z", re.DOTALL)
        self.include_if_unfinished = include_if_unfinished
        self.stats = {"responses": 0, "stripped": 0, "reasoning_chars": 0}

    def _clean(self, text: str) -> str:
        new, n = self._re.subn("", text)
        if n == 0 and not self.include_if_unfinished:
            new2 = self._open_re.sub("", new)
            n, new = (1, new2) if new2 != new else (0, new)
        if n:
            self.stats["stripped"] += 1
            self.stats["reasoning_chars"] += len(text) - len(new)
        return new.lstrip()

    def intercept_response(self, resp: AdapterResponse) -> AdapterResponse:
        self.stats["responses"] += 1
        for choice in resp.payload.get("choices", []):
            msg = choice.get("message")
            if msg and isinstance(msg.get("content"), str):
                msg["content"] = self._clean(msg["content"])
            elif isinstance(choice.get("text"), str):
                choice["text"] = self._clean(choice["text"])
        return resp


class CachingInterceptor:
    """Request-hash response cache: a request interceptor that can
    short-circuit the endpoint, paired with a response interceptor that
    fills the cache (reference caching via adapters server)."""

    def __init__(self, cache_dir: Union[str, Path]):
        self._dir = Path(cache_dir)
        self._dir.mkdir(parents=True, exist_ok=True)
        self.hits = 0
        self.misses = 0

    def _key(self, req: AdapterRequest) -> Path:
        h = hashlib.sha256(
            json.dumps({"path": req.path, "payload": req.payload},
                       sort_keys=True).encode()).hexdigest()
        return self._dir / f"{h}.json"

    def intercept_request(self, req: AdapterRequest):
        p = self._key(req)
        if p.exists():
            self.hits += 1
            return AdapterResponse(
                json.loads(p.read_text()), request=req, cached=True)
        self.misses += 1
        return req

    def intercept_response(self, resp: AdapterResponse) -> AdapterResponse:
        if not resp.cached and resp.request is not None:
            self._key(resp.request).write_text(json.dumps(resp.payload))
        return resp


class AdapterServer:
    """Run requests through the interceptor chain around an endpoint.

    ``endpoint`` is either a callable ``payload -> payload`` (in-process
    engine) or a base URL string (forward over HTTP). Interceptors are
    applied in order for requests and in the same order for responses;
    a request interceptor returning an AdapterResponse short-circuits
    the endpoint (cache hit).
    """

    def __init__(self, endpoint: Union[str, Callable[[Dict], Dict]],
                 interceptors: List[Any]):
        self.endpoint = endpoint
        self.interceptors = list(interceptors)

    def _call_endpoint(self, req: AdapterRequest) -> Dict[str, Any]:
        if callable(self.endpoint):
            return self.endpoint(req.payload)
        url = self.endpoint.rstrip("/") + req.path
        data = json.dumps(req.payload).encode()
        http_req = urllib.request.Request(
            url, data=data, headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(http_req) as r:
            return json.loads(r.read())

    def handle(self, payload: Dict[str, Any],
               path: str = "/v1/chat/completions") -> Dict[str, Any]:
        req = AdapterRequest(payload=json.loads(json.dumps(payload)),
                             path=path)
        resp: Optional[AdapterResponse] = None
        for ic in self.interceptors:
            fn = getattr(ic, "intercept_request", None)
            if fn is None:
                continue
            out = fn(req)
            if isinstance(out, AdapterResponse):
                resp = out
                break
            req = out
        if resp is None:
            resp = AdapterResponse(self._call_endpoint(req), request=req)
        for ic in self.interceptors:
            fn = getattr(ic, "intercept_response", None)
            if fn is not None:
                resp = fn(resp)
        return resp.payload

    # -- HTTP proxy frontend ------------------------------------------------
    def serve_http(self, host: str = "127.0.0.1", port: int = 0):
        """Thin proxy for external harnesses; returns (server, thread,
        actual_port). POSTs to any path are run through handle()."""
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        adapter = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(n) or b"{}")
                try:
                    out = adapter.handle(payload, path=self.path)
                    body = json.dumps(out).encode()
                    self.send_response(200)
                except Exception as e:  # surface upstream errors as 502
                    logging.warning(f"adapter proxy error: {e}")
                    body = json.dumps({"error": str(e)}).encode()
                    self.send_response(502)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        server = ThreadingHTTPServer((host, port), Handler)
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        return server, thread, server.server_address[1]
