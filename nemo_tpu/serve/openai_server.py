"""In-framework LLM serving with an OpenAI-compatible HTTP API.

Reference parity: the deploy stack (SURVEY.md §2.7) — DeployPyTriton
(`deploy/deploy_pytriton.py:26`) + the FastAPI OpenAI proxy
(`deploy/service/fastapi_interface_to_pytriton.py`: /v1/completions,
/v1/chat/completions) collapsed into one TPU-native process: a stdlib
ThreadingHTTPServer frontend and a single-worker generation loop that
micro-batches concurrent requests into the jitted decode program
(continuous batching lite; Triton has no analog here — the jit cache is
the "engine").
"""

from __future__ import annotations

import json
import queue
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional

from nemo_tpu.models.llm.generate import GenerationEngine, SamplingParams
from nemo_tpu.utils.logging import logging


class _Request:
    def __init__(self, prompt_ids, sampling):
        self.prompt_ids = prompt_ids
        self.sampling = sampling
        self.done = threading.Event()
        self.result: Optional[List[int]] = None


class LLMServer:
    """Owns the generation engine + a batching worker + the HTTP frontend."""

    def __init__(self, cfg, params, tokenizer, *, max_batch: int = 8,
                 model_name: str = "nemo-tpu-llm"):
        self.engine = GenerationEngine(cfg, params)
        self.tokenizer = tokenizer
        self.max_batch = max_batch
        self.model_name = model_name
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._loop, daemon=True)

    # -- batching worker ------------------------------------------------------
    def _loop(self):
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.time() + 0.01  # 10ms batching window
            while len(batch) < self.max_batch and time.time() < deadline:
                try:
                    batch.append(self._queue.get_nowait())
                except queue.Empty:
                    time.sleep(0.001)
            # group by sampling params (one jit program per param set)
            groups: Dict[Any, List[_Request]] = {}
            for r in batch:
                groups.setdefault(r.sampling, []).append(r)
            for sampling, reqs in groups.items():
                try:
                    outs = self.engine.generate_tokens(
                        [r.prompt_ids for r in reqs], sampling
                    )
                    for r, o in zip(reqs, outs):
                        r.result = o
                except Exception as e:  # pragma: no cover
                    logging.error(f"generation failed: {e}")
                    for r in reqs:
                        r.result = []
                for r in reqs:
                    r.done.set()

    def submit(self, prompt: str, sampling: SamplingParams) -> str:
        ids = self.tokenizer.text_to_ids(prompt)
        req = _Request(ids, sampling)
        self._queue.put(req)
        req.done.wait()
        return self.tokenizer.ids_to_text(req.result)

    # -- HTTP frontend ----------------------------------------------------------
    def serve(self, host: str = "127.0.0.1", port: int = 8000, blocking: bool = True):
        self._worker.start()
        server = ThreadingHTTPServer((host, port), self._make_handler())
        self._http = server
        logging.info(f"LLMServer listening on {host}:{port}")
        if blocking:
            server.serve_forever()
        else:
            t = threading.Thread(target=server.serve_forever, daemon=True)
            t.start()
        return server

    def shutdown(self):
        self._stop.set()
        if hasattr(self, "_http"):
            self._http.shutdown()

    def _make_handler(self):
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):
                pass

            def _json(self, code: int, payload: Dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/v1/models":
                    self._json(200, {"object": "list", "data": [
                        {"id": outer.model_name, "object": "model"}]})
                elif self.path == "/health":
                    self._json(200, {"status": "ok"})
                else:
                    self._json(404, {"error": "not found"})

            def do_POST(self):
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n) or b"{}")
                except Exception:
                    return self._json(400, {"error": {"message": "invalid JSON body"}})

                if self.path == "/v1/completions":
                    prompt = req.get("prompt", "")
                    if isinstance(prompt, list):
                        prompt = prompt[0] if prompt else ""
                elif self.path == "/v1/chat/completions":
                    msgs = req.get("messages", [])
                    prompt = "\n".join(
                        f"{m.get('role','user')}: {m.get('content','')}" for m in msgs
                    ) + "\nassistant:"
                else:
                    return self._json(404, {"error": "not found"})

                sampling = SamplingParams(
                    greedy=not req.get("temperature"),
                    temperature=float(req.get("temperature") or 1.0),
                    top_p=float(req.get("top_p") or 0.0),
                    max_new_tokens=int(req.get("max_tokens", 64)),
                )
                text = outer.submit(prompt, sampling)
                rid = f"cmpl-{uuid.uuid4().hex[:12]}"
                if self.path == "/v1/completions":
                    self._json(200, {
                        "id": rid, "object": "text_completion", "model": outer.model_name,
                        "choices": [{"index": 0, "text": text, "finish_reason": "length"}],
                    })
                else:
                    self._json(200, {
                        "id": rid, "object": "chat.completion", "model": outer.model_name,
                        "choices": [{"index": 0, "message": {"role": "assistant", "content": text},
                                     "finish_reason": "length"}],
                    })

        return Handler
