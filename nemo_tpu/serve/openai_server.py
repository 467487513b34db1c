"""In-framework LLM serving with an OpenAI-compatible HTTP API.

Reference parity: the deploy stack (SURVEY.md §2.7) — DeployPyTriton
(`deploy/deploy_pytriton.py:26`) + the FastAPI OpenAI proxy
(`deploy/service/fastapi_interface_to_pytriton.py`: /v1/completions,
/v1/chat/completions incl. `stream`) collapsed into one TPU-native
process: a stdlib ThreadingHTTPServer frontend and a continuous-batching
scheduler (vLLM-style slot pool — requests join/retire mid-decode, one
jitted step serves every active request per iteration).
"""

from __future__ import annotations

import json
import queue
import threading
import time
import uuid
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from nemo_tpu.models.llm.generate import ContinuousBatchingEngine, SamplingParams
from nemo_tpu.utils.logging import logging

_END = object()  # stream sentinel


class _StreamRequest:
    def __init__(self, prompt_ids, max_new: int, eos_id: int,
                 temperature: float, top_k: int = 0, top_p: float = 0.0):
        self.prompt_ids = prompt_ids
        self.max_new = max_new
        self.eos_id = eos_id
        self.temperature = temperature
        self.top_k = top_k
        self.top_p = top_p
        self.tokens: "queue.Queue" = queue.Queue()
        self.produced = 0


def _decode_image_url(url: str):
    """OpenAI image_url → float32 HWC array. Accepts data: URLs carrying
    base64 of (a) an .npy array (any float image tensor — the test/export
    path, no codec deps) or (b) a PIL-decodable image, normalized to
    [0, 1]."""
    import base64
    import io

    if not url.startswith("data:"):
        raise ValueError("only data: image URLs are served (zero egress)")
    payload = base64.b64decode(url.split(",", 1)[1])
    if payload[:6] == b"\x93NUMPY":
        return np.load(io.BytesIO(payload)).astype(np.float32)
    from PIL import Image  # pillow ships with transformers

    img = Image.open(io.BytesIO(payload)).convert("RGB")
    return np.asarray(img, np.float32) / 255.0


def extract_chat_media(messages: Sequence[Dict]) -> "tuple":
    """Normalize OpenAI content-part messages: list-valued `content`
    (text / image_url parts, reference multimodal chat contract) becomes a
    flat string with '<image>' markers; returns (messages, images[])."""
    out, images = [], []
    for m in messages:
        c = m.get("content", "")
        if isinstance(c, list):
            pieces = []
            for part in c:
                t = part.get("type")
                if t == "text":
                    pieces.append(part.get("text", ""))
                elif t == "image_url":
                    url = part.get("image_url")
                    url = url.get("url") if isinstance(url, dict) else url
                    images.append(_decode_image_url(url))
                    pieces.append("<image>")
            c = "".join(pieces)
        out.append({**m, "content": c})
    return out, images


def format_chat(messages: Sequence[Dict[str, str]], template: str = "chatml") -> str:
    """Chat template (reference: the proxy delegates to the model's
    tokenizer template; here chatml + a plain fallback)."""
    if template == "chatml":
        parts = [f"<|im_start|>{m.get('role', 'user')}\n{m.get('content', '')}<|im_end|>"
                 for m in messages]
        return "\n".join(parts) + "\n<|im_start|>assistant\n"
    return "\n".join(f"{m.get('role', 'user')}: {m.get('content', '')}"
                     for m in messages) + "\nassistant:"


class LLMServer:
    """Continuous-batching scheduler + HTTP frontend."""

    def __init__(self, cfg, params, tokenizer, *, max_slots: int = 4,
                 max_len: int = 512, model_name: str = "nemo-tpu-llm",
                 chat_template: str = "chatml",
                 enable_prefix_caching: bool = True,
                 auto_prefix_min_tokens: int = 16,
                 quantize_weights: bool = False,
                 quantize_kv_cache: bool = False,
                 decode_chunk: int = 8,
                 mesh_cfg=None,
                 vlm=None):
        import jax.numpy as jnp

        from nemo_tpu.models.llm.ssm import (
            SSMConfig, SSMContinuousBatchingEngine)

        if isinstance(cfg, SSMConfig):
            # mamba2 / nemotron-H hybrids: per-slot recurrent states
            if quantize_weights or quantize_kv_cache:
                raise ValueError("quantized serving is GPT-family only")
            self.engine = SSMContinuousBatchingEngine(
                cfg, params, max_slots=max_slots, max_len=max_len)
            enable_prefix_caching = False  # states are not prefix-sliceable
        else:
            if quantize_weights and cfg.quantization != "int8_ptq":
                # int8-resident PTQ serving (docs/serving.md)
                from nemo_tpu.llm.api import ptq

                cfg, params = ptq(cfg, params, algorithm="int8_serve")
            from nemo_tpu.models.llm.gpt import (hetero_period,
                                                 unroll_params,
                                                 uses_scan_layers)
            if uses_scan_layers(cfg) and hetero_period(cfg) == 1:
                # serving is a long-lived process: trade the one-time
                # unrolled-stack compile for the per-layer-tuple KV carry
                # decode path (~40% faster steps than the scanned stack —
                # scripts/decode_throughput.py chip A/B)
                import dataclasses

                params = unroll_params(cfg, params)
                cfg = dataclasses.replace(cfg, scan_layers=False)
            self.engine = ContinuousBatchingEngine(
                cfg, params, max_slots=max_slots, max_len=max_len,
                cache_dtype=jnp.int8 if quantize_kv_cache else jnp.bfloat16,
                mesh_cfg=mesh_cfg)
        self.tokenizer = tokenizer
        self.model_name = model_name
        self.chat_template = chat_template
        self.max_slots = max_slots
        self.max_len = max_len
        # automatic prefix caching (vLLM APC analog): when admissions share
        # a long common prefix (chat system prompts), register it once so
        # later requests skip re-prefilling those tokens
        self.enable_prefix_caching = enable_prefix_caching
        self.auto_prefix_min_tokens = auto_prefix_min_tokens
        # tokens decoded per device dispatch (multi-step scan): amortizes
        # the per-dispatch host latency; 1 = legacy per-token stepping.
        # SSM engines have no multi-step path yet.
        self.decode_chunk = (decode_chunk
                             if hasattr(self.engine, "decode_steps") else 1)
        # optional multimodal sidecar (reference: vlm/inference wrappers
        # served behind the same OpenAI proxy): a dict with keys
        # model / params / n_image_tokens. Chat requests carrying
        # image_url content parts route to a VLMGenerationEngine one-shot.
        self._vlm = None
        self._vlm_engine = None
        if vlm is not None:
            self._vlm = dict(vlm)
        self._recent_prompts: "deque" = deque(maxlen=8)
        self._queue: "queue.Queue[_StreamRequest]" = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._loop, daemon=True)

    def submit_vlm(self, messages, sampling: SamplingParams) -> str:
        """One-shot image→text generation for chat requests with image
        parts. Serialized (engine calls are not thread-safe across jit
        cache mutation) via a lock."""
        if self._vlm is None:
            raise ValueError("server was not configured with a VLM model")
        from nemo_tpu.models.vlm.inference import VLMGenerationEngine

        msgs, images = extract_chat_media(messages)
        if not images:
            raise ValueError("no image parts in request")
        if self._vlm_engine is None:
            self._vlm_engine = VLMGenerationEngine(
                self._vlm["model"], self._vlm["params"])
        prompt = format_chat(msgs, self.chat_template)
        image_token_id = int(self._vlm["model"].cfg.image_token_id)
        n = int(self._vlm["n_image_tokens"])
        ids: List[int] = []
        for i, piece in enumerate(prompt.split("<image>")):
            if i:
                ids.extend([image_token_id] * n)
            if piece:
                ids.extend(self.tokenizer.text_to_ids(piece))
        if not hasattr(self, "_vlm_lock"):
            self._vlm_lock = threading.Lock()
        with self._vlm_lock:
            out = self._vlm_engine.generate_tokens(
                np.stack(images), [ids], sampling)
        toks = out[0]
        if sampling.eos_id >= 0 and sampling.eos_id in toks:
            toks = toks[: toks.index(sampling.eos_id)]
        return self.tokenizer.ids_to_text(toks)

    def _maybe_register_prefix(self, ids) -> None:
        """Worker-thread-only: register the longest common prefix this
        prompt shares with a recent one (≥ auto_prefix_min_tokens)."""
        key = tuple(ids)
        best = 0
        for prev in self._recent_prompts:
            n = 0
            for a, b in zip(prev, key):
                if a != b:
                    break
                n += 1
            best = max(best, n)
        self._recent_prompts.append(key)
        if self.auto_prefix_min_tokens <= best < len(key):
            try:
                self.engine.register_prefix(list(key[:best]))
            except ValueError:
                pass

    # -- continuous-batching scheduler ----------------------------------------
    def _loop(self):
        slots: List[Optional[_StreamRequest]] = [None] * self.max_slots
        feed = np.zeros(self.max_slots, np.int32)
        step = 0
        while not self._stop.is_set():
            # admit waiting requests into free slots
            admitted = False
            for s in range(self.max_slots):
                if slots[s] is not None:
                    continue
                try:
                    req = self._queue.get_nowait()
                except queue.Empty:
                    break
                try:
                    if self.enable_prefix_caching:
                        self._maybe_register_prefix(req.prompt_ids)
                    tok = self.engine.prefill_slot(
                        s, req.prompt_ids, req.temperature, seed=step,
                        top_k=req.top_k, top_p=req.top_p)
                except Exception as e:  # pragma: no cover
                    logging.error(f"prefill failed: {e}")
                    req.tokens.put(_END)
                    continue
                slots[s] = req
                feed[s] = tok
                self._emit(slots, feed, s)
                admitted = True
            active = np.asarray([r is not None for r in slots])
            if not active.any():
                if not admitted:
                    time.sleep(0.002)
                continue
            # one batched decode step for every active slot, each sampled at
            # its own request's temperature/top_k/top_p (per-slot vectors; a
            # greedy request stays greedy next to a sampled neighbour)
            temps = np.asarray(
                [r.temperature if r else 0.0 for r in slots], np.float32)
            top_ks = np.asarray(
                [r.top_k if r else 0 for r in slots], np.int32)
            top_ps = np.asarray(
                [r.top_p if r else 0.0 for r in slots], np.float32)
            if self.decode_chunk > 1:
                # multi-step: N tokens per dispatch, on-device per-slot EOS;
                # chunk is capped by the smallest remaining budget so no
                # request overshoots max_new on device
                budget = min(r.max_new - r.produced
                             for r in slots if r is not None)
                n = max(1, min(self.decode_chunk, budget))
                eos = np.asarray(
                    [r.eos_id if r else -1 for r in slots], np.int32)
                toks, emitted, _ = self.engine.decode_steps(
                    feed, active, n_steps=n, temperature=temps, seed=step,
                    top_k=top_ks, top_p=top_ps, eos_id=eos)
                step += n
                for i in range(n):
                    for s, req in enumerate(slots):
                        if req is None or not emitted[i, s]:
                            continue
                        feed[s] = toks[i, s]
                        self._emit(slots, feed, s)
                continue
            nxt = self.engine.decode_step(feed, active, temps, seed=step,
                                          top_k=top_ks, top_p=top_ps)
            step += 1
            for s, req in enumerate(slots):
                if req is None:
                    continue
                feed[s] = nxt[s]
                self._emit(slots, feed, s)

    def _emit(self, slots, feed, s):
        """Push slot s's latest token; retire on eos / budget / overflow."""
        req = slots[s]
        tok = int(feed[s])
        done = (tok == req.eos_id or req.produced + 1 >= req.max_new
                or self.engine.cur_len[s] + 1 >= self.max_len)
        if tok != req.eos_id:
            req.tokens.put(tok)
            req.produced += 1
        if done:
            req.tokens.put(_END)
            slots[s] = None
            feed[s] = 0
            self.engine.free_slot(s)

    # -- client API -------------------------------------------------------------
    def submit_stream(self, prompt: str, sampling: SamplingParams) -> "queue.Queue":
        ids = self.tokenizer.text_to_ids(prompt)
        req = _StreamRequest(ids, sampling.max_new_tokens, sampling.eos_id,
                             0.0 if sampling.greedy else sampling.temperature,
                             top_k=0 if sampling.greedy else sampling.top_k,
                             top_p=0.0 if sampling.greedy else sampling.top_p)
        self._queue.put(req)
        return req.tokens

    def submit(self, prompt: str, sampling: SamplingParams) -> str:
        q = self.submit_stream(prompt, sampling)
        out = []
        while True:
            t = q.get()
            if t is _END:
                break
            out.append(t)
        return self.tokenizer.ids_to_text(out)

    def score(self, prompt: str):
        """Prompt-token logprobs (the logprobs+echo+max_tokens=0 scoring
        contract NeMoFWLMEval-style endpoint evaluation relies on)."""
        import jax
        import jax.numpy as jnp

        if not hasattr(self, "_score_jit"):
            from nemo_tpu.models.llm.gpt import GPTModel

            model = GPTModel(self.engine.cfg)

            def f(params, tokens):
                logits = model.apply({"params": params}, tokens)
                return jax.nn.log_softmax(logits, axis=-1)

            self._score_jit = jax.jit(f)
        ids = self.tokenizer.text_to_ids(prompt)
        if not ids:
            return [], []
        S = max(8, int(2 ** np.ceil(np.log2(len(ids)))))
        toks = np.zeros((1, S), np.int32)
        toks[0, : len(ids)] = ids
        lp = np.asarray(self._score_jit(self.engine.params, jnp.asarray(toks)))[0]
        token_lp = [None] + [float(lp[p - 1, ids[p]]) for p in range(1, len(ids))]
        return ids, token_lp

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

            def _sse(self, rid: str, obj: str, token_q, chat: bool):
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                self.end_headers()
                while True:
                    t = token_q.get()
                    if t is _END:
                        break
                    piece = outer.tokenizer.ids_to_text([t])
                    if chat:
                        delta = {"choices": [{"index": 0,
                                              "delta": {"content": piece}}]}
                    else:
                        delta = {"choices": [{"index": 0, "text": piece}]}
                    delta.update(id=rid, object=obj, model=outer.model_name)
                    self.wfile.write(f"data: {json.dumps(delta)}\n\n".encode())
                    self.wfile.flush()
                self.wfile.write(b"data: [DONE]\n\n")
                self.wfile.flush()

            def do_POST(self):
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n) or b"{}")
                except Exception:
                    return self._json(400, {"error": {"message": "invalid JSON body"}})

                chat = self.path == "/v1/chat/completions"
                if self.path == "/v1/completions":
                    prompt = req.get("prompt", "")
                    if isinstance(prompt, list):
                        prompt = prompt[0] if prompt else ""
                elif chat:
                    messages = req.get("messages", [])
                    has_images = any(
                        isinstance(m.get("content"), list)
                        and any(p.get("type") == "image_url"
                                for p in m["content"])
                        for m in messages)
                    if has_images:
                        sampling = SamplingParams(
                            greedy=not req.get("temperature"),
                            temperature=float(req.get("temperature") or 1.0),
                            max_new_tokens=int(req.get("max_tokens", 64)),
                        )
                        try:
                            text = outer.submit_vlm(messages, sampling)
                        except ValueError as e:
                            return self._json(400, {"error": {"message": str(e)}})
                        return self._json(200, {
                            "id": f"cmpl-{uuid.uuid4().hex[:12]}",
                            "object": "chat.completion",
                            "model": outer.model_name,
                            "choices": [{"index": 0,
                                         "message": {"role": "assistant",
                                                     "content": text},
                                         "finish_reason": "length"}],
                        })
                    prompt = format_chat(messages, outer.chat_template)
                else:
                    return self._json(404, {"error": "not found"})

                rid = f"cmpl-{uuid.uuid4().hex[:12]}"
                if (not chat and req.get("logprobs")
                        and int(req.get("max_tokens", 64)) == 0):
                    ids, token_lp = outer.score(prompt)
                    return self._json(200, {
                        "id": rid, "object": "text_completion",
                        "model": outer.model_name,
                        "choices": [{"index": 0, "text": prompt if req.get("echo") else "",
                                     "finish_reason": "length",
                                     "logprobs": {"token_logprobs": token_lp,
                                                  "tokens": ids}}],
                    })
                sampling = SamplingParams(
                    greedy=not req.get("temperature"),
                    temperature=float(req.get("temperature") or 1.0),
                    top_p=float(req.get("top_p") or 0.0),
                    top_k=int(req.get("top_k") or 0),
                    max_new_tokens=int(req.get("max_tokens", 64)),
                )
                if req.get("stream"):
                    q = outer.submit_stream(prompt, sampling)
                    obj = "chat.completion.chunk" if chat else "text_completion"
                    return self._sse(rid, obj, q, chat)
                text = outer.submit(prompt, sampling)
                if chat:
                    self._json(200, {
                        "id": rid, "object": "chat.completion", "model": outer.model_name,
                        "choices": [{"index": 0,
                                     "message": {"role": "assistant", "content": text},
                                     "finish_reason": "length"}],
                    })
                else:
                    self._json(200, {
                        "id": rid, "object": "text_completion", "model": outer.model_name,
                        "choices": [{"index": 0, "text": text, "finish_reason": "length"}],
                    })

        return Handler
