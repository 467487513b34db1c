"""OpenAI-compatible audio serving: transcriptions (ASR) + speech (TTS).

Reference parity: the deploy stack serves ASR/TTS models through Triton
(SURVEY §2.7 DeployPyTriton binds any ITritonDeployable; multimodal
export) and the voice-agent server streams both. Here the modern serving
surface is the OpenAI audio API, natively:

- POST /v1/audio/transcriptions  (multipart `file=` wav, or raw audio/wav
  body) → {"text": ...} — Whisper-API-compatible.
- POST /v1/audio/speech  (JSON {"input": text}) → audio/wav bytes —
  TTS-API-compatible.

One process, stdlib HTTP, batched model calls under jit like LLMServer.
"""

from __future__ import annotations

import io
import json
import re
import struct
import threading
import wave
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Tuple

import numpy as np

from nemo_tpu.utils.logging import logging


def _wav_bytes(samples: np.ndarray, sr: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        pcm = np.clip(samples, -1.0, 1.0)
        w.writeframes((pcm * 32767).astype(np.int16).tobytes())
    return buf.getvalue()


def _parse_wav(data: bytes) -> Tuple[np.ndarray, int]:
    with wave.open(io.BytesIO(data), "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
        width = w.getsampwidth()
        ch = w.getnchannels()
    if width == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    else:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, sr


def _multipart_file(body: bytes, content_type: str) -> Optional[bytes]:
    """Extract the first file part from a multipart/form-data body."""
    m = re.search(r'boundary="?([^";,]+)"?', content_type)
    if not m:
        return None
    boundary = ("--" + m.group(1)).encode()
    for part in body.split(boundary):
        if b"filename=" not in part:
            continue
        idx = part.find(b"\r\n\r\n")
        if idx < 0:
            continue
        payload = part[idx + 4:]
        if payload.endswith(b"\r\n"):
            payload = payload[:-2]
        return payload
    return None


class AudioServer:
    """ASR + TTS behind the OpenAI audio API.

    asr: a model with `.transcribe([np.ndarray]) -> [str]` and
    `.sample_rate` (EncDecCTCModel & friends).
    tts: either a VITS-style model with `convert_text_to_waveform` +
    `parse`, or a (spectrogram_model, vocoder) pair (FastPitch+HiFiGAN)."""

    def __init__(self, asr=None, tts=None, *, model_name: str = "nemo-tpu-audio"):
        self.asr = asr
        self.tts = tts
        self.model_name = model_name
        self._lock = threading.Lock()  # one jit dispatch at a time
        self._httpd = None

    # -- model calls ---------------------------------------------------------
    def transcribe_bytes(self, wav_data: bytes) -> str:
        if self.asr is None:
            raise ValueError("no ASR model loaded")
        x, sr = _parse_wav(wav_data)
        target = getattr(self.asr, "sample_rate", 16000)
        if sr != target:
            from nemo_tpu.data.audio_io import resample_linear

            x = resample_linear(x, sr, target)
        with self._lock:
            return self.asr.transcribe([x.astype(np.float32)])[0]

    def synthesize(self, text: str) -> bytes:
        if self.tts is None:
            raise ValueError("no TTS model loaded")
        with self._lock:
            if isinstance(self.tts, tuple):
                spec, voc = self.tts
                import jax.numpy as jnp

                mel = spec.generate_spectrogram(spec.parse(text))
                wav = np.asarray(voc.convert_spectrogram_to_audio(
                    jnp.asarray(mel)))[0]
                sr = getattr(spec, "sample_rate", 22050)
            else:
                wav = np.asarray(
                    self.tts.convert_text_to_waveform(self.tts.parse(text)))[0]
                sr = getattr(self.tts, "sample_rate", 22050)
        return _wav_bytes(np.asarray(wav, np.float32), sr)

    # -- HTTP ---------------------------------------------------------------
    def _make_handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):
                pass

            def _json(self, code, payload):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/v1/models":
                    self._json(200, {"object": "list", "data": [
                        {"id": server.model_name, "object": "model"}]})
                else:
                    self._json(404, {"error": "not found"})

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                ctype = self.headers.get("Content-Type", "")
                try:
                    if self.path == "/v1/audio/transcriptions":
                        if ctype.startswith("multipart/form-data"):
                            data = _multipart_file(body, ctype)
                            if data is None:
                                return self._json(
                                    400, {"error": "no file part"})
                        else:
                            data = body  # raw audio/wav body
                        text = server.transcribe_bytes(data)
                        return self._json(200, {"text": text})
                    if self.path == "/v1/audio/speech":
                        req = json.loads(body or b"{}")
                        wav = server.synthesize(str(req.get("input", "")))
                        self.send_response(200)
                        self.send_header("Content-Type", "audio/wav")
                        self.send_header("Content-Length", str(len(wav)))
                        self.end_headers()
                        self.wfile.write(wav)
                        return
                    self._json(404, {"error": "not found"})
                except Exception as e:  # pragma: no cover
                    logging.error(f"audio endpoint error: {e}")
                    self._json(500, {"error": str(e)})

        return Handler

    def serve(self, host: str = "127.0.0.1", port: int = 8001,
              blocking: bool = True):
        self._httpd = ThreadingHTTPServer((host, port), self._make_handler())
        logging.info(f"AudioServer on http://{host}:{port}")
        if blocking:
            self._httpd.serve_forever()
        else:
            threading.Thread(target=self._httpd.serve_forever,
                             daemon=True).start()
        return self._httpd

    def shutdown(self):
        if self._httpd is not None:
            self._httpd.shutdown()
