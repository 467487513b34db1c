"""Realtime voice-agent websocket server (VERDICT r2 missing #10):
turn-taking over the wire + barge-in cancelling agent playback."""

import asyncio
import json
import time

import numpy as np
import pytest

from nemo_tpu.agents.realtime_server import RealtimeVoiceServer
from nemo_tpu.agents.voice_agent import TurnConfig

SR = 16000


class _ASR:
    def transcribe(self, audio, sr):
        return f"heard {len(audio) / sr:.1f}s"


class _LLM:
    def respond(self, history):
        return "ok: " + history[-1]["content"]


class _TTS:
    def __init__(self, secs=2.0):
        self.secs = secs

    def synthesize(self, text):
        t = np.arange(int(SR * self.secs)) / SR
        return np.sin(2 * np.pi * 330 * t).astype(np.float32), SR


def _speech(secs):
    t = np.arange(int(SR * secs)) / SR
    return (np.sin(2 * np.pi * 220 * t) * 0.5).astype(np.float32)


def _pcm(x):
    return (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()


@pytest.fixture()
def server():
    turn = TurnConfig(sample_rate=SR, end_silence_secs=0.3,
                      min_speech_secs=0.1)
    srv = RealtimeVoiceServer(_ASR(), _LLM(), _TTS(secs=3.0), turn,
                              port=18765, chunk_secs=0.05)
    t, stop = srv.start_background()
    yield srv
    stop()


def _run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


def test_turn_over_websocket(server):
    import websockets

    async def client():
        async with websockets.connect("ws://127.0.0.1:18765") as ws:
            assert json.loads(await ws.recv())["type"] == "ready"
            await ws.send(json.dumps({"type": "start", "sample_rate": SR}))
            # 0.5 s speech then 0.5 s silence → end of turn
            await ws.send(_pcm(_speech(0.5)))
            await ws.send(_pcm(np.zeros(int(SR * 0.5), np.float32)))
            events, audio_bytes = [], 0
            while True:
                msg = await asyncio.wait_for(ws.recv(), timeout=20)
                if isinstance(msg, (bytes, bytearray)):
                    audio_bytes += len(msg)
                    continue
                ev = json.loads(msg)
                events.append(ev)
                if ev["type"] == "agent_audio_end":
                    break
            kinds = [e["type"] for e in events]
            assert "user_turn" in kinds and "agent_text" in kinds
            user = next(e for e in events if e["type"] == "user_turn")
            assert user["text"].startswith("heard")
            reply = next(e for e in events if e["type"] == "agent_text")
            assert reply["text"].startswith("ok:")
            assert audio_bytes > 0
            assert not events[-1]["interrupted"]

    _run(client())


def test_barge_in_cancels_playback(server):
    import websockets

    async def client():
        async with websockets.connect("ws://127.0.0.1:18765") as ws:
            assert json.loads(await ws.recv())["type"] == "ready"
            await ws.send(_pcm(_speech(0.5)))
            await ws.send(_pcm(np.zeros(int(SR * 0.5), np.float32)))
            # wait for playback to start (first agent audio chunk)
            got_audio = False
            while not got_audio:
                msg = await asyncio.wait_for(ws.recv(), timeout=20)
                got_audio = isinstance(msg, (bytes, bytearray))
            # interrupt: speech while the agent is talking
            await ws.send(_pcm(_speech(0.2)))
            saw_barge = interrupted = False
            n_after = 0
            while True:
                msg = await asyncio.wait_for(ws.recv(), timeout=20)
                if isinstance(msg, (bytes, bytearray)):
                    n_after += 1
                    continue
                ev = json.loads(msg)
                if ev["type"] == "barge_in":
                    saw_barge = True
                if ev["type"] == "agent_audio_end":
                    interrupted = ev["interrupted"]
                    break
            assert saw_barge
            assert interrupted
            # 3 s of audio at 50 ms chunks = 60 chunks; barge-in must have
            # cut it well short
            assert n_after < 40, n_after

    _run(client())
