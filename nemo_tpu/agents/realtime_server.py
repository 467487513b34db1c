"""Realtime voice-agent server: websocket transport, turn-taking, barge-in.

Reference parity: `nemo/agents/voice_agent/` — the pipecat-based realtime
server (websocket frame transport, VAD turn-taking, user barge-in that
cancels agent playback). This is the online counterpart of the offline
`VoiceAgent` cascade: the same pluggable ASR/LLM/TTS services drive a
full-duplex websocket session.

Protocol (one session per connection):
  client → server
    binary : int16 little-endian PCM mono at the session sample rate
    text   : {"type": "start", "sample_rate": 16000}
             {"type": "flush"}   force end-of-turn now
             {"type": "reset"}   clear history + audio state
  server → client
    {"type": "ready"}
    {"type": "user_turn",  "text": ...}      final ASR for the turn
    {"type": "agent_text", "text": ...}      LLM reply
    binary : int16 PCM agent audio, streamed in ~100 ms chunks
    {"type": "agent_audio_end", "interrupted": bool}
    {"type": "barge_in"}                     user spoke during playback —
                                             remaining agent audio dropped

Model calls (ASR/LLM/TTS) run in a thread executor so the event loop
keeps consuming frames during inference — that is what makes barge-in
detection live while the agent is "speaking"."""

from __future__ import annotations

import asyncio
import json
from typing import Optional

import numpy as np

from nemo_tpu.agents.voice_agent import TurnConfig, VoiceAgent


class RealtimeVoiceServer:
    def __init__(self, asr, llm, tts, turn: Optional[TurnConfig] = None,
                 host: str = "127.0.0.1", port: int = 8765,
                 chunk_secs: float = 0.1):
        self.make_agent = lambda: VoiceAgent(asr, llm, tts, turn)
        self.host, self.port = host, port
        self.chunk_secs = chunk_secs
        self._server = None

    # -- session -------------------------------------------------------------
    async def _session(self, ws):
        agent = self.make_agent()
        loop = asyncio.get_running_loop()
        playback: Optional[asyncio.Task] = None
        barge = asyncio.Event()

        async def stream_audio(audio: np.ndarray, sr: int):
            """Paced playback; cancels instantly on barge-in."""
            n = max(int(sr * self.chunk_secs), 1)
            interrupted = False
            for s in range(0, len(audio), n):
                if barge.is_set():
                    interrupted = True
                    break
                pcm = np.clip(audio[s:s + n] * 32767, -32768, 32767)
                await ws.send(pcm.astype("<i2").tobytes())
                await asyncio.sleep(self.chunk_secs * 0.2)  # pacing
            await ws.send(json.dumps(
                {"type": "agent_audio_end", "interrupted": interrupted}))

        async def run_turn(audio: np.ndarray):
            nonlocal playback
            user, reply, reply_audio = await loop.run_in_executor(
                None, agent._complete_turn, audio)
            await ws.send(json.dumps({"type": "user_turn", "text": user}))
            await ws.send(json.dumps({"type": "agent_text", "text": reply}))
            barge.clear()
            playback = asyncio.create_task(
                stream_audio(np.asarray(reply_audio, np.float32),
                             agent.turn.sample_rate))

        await ws.send(json.dumps({"type": "ready"}))
        async for msg in ws:
            if isinstance(msg, (bytes, bytearray)):
                chunk = np.frombuffer(msg, "<i2").astype(np.float32) / 32768.0
                speaking = playback is not None and not playback.done()
                if speaking and agent._frame_active(chunk):
                    # user interrupts the agent: drop remaining playback
                    barge.set()
                    await ws.send(json.dumps({"type": "barge_in"}))
                done = agent.push_audio(chunk)
                if done is not None:
                    user, reply, reply_audio = done
                    await ws.send(json.dumps(
                        {"type": "user_turn", "text": user}))
                    await ws.send(json.dumps(
                        {"type": "agent_text", "text": reply}))
                    barge.clear()
                    playback = asyncio.create_task(stream_audio(
                        np.asarray(reply_audio, np.float32),
                        agent.turn.sample_rate))
            else:
                ctl = json.loads(msg)
                kind = ctl.get("type")
                if kind == "start":
                    sr = int(ctl.get("sample_rate",
                                     agent.turn.sample_rate))
                    agent.turn.sample_rate = sr
                elif kind == "flush":
                    buf = agent._buf
                    agent.reset_audio()
                    if len(buf) > 0:
                        await run_turn(buf)
                elif kind == "reset":
                    agent.history.clear()
                    agent.reset_audio()
                    if playback is not None:
                        barge.set()
        if playback is not None:
            barge.set()

    # -- lifecycle -----------------------------------------------------------
    async def serve_forever(self):
        import websockets

        async with websockets.serve(self._session, self.host, self.port):
            await asyncio.Future()

    def start_background(self):
        """Run the server on a daemon thread; returns (thread, stop)."""
        import threading
        import websockets

        loop = asyncio.new_event_loop()
        started = threading.Event()
        stop_fut = {}

        def runner():
            asyncio.set_event_loop(loop)

            async def main():
                server = await websockets.serve(
                    self._session, self.host, self.port)
                stop_fut["stop"] = loop.create_future()
                started.set()
                await stop_fut["stop"]
                server.close()
                await server.wait_closed()

            loop.run_until_complete(main())

        t = threading.Thread(target=runner, daemon=True)
        t.start()
        started.wait(timeout=10)

        def stop():
            loop.call_soon_threadsafe(
                lambda: stop_fut["stop"].set_result(None))
            t.join(timeout=5)

        return t, stop
