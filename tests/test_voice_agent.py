"""Voice agent: turn-taking on pushed audio, full ASR->LLM->TTS cascade."""

import numpy as np
import pytest

from nemo_tpu.agents import (
    CallableLLMService,
    ModelASRService,
    NativeTTSService,
    TurnConfig,
    VoiceAgent,
)
from nemo_tpu.core.config import ConfigDict
from nemo_tpu.models.asr.configs import quartznet_tiny
from nemo_tpu.models.asr.ctc_models import EncDecCTCModel
from nemo_tpu.models.tts.fastpitch_model import FastPitchModel
from nemo_tpu.models.tts.hifigan_model import HifiGanModel


def _agent():
    asr = ModelASRService(EncDecCTCModel(quartznet_tiny()))
    llm = CallableLLMService(lambda prompt: "ok, " + prompt.splitlines()[-2][:20])
    spec = FastPitchModel(ConfigDict(n_mels=16, d_model=32, n_heads=1, d_ff=64,
                                     enc_layers=1, dec_layers=1))
    voc = HifiGanModel(ConfigDict(n_mels=16, upsample_rates=[4, 4],
                                  upsample_initial_channel=32))
    tts = NativeTTSService(spec, voc)
    return VoiceAgent(asr, llm, tts, TurnConfig(end_silence_secs=0.2))


@pytest.mark.slow
def test_converse_full_cascade():
    agent = _agent()
    rng = np.random.RandomState(0)
    audio = (rng.randn(16000) * 0.1).astype(np.float32)
    user_text, reply, reply_audio = agent.converse(audio)
    assert isinstance(user_text, str)
    assert reply.startswith("ok, ")
    assert reply_audio.ndim == 1 and len(reply_audio) > 0
    assert len(agent.history) == 2
    # second turn extends history
    agent.converse(audio)
    assert len(agent.history) == 4


@pytest.mark.slow
def test_push_audio_turn_detection():
    agent = _agent()
    sr = 16000
    rng = np.random.RandomState(1)
    speech = (rng.randn(sr // 2) * 0.3).astype(np.float32)  # loud 0.5 s
    silence = np.zeros(sr // 2, np.float32)
    assert agent.push_audio(silence) is None  # nothing yet
    assert agent.push_audio(speech) is None  # speaking
    out = agent.push_audio(silence)  # 0.5 s silence > 0.2 s → turn ends
    assert out is not None
    user_text, reply, reply_audio = out
    assert isinstance(user_text, str) and len(reply_audio) > 0
    # buffer reset for the next turn
    assert agent._buf.size == 0
