from nemo_tpu.agents.voice_agent import (  # noqa: F401
    CallableLLMService,
    ModelASRService,
    NativeTTSService,
    TurnConfig,
    VoiceAgent,
)
