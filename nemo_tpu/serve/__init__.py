from nemo_tpu.serve.openai_server import LLMServer  # noqa: F401
from nemo_tpu.serve.audio_server import AudioServer  # noqa: F401
