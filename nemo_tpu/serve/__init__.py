from nemo_tpu.serve.openai_server import LLMServer  # noqa: F401
