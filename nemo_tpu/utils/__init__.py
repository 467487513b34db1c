from nemo_tpu.utils.logging import logging  # noqa: F401
