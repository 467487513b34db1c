from nemo_tpu.models.audio.enhancement import MaskingEnhancementModel  # noqa: F401
