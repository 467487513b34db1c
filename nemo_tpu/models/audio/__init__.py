from nemo_tpu.models.audio.enhancement import MaskingEnhancementModel  # noqa: F401
from nemo_tpu.models.audio.train import (  # noqa: F401
    EnhancementTrainModule,
    MockPairedAudioDataModule,
)
