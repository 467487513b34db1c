from nemo_tpu.models.audio.enhancement import MaskingEnhancementModel  # noqa: F401
from nemo_tpu.models.audio.multichannel import (  # noqa: F401
    DereverbWPEModel,
    MaskBasedBeamformerModel,
    estimate_psd,
    mask_based_beamform,
    pmwf_weights,
    wpe_dereverb,
)
from nemo_tpu.models.audio.ssl_pretrain import SSLPretrainModel  # noqa: F401
from nemo_tpu.models.audio.train import (  # noqa: F401
    EnhancementTrainModule,
    MockPairedAudioDataModule,
)
