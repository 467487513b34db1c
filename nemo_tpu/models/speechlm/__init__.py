"""Speech-LM collection (reference: nemo/collections/speechlm2)."""

from nemo_tpu.models.speechlm.salm import SALM, SALMConfig  # noqa: F401
from nemo_tpu.models.speechlm.duplex_s2s import (  # noqa: F401
    DuplexS2SConfig,
    DuplexS2SModel,
    TransformerARSpeechDecoder,
    prepare_duplex_inputs,
)
from nemo_tpu.models.speechlm.train import (  # noqa: F401
    MockSpeechLMDataModule,
    SALMTrainModule,
)
