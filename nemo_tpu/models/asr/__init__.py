from nemo_tpu.models.asr.aed_models import EncDecMultiTaskModel  # noqa: F401
from nemo_tpu.models.asr.confidence_ensemble import (  # noqa: F401
    ConfidenceEnsembleModel,
    ConfidenceSpec,
)
from nemo_tpu.models.asr.ctc_models import EncDecCTCModel  # noqa: F401
from nemo_tpu.models.asr.metrics import BLEU, WER, corpus_bleu, word_error_rate  # noqa: F401
from nemo_tpu.models.asr.rnnt_models import EncDecRNNTModel  # noqa: F401
