from nemo_tpu.models.asr.ctc_models import EncDecCTCModel  # noqa: F401
from nemo_tpu.models.asr.metrics import WER, word_error_rate  # noqa: F401
