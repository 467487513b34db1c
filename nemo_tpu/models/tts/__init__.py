from nemo_tpu.models.tts.aligner_model import AlignerModel  # noqa: F401
from nemo_tpu.models.tts.fastpitch_model import FastPitchModel  # noqa: F401
from nemo_tpu.models.tts.hifigan_model import HifiGanModel  # noqa: F401
from nemo_tpu.models.tts.tacotron2_model import Tacotron2Model  # noqa: F401
from nemo_tpu.models.tts.vits_model import VitsModel  # noqa: F401
from nemo_tpu.models.tts.magpie_model import MagpieTTSModel  # noqa: F401
from nemo_tpu.models.tts.mixer_model import MixerTTSModel  # noqa: F401
from nemo_tpu.models.tts.univnet_model import UnivNetModel  # noqa: F401
