"""VLM collection (reference: nemo/collections/vlm)."""

from nemo_tpu.models.vlm.neva import NevaConfig, NevaModel  # noqa: F401
from nemo_tpu.models.vlm.avlm import AVLMConfig, AVLMModel, avlm_8b  # noqa: F401
