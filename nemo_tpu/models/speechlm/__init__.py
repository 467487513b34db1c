"""Speech-LM collection (reference: nemo/collections/speechlm2)."""

from nemo_tpu.models.speechlm.salm import SALM, SALMConfig  # noqa: F401
