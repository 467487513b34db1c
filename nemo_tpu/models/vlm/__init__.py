"""VLM collection (reference: nemo/collections/vlm)."""

from nemo_tpu.models.vlm.neva import NevaConfig, NevaModel  # noqa: F401
