"""Vision collection (reference: nemo/collections/vision, vlm encoders)."""

from nemo_tpu.models.vision.vit import ViT, ViTConfig  # noqa: F401
from nemo_tpu.models.vision.mar import ImageVQVAE, MARConfig, MultimodalAR  # noqa: F401
