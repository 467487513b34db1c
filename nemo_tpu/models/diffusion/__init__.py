"""Diffusion collection (reference: nemo/collections/diffusion)."""

from nemo_tpu.models.diffusion.dit import (  # noqa: F401
    DiT,
    DiTConfig,
    rectified_flow_loss,
    sample_rectified_flow,
)
