"""Diffusion collection (reference: nemo/collections/diffusion)."""

from nemo_tpu.models.diffusion.dit import (  # noqa: F401
    DiT,
    DiTConfig,
    rectified_flow_loss,
    sample_rectified_flow,
)
from nemo_tpu.models.diffusion.controlnet import (  # noqa: F401
    FluxControlNet,
    FluxControlNetConfig,
    controlled_flux_apply,
    controlnet_flow_loss,
)
from nemo_tpu.models.diffusion.edm import (  # noqa: F401
    edm_loss,
    edm_precond,
    edm_sample,
    karras_sigmas,
)
from nemo_tpu.models.diffusion.flux import (  # noqa: F401
    FluxConfig,
    FluxTransformer,
    flux_flow_loss,
    flux_sample,
    pack_latents,
    unpack_latents,
)
from nemo_tpu.models.diffusion.vae import (  # noqa: F401
    AutoEncoderKL,
    AutoEncoderKLConfig,
    vae_loss,
)
from nemo_tpu.models.diffusion.video_dit import (  # noqa: F401
    VideoDiT,
    VideoDiTConfig,
    sample_video,
    video_flow_loss,
)
from nemo_tpu.models.diffusion.train import (  # noqa: F401
    DiffusionTrainModule,
    MockLatentDataModule,
)
