"""VLM collection (reference: nemo/collections/vlm)."""

from nemo_tpu.models.vlm.neva import NevaConfig, NevaModel  # noqa: F401
from nemo_tpu.models.vlm.avlm import AVLMConfig, AVLMModel, avlm_8b  # noqa: F401
from nemo_tpu.models.vlm.mllama import (  # noqa: F401
    MLlamaConfig,
    MLlamaModel,
    mllama_11b,
)
from nemo_tpu.models.vlm.qwen2vl import (  # noqa: F401
    Qwen2VLConfig,
    Qwen2VLModel,
    get_mrope_positions,
    qwen2vl_2b,
)
from nemo_tpu.models.vlm.gemma3vl import (  # noqa: F401
    Gemma3VLConfig,
    Gemma3VLModel,
    gemma3vl_4b,
    gemma3vl_12b,
    gemma3vl_27b,
    image_span_ids,
)
from nemo_tpu.models.vlm.llama4vl import (  # noqa: F401
    Llama4VLConfig,
    Llama4VLModel,
    llama4vl_scout,
    llama4vl_maverick,
    pixel_shuffle,
)
from nemo_tpu.models.vlm.train import VLMTrainModule  # noqa: F401
from nemo_tpu.models.vlm.clip import (  # noqa: F401
    CLIPConfig,
    CLIPModel,
    CLIPTrainModule,
    MockImageTextDataModule,
    clip_b32,
)
