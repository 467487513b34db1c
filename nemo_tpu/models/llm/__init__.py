from nemo_tpu.models.llm.config import GPTConfig, PRESETS  # noqa: F401
from nemo_tpu.models.llm.gpt import GPTModel, init_kv_caches  # noqa: F401
from nemo_tpu.models.llm.loss import masked_token_loss  # noqa: F401
from nemo_tpu.models.llm.train import (  # noqa: F401
    GPTTrainModule,
    LMTrainModule,
    TrainState,
)
from nemo_tpu.models.llm.embedding import (  # noqa: F401
    EmbeddingConfig,
    EmbeddingModel,
    RerankerModel,
    llama32_1b_embedding,
    llama32_1b_reranker,
    llama32_3b_embedding,
)
