"""Export subsystem: StableHLO saved programs (the TPU-native analog of
the reference's engine export — nemo/export/tensorrt_llm.py, onnx/TS
Exportable)."""

from nemo_tpu.export.stablehlo import (  # noqa: F401
    ExportedProgram,
    export_asr_ctc,
    export_gpt_decode,
    export_gpt_logits,
    load_exported,
    save_exported,
)
