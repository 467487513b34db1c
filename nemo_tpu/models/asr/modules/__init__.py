from nemo_tpu.models.asr.modules.conv_asr import (  # noqa: F401
    ConvASRDecoder,
    ConvASREncoder,
    JasperBlock,
)
