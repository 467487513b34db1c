from nemo_tpu.ops.audio import (  # noqa: F401
    MelSpectrogramConfig,
    mel_filterbank,
    mel_spectrogram,
    mel_seq_len,
)
