"""Host (numpy) mel frontend parity with the device mel, and host-frontend
transcribe equivalence (reference: DALI CPU feature pipeline)."""

import numpy as np
import pytest

import jax.numpy as jnp

from nemo_tpu.ops.audio import MelSpectrogramConfig, mel_spectrogram
from nemo_tpu.ops.audio_host import host_mel


@pytest.mark.parametrize("normalize", ["per_feature", "none"])
def test_host_mel_matches_device_mel(normalize):
    cfg = MelSpectrogramConfig(features=64, normalize=normalize)
    rng = np.random.RandomState(0)
    x = (rng.randn(2, 32000) * 0.1).astype(np.float32)
    lens = np.array([32000, 24000], np.int32)
    ref, ref_len = mel_spectrogram(jnp.asarray(x), jnp.asarray(lens), cfg,
                                   training=False)
    got, got_len = host_mel(x, lens, cfg)
    np.testing.assert_array_equal(np.asarray(ref_len), got_len)
    np.testing.assert_allclose(got, np.asarray(ref), atol=2e-3, rtol=2e-3)


def test_host_frontend_transcribe_matches_device(tmp_path):
    from nemo_tpu.data.audio_io import write_wav
    from nemo_tpu.models.asr.configs import quartznet_tiny
    from nemo_tpu.models.asr.ctc_models import EncDecCTCModel

    m = EncDecCTCModel(quartznet_tiny())
    rng = np.random.RandomState(0)
    paths = []
    for i in range(6):
        p = str(tmp_path / f"{i}.wav")
        write_wav(p, (rng.randn(16000) * 0.1).astype(np.float32), 16000)
        paths.append(p)
    dev = m.transcribe(paths, batch_size=2, frontend="device")
    host = m.transcribe(paths, batch_size=2, frontend="host")
    assert host == dev
