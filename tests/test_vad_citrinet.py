"""VAD model + citrinet config tests."""

import numpy as np
import pytest

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.models.asr.vad_models import EncDecClassificationModel, marblenet_config


@pytest.fixture(scope="module")
def vad():
    cfg = marblenet_config(feat_in=32)
    # shrink for tests
    cfg.encoder.jasper = cfg.encoder.jasper[:2]
    cfg.preprocessor.features = 32
    cfg.encoder.feat_in = 32
    return EncDecClassificationModel(cfg)


def test_vad_classify(vad):
    label, prob = vad.classify(np.random.RandomState(0).randn(8000).astype(np.float32) * 0.1)
    assert label in vad.labels and 0.0 <= prob <= 1.0


def test_vad_segments(vad):
    audio = np.random.RandomState(0).randn(32000).astype(np.float32) * 0.1
    segs = vad.predict_segments(audio, threshold=0.0)  # accept-all: covers merge path
    assert segs and segs[0]["start"] == 0.0
    assert all(s["end"] > s["start"] for s in segs)


def test_citrinet_config_builds():
    from nemo_tpu.models.asr.configs import citrinet_512
    from nemo_tpu.models.asr.ctc_models import EncDecCTCModel

    cfg = citrinet_512()
    assert len(cfg.encoder.jasper) == 23
    # x4 total stride via two stride-2 SE blocks with stride_last
    strides = [b.get("stride", 1) for b in cfg.encoder.jasper]
    assert strides.count(2) == 2
    # builds (params only; forward covered by shared ConvASR tests)
    model = EncDecCTCModel(cfg, init_params=False)
    assert model.net.d_enc == 640


def test_new_recipes_resolve():
    import jax

    from nemo_tpu.llm.recipes import RECIPES

    for name in ("llama2_7b", "llama31_405b", "mistral_7b", "qwen2_7b", "gemma_7b", "gpt3_175b"):
        r = RECIPES[name]()
        m = r.mesh
        assert m.dp * m.fsdp * m.cp * m.tp == jax.device_count(), name
