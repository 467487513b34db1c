"""Accept the reference's canonical example YAMLs directly (SURVEY §2.4:
'The TPU rebuild must accept these YAMLs (or a converter)') + the
OmegaConf-style interpolation resolver behind it."""

import os

import numpy as np
import pytest

from nemo_tpu.core.config import ConfigDict, load_yaml, resolve_interpolations

REF_YAML = "/root/reference/examples/asr/conf/conformer/conformer_ctc_bpe.yaml"


def test_interpolation_resolution():
    cfg = load_yaml("""
model:
  preprocessor:
    features: 80
  encoder:
    feat_in: ${model.preprocessor.features}
    name: enc_${model.preprocessor.features}
  decoder:
    feat_in: ${model.encoder.feat_out}   # unresolvable → left as-is
""")
    r = resolve_interpolations(cfg)
    assert r.model.encoder.feat_in == 80          # native type kept
    assert r.model.encoder.name == "enc_80"       # embedded → stringified
    assert r.model.decoder.feat_in == "${model.encoder.feat_out}"


@pytest.mark.skipif(not os.path.exists(REF_YAML),
                    reason="reference checkout not present")
def test_build_model_from_reference_conformer_yaml():
    """The real conformer_ctc_bpe.yaml (BPE: num_classes=-1, interpolated
    feat_in, _target_ nodes) builds a working EncDecCTCModel."""
    from nemo_tpu.interop.nemo_import import model_from_reference_yaml

    labels = [chr(ord("a") + i) for i in range(26)] + [" ", "'"]
    m = model_from_reference_yaml(
        REF_YAML, labels=labels,
        overrides={"encoder.n_layers": 2, "encoder.d_model": 64,
                   "encoder.n_heads": 4})
    assert m.labels == labels
    import jax.numpy as jnp

    sig = jnp.zeros((1, 16000), jnp.float32)
    lp, _ = m.forward(sig, jnp.asarray([16000], jnp.int32))
    assert lp.shape[-1] == len(labels) + 1
    out = m.transcribe([np.zeros(8000, np.float32)])
    assert isinstance(out[0], str)


@pytest.mark.skipif(not os.path.exists(REF_YAML),
                    reason="reference checkout not present")
def test_reference_yaml_requires_labels_for_bpe():
    from nemo_tpu.interop.nemo_import import model_from_reference_yaml

    with pytest.raises(ValueError, match="vocabulary"):
        model_from_reference_yaml(REF_YAML)
