"""SLU intent/slot model: semantics round-trip, prompt task, predict API."""

import numpy as np

import jax.numpy as jnp

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.models.asr.slu_models import (
    SLUIntentSlotModel,
    format_semantics,
    parse_semantics,
)


def test_semantics_roundtrip():
    s = format_semantics("play_music", {"artist": "queen", "album": "news"})
    assert s == "intent:play_music (artist=queen, album=news)"
    intent, slots = parse_semantics(s)
    assert intent == "play_music"
    assert slots == {"artist": "queen", "album": "news"}
    # no slots
    intent, slots = parse_semantics(format_semantics("stop", {}))
    assert intent == "stop" and slots == {}
    # garbage
    assert parse_semantics("hello world") == (None, {})


def _cfg():
    labels = list("abcdefghijklmnopqrstuvwxyz_:=(), ")
    return ConfigDict(dict(
        labels=labels,
        preprocessor=dict(features=16),
        encoder=dict(_target_="ConformerEncoder", feat_in=16, n_layers=1,
                     d_model=32, n_heads=2, subsampling_factor=4,
                     dropout=0.0, dropout_att=0.0),
        transf_decoder=dict(num_layers=1, hidden_size=32,
                            num_attention_heads=2, inner_size=64),
        max_dec_len=64,
    ))


def test_slu_model_predict_api():
    m = SLUIntentSlotModel(_cfg())
    assert "slu" in m.tasks  # task injected into the prompt schema
    # semantics targets tokenize through the model vocab
    ids = m.semantics_to_ids("play_music", {"artist": "queen"})
    assert ids and all(i >= len(m.specials) for i in ids)
    rng = np.random.RandomState(0)
    out = m.predict([(rng.randn(4000) * 0.1).astype(np.float32)], max_len=12)
    assert isinstance(out[0]["raw"], str)
    assert set(out[0].keys()) == {"intent", "slots", "raw"}
