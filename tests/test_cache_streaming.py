"""Cache-aware streaming: chunked recurrent-cache encoding must EXACTLY
match offline encoding for fully-causal conformers, independent of chunk
size (reference: cache_last_channel/cache_last_time streaming_forward)."""

import numpy as np
import pytest

import jax.numpy as jnp

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.models.asr.ctc_models import EncDecCTCModel
from nemo_tpu.models.asr.streaming import CacheAwareStreamingCTC


def _causal_model(subsampling="striding"):
    labels = [" "] + [chr(ord("a") + i) for i in range(26)]
    cfg = ConfigDict(
        sample_rate=16000,
        labels=labels,
        preprocessor={"features": 24, "dither": 0.0, "normalize": "none"},
        encoder={
            "_target_": "x.ConformerEncoder",
            "feat_in": 24, "n_layers": 2, "d_model": 32, "n_heads": 4,
            "subsampling": subsampling, "subsampling_factor": 4,
            "ff_expansion_factor": 2, "conv_kernel_size": 9,
            "dropout": 0.0, "dropout_att": 0.0,
            "att_context_size": (8, 0), "causal_downsampling": True,
        },
        decoder={"num_classes": len(labels)},
    )
    return EncDecCTCModel(cfg)


@pytest.mark.parametrize("subsampling", ["striding", "dw_striding"])
@pytest.mark.parametrize("chunk", [8, 16])
def test_stream_step_equals_offline(subsampling, chunk):
    model = _causal_model(subsampling)
    rng = np.random.RandomState(0)
    T = 64
    feats = rng.randn(1, 24, T).astype(np.float32)

    # offline
    off_lp, off_len = model.net.apply(
        model.variables, jnp.asarray(feats), jnp.asarray([T]), train=False)
    off_ids = np.asarray(jnp.argmax(off_lp, -1))[0][: int(off_len[0])]

    # streaming: same features in chunks through recurrent caches
    s = CacheAwareStreamingCTC(model, chunk_frames=chunk)
    got_lp = []
    for c0 in range(0, T, chunk):
        lp, _, s._cache = model.net.apply(
            model.variables, jnp.asarray(feats[:, :, c0:c0 + chunk]),
            jnp.asarray([chunk]), train=False, cache=s._cache)
        got_lp.append(np.asarray(lp[0]))
    got = np.concatenate(got_lp, axis=0)

    ref = np.asarray(off_lp[0])[: got.shape[0]]
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)
    got_ids = got.argmax(-1)
    assert (got_ids == off_ids[: len(got_ids)]).all()


def test_stream_step_api_incremental_text():
    model = _causal_model()
    rng = np.random.RandomState(1)
    T, chunk = 48, 16
    feats = rng.randn(1, 24, T).astype(np.float32) * 3
    s = CacheAwareStreamingCTC(model, chunk_frames=chunk)
    texts = [s.stream_step(feats[:, :, c:c + chunk]) for c in range(0, T, chunk)]
    streamed = s.text

    off_lp, off_len = model.net.apply(
        model.variables, jnp.asarray(feats), jnp.asarray([T]), train=False)
    ids = np.asarray(jnp.argmax(off_lp, -1))[0][: int(off_len[0])]
    out, prev = [], -1
    blank = model.decoding.blank_id
    for t in ids:
        if t != prev and t != blank:
            out.append(int(t))
        prev = t
    offline = model.decoding.ids_to_text(out)
    assert streamed == offline
    assert "".join(texts) == streamed
