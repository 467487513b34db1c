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


def test_streaming_rnnt_equals_offline_greedy():
    """Cache-aware streaming transducer: chunked greedy (carried pred-net
    state + encoder caches) == offline greedy token-exactly."""
    from nemo_tpu.models.asr.modules.rnnt import rnnt_greedy_decode
    from nemo_tpu.models.asr.rnnt_models import EncDecRNNTModel, _RNNTNet
    from nemo_tpu.models.asr.streaming import CacheAwareStreamingRNNT

    labels = [str(i) for i in range(8)]
    cfg = ConfigDict(
        sample_rate=16000, labels=labels,
        preprocessor={"features": 24, "dither": 0.0, "normalize": "none"},
        encoder={"_target_": "x.ConformerEncoder", "feat_in": 24,
                 "n_layers": 2, "d_model": 32, "n_heads": 4,
                 "subsampling": "striding", "subsampling_factor": 4,
                 "ff_expansion_factor": 2, "conv_kernel_size": 9,
                 "dropout": 0.0, "dropout_att": 0.0,
                 "att_context_size": (8, 0), "causal_downsampling": True},
        decoder={"pred_hidden": 16, "pred_rnn_layers": 1,
                 "vocabulary": labels},
        joint={"joint_hidden": 16},
    )
    m = EncDecRNNTModel(cfg)
    rng = np.random.RandomState(0)
    T, chunk = 48, 16
    feats = rng.randn(1, 24, T).astype(np.float32) * 2

    # offline: encode full + greedy
    enc, enc_len = m.net.apply(m.variables, jnp.asarray(feats),
                               jnp.asarray([T]), method=_RNNTNet.encode)

    def joint_fn(e, p):
        return m.net.apply(m.variables, e, p, method=_RNNTNet.joint_logits)

    def pred_fn(t, s):
        return m.net.apply(m.variables, t, s, method=_RNNTNet.pred_step)

    zeros = jnp.zeros((1, 16), jnp.float32)
    state0 = ((zeros, zeros),)
    off_toks, off_counts = rnnt_greedy_decode(
        joint_fn, pred_fn, state0, enc, enc_len, m.blank_id, m.max_symbols)
    offline = [int(t) for t in np.asarray(off_toks[0][: int(off_counts[0])])]

    s = CacheAwareStreamingRNNT(m, chunk_frames=chunk)
    texts = [s.stream_step(feats[:, :, c:c + chunk])
             for c in range(0, T, chunk)]
    assert s._ids == offline
    assert "".join(texts) == s.text
