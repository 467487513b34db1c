"""Squeezeformer (temporal U-Net) + RNN encoders: shapes, masking, CTC
model integration, training step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.models.asr.ctc_models import EncDecCTCModel
from nemo_tpu.models.asr.modules.squeezeformer import (
    RNNEncoder,
    SqueezeformerEncoder,
)

LABELS = [" "] + [chr(ord("a") + i) for i in range(26)]


def test_squeezeformer_shapes_and_mask():
    enc = SqueezeformerEncoder(feat_in=24, n_layers=4, d_model=32, n_heads=4,
                               conv_kernel_size=9, dropout=0.0, dropout_att=0.0)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 24, 32), jnp.float32)
    lens = jnp.asarray([32, 20], jnp.int32)
    v = enc.init(jax.random.PRNGKey(0), feats, lens)
    out, out_len = enc.apply(v, feats, lens)
    assert out.shape[0] == 2 and out.shape[1] == 32
    assert int(out_len[0]) == 8 and int(out_len[1]) == 5
    # padded frames are zeroed
    assert np.abs(np.asarray(out[1, :, int(out_len[1]):])).max() == 0.0
    # padding-independence: same valid prefix regardless of padded tail
    out2, _ = enc.apply(v, feats.at[1, :, 20:].set(123.0), lens)
    np.testing.assert_allclose(np.asarray(out[1, :, : int(out_len[1])]),
                               np.asarray(out2[1, :, : int(out_len[1])]),
                               atol=2e-4, rtol=1e-3)


def test_rnn_encoder_shapes():
    enc = RNNEncoder(feat_in=24, n_layers=2, d_model=32, dropout=0.0)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 24, 32), jnp.float32)
    lens = jnp.asarray([32, 16], jnp.int32)
    v = enc.init(jax.random.PRNGKey(0), feats, lens)
    out, out_len = enc.apply(v, feats, lens)
    assert out.shape == (2, 32, 8)
    assert int(out_len[0]) == 8 and int(out_len[1]) == 4


@pytest.mark.slow
def test_squeezeformer_ctc_model_trains():
    cfg = ConfigDict(
        sample_rate=16000, labels=LABELS,
        preprocessor={"features": 24, "dither": 0.0},
        encoder={"_target_": "x.SqueezeformerEncoder", "feat_in": 24,
                 "n_layers": 2, "d_model": 32, "n_heads": 4,
                 "conv_kernel_size": 9, "dropout": 0.0, "dropout_att": 0.0},
        decoder={"num_classes": len(LABELS)},
    )
    model = EncDecCTCModel(cfg)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 24, 48), jnp.float32)
    lens = jnp.asarray([48, 48], jnp.int32)
    targets = jnp.asarray(rng.randint(0, len(LABELS), (2, 6)), jnp.int32)
    tlens = jnp.asarray([6, 4], jnp.int32)

    import optax

    tx = optax.adam(3e-3)

    def loss_fn(variables):
        lp, el = model.net.apply(variables, feats, lens, train=False)
        return jnp.mean(model.loss(lp, el, targets, tlens))

    v = model.variables
    opt = tx.init(v)
    l0 = None
    for _ in range(5):
        loss, g = jax.value_and_grad(loss_fn)(v)
        up, opt = tx.update(g, opt)
        v = optax.apply_updates(v, up)
        if l0 is None:
            l0 = float(loss)
    assert float(loss) < l0
