"""speechlm (SALM) / vlm (NeVA) / diffusion (DiT) collection tests
(reference: speechlm2/models/salm.py, vlm/neva/model/base.py,
diffusion/models/dit)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from nemo_tpu.models.diffusion import DiT, DiTConfig, rectified_flow_loss, sample_rectified_flow
from nemo_tpu.models.llm.config import tiny_test
from nemo_tpu.models.speechlm import SALM, SALMConfig
from nemo_tpu.models.vision import ViT, ViTConfig
from nemo_tpu.models.vlm import NevaConfig, NevaModel


def _tiny_enc():
    from nemo_tpu.models.asr.configs import conformer_ctc

    enc = dict(conformer_ctc("large").encoder.to_dict())
    enc.update(n_layers=2, d_model=32, n_heads=4, feat_in=32)
    return enc


def _tiny_vit():
    return ViTConfig(image_size=16, patch_size=4, hidden_size=32, num_layers=2,
                     num_heads=4, ffn_hidden_size=64)


def test_salm_loss_decreases_and_generates():
    cfg = SALMConfig(llm=tiny_test(seq_length=64), encoder=_tiny_enc(),
                     mel_features=32, frame_stacking=2)
    salm = SALM(cfg)
    params = salm.variables["params"]
    stats = salm.variables.get("batch_stats", {})
    rng = np.random.RandomState(0)
    batch = {
        "audio": jnp.asarray(rng.randn(2, 8000) * 0.1, jnp.float32),
        "audio_len": jnp.asarray([8000, 6000], jnp.int32),
        "tokens": jnp.asarray(rng.randint(1, 100, (2, 12)), jnp.int32),
        "loss_mask": jnp.ones((2, 12), jnp.float32),
    }
    opt = optax.adam(1e-3)
    ost = opt.init(params)

    @jax.jit
    def step(params, stats, ost, key):
        (loss, stats), grads = jax.value_and_grad(
            lambda p: salm.loss_fn(p, stats, batch, key), has_aux=True)(params)
        upd, ost = opt.update(grads, ost)
        return optax.apply_updates(params, upd), stats, ost, loss

    losses = []
    for i in range(4):
        params, stats, ost, loss = step(params, stats, ost, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]

    out = salm.generate(np.asarray(batch["audio"]), np.asarray(batch["audio_len"]),
                        np.asarray(batch["tokens"][:, :4]), max_new=5)
    assert out.shape == (2, 5)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) < 128).all()


def test_vit_shapes():
    cfg = _tiny_vit()
    model = ViT(cfg)
    img = jnp.zeros((2, 16, 16, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), img)
    out = model.apply(v, img)
    assert out.shape == (2, 1 + 16, 32)  # cls + 4x4 patches


def test_neva_loss_decreases():
    cfg = NevaConfig(llm=tiny_test(seq_length=64, hidden_size=32,
                                   num_attention_heads=4, num_query_groups=2),
                     vision=_tiny_vit(), freeze_vision=True)
    model = NevaModel(cfg)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(2, 16, 16, 3), jnp.float32)
    tok = jnp.asarray(rng.randint(1, 100, (2, 10)), jnp.int32)
    mask = jnp.ones((2, 10), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, tok)
    params = variables["params"]
    opt = optax.adam(1e-3)
    ost = opt.init(params)

    @jax.jit
    def step(params, ost):
        loss, grads = jax.value_and_grad(
            lambda p: model.apply({"params": p}, img, tok, mask,
                                  method=NevaModel.loss))(params)
        upd, ost = opt.update(grads, ost)
        return optax.apply_updates(params, upd), ost, loss

    losses = []
    for _ in range(4):
        params, ost, loss = step(params, ost)
        losses.append(float(loss))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
    # frozen vision: ViT params must not move
    v0 = variables["params"]["vision"]["block0"]["fc1"]["kernel"]
    v1 = params["vision"]["block0"]["fc1"]["kernel"]
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))


def test_dit_train_and_sample():
    cfg = DiTConfig(input_size=8, patch_size=2, in_channels=3, hidden_size=32,
                    num_layers=2, num_heads=4, num_classes=4)
    model = DiT(cfg)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(4, 8, 8, 3), jnp.float32)
    y = jnp.asarray([0, 1, 2, 3], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((4,)), y)["params"]
    opt = optax.adam(2e-3)
    ost = opt.init(params)

    @jax.jit
    def step(params, ost, key):
        loss, grads = jax.value_and_grad(
            lambda p: rectified_flow_loss(model, p, key, x0, y))(params)
        upd, ost = opt.update(grads, ost)
        return optax.apply_updates(params, upd), ost, loss

    losses = []
    for i in range(8):
        params, ost, loss = step(params, ost, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all() and min(losses[4:]) < losses[0]

    img = sample_rectified_flow(model, params, jax.random.PRNGKey(9),
                                (2, 8, 8, 3), y[:2], steps=4)
    assert img.shape == (2, 8, 8, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_avlm_joint_loss_decreases():
    from nemo_tpu.models.vlm.avlm import AVLMConfig, AVLMModel

    cfg = AVLMConfig(llm=tiny_test(seq_length=96), vision=_tiny_vit(),
                     audio_encoder=_tiny_enc(), mel_features=32,
                     frame_stacking=2)
    model = AVLMModel(cfg)
    rng = np.random.RandomState(0)
    B, S = 2, 12
    images = jnp.asarray(rng.randn(B, 16, 16, 3), jnp.float32)
    feats = jnp.asarray(rng.randn(B, 32, 32), jnp.float32)
    alen = jnp.asarray([32, 24], jnp.int32)
    tokens = jnp.asarray(rng.randint(0, 100, (B, S)), jnp.int32)
    mask = jnp.ones((B, S), jnp.float32)

    v = model.init(jax.random.PRNGKey(0), images, feats, alen, tokens)
    tx = optax.adam(2e-3)
    opt = tx.init(v)

    @jax.jit
    def step(vars_, opt_state):
        l, g = jax.value_and_grad(
            lambda vv: model.apply(vv, images, feats, alen, tokens, mask,
                                   train=False,  # eval-mode norms; params still train
                                   method=AVLMModel.loss))(vars_)
        up, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(vars_, up), opt_state, l

    losses = []
    for _ in range(5):
        v, opt, l = step(v, opt)
        losses.append(float(l))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    # frozen vision: ViT params unchanged
    v0 = model.init(jax.random.PRNGKey(0), images, feats, alen, tokens)
    a = jax.tree.leaves(v0["params"]["vision"])
    b = jax.tree.leaves(v["params"]["vision"])
    assert all(np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(a, b))
