"""m-ar: VQ-VAE image tokenizer round-trip + multimodal AR training and
text->image-token generation."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from nemo_tpu.models.vision.mar import ImageVQVAE, MARConfig, MultimodalAR


def test_vqvae_trains_and_roundtrips():
    vq = ImageVQVAE(dim=16, codebook_size=32, n_down=2, base_ch=8)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 16, 16, 3) * 2 - 1, jnp.float32)
    v = vq.init(jax.random.PRNGKey(0), img)
    tx = optax.adam(3e-3)
    opt = tx.init(v)

    @jax.jit
    def step(vars_, opt_state):
        (l, rec), g = jax.value_and_grad(
            lambda vv: (lambda o: (o["loss"], o["rec_loss"]))(vq.apply(vv, img)),
            has_aux=True)(vars_)
        up, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(vars_, up), opt_state, rec

    recs = []
    for _ in range(8):
        v, opt, rec = step(v, opt)
        recs.append(float(rec))
    assert recs[-1] < recs[0]

    codes, grid = vq.apply(v, img, method=ImageVQVAE.tokenize)
    assert codes.shape == (2, 16) and grid == (4, 4)
    out = vq.apply(v, codes, grid, method=ImageVQVAE.detokenize)
    assert out.shape == img.shape
    # detokenize(tokenize(x)) == forward recon path (same quantized z)
    fwd = vq.apply(v, img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(fwd["recon"]),
                               atol=1e-5)


def test_mar_trains_and_generates():
    cfg = MARConfig(text_vocab=32, image_codebook=32)
    mar = MultimodalAR(cfg)
    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randint(0, 32, (2, 6)), jnp.int32)
    codes = jnp.asarray(rng.randint(0, 32, (2, 16)), jnp.int32)
    v = mar.init(jax.random.PRNGKey(0), mar.pack(text, codes))
    tx = optax.adam(2e-3)
    opt = tx.init(v)

    @jax.jit
    def step(vars_, opt_state):
        l, g = jax.value_and_grad(
            lambda vv: mar.apply(vv, text, codes, method=MultimodalAR.loss))(vars_)
        up, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(vars_, up), opt_state, l

    losses = []
    for _ in range(6):
        v, opt, l = step(v, opt)
        losses.append(float(l))
    assert losses[-1] < losses[0]

    gen = mar.apply(v, text, 8, jax.random.PRNGKey(1),
                    method=MultimodalAR.generate_image_codes)
    gen = np.asarray(gen)
    assert gen.shape == (2, 8)
    assert (gen >= 0).all() and (gen < 32).all()  # in the image-code range
