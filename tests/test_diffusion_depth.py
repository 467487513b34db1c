"""Diffusion collection depth: KL-VAE, Flux MMDiT, ControlNet, EDM,
video DiT with context parallelism (reference nemo/collections/diffusion)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from nemo_tpu.models.diffusion import (
    AutoEncoderKL, AutoEncoderKLConfig, FluxConfig, FluxControlNet,
    FluxControlNetConfig, FluxTransformer, VideoDiT, VideoDiTConfig,
    controlled_flux_apply, controlnet_flow_loss, edm_loss, edm_precond,
    edm_sample, flux_flow_loss, flux_sample, karras_sigmas, pack_latents,
    sample_video, unpack_latents, vae_loss, video_flow_loss,
)


def _train(loss_fn, params, steps=30, lr=1e-3):
    opt = optax.adam(lr)
    ost = opt.init(params)

    @jax.jit
    def step(params, ost, rng):
        l, g = jax.value_and_grad(loss_fn)(params, rng)
        u, ost = opt.update(g, ost)
        return optax.apply_updates(params, u), ost, l

    first = last = None
    for i in range(steps):
        params, ost, l = step(params, ost, jax.random.PRNGKey(i))
        if i == 0:
            first = float(l)
        last = float(l)
    return params, first, last


def test_vae_roundtrip_trains():
    cfg = AutoEncoderKLConfig(ch=8, ch_mult=(1, 2), num_res_blocks=1,
                              z_channels=2)
    model = AutoEncoderKL(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 16, 16, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    recon, mean, logvar = model.apply({"params": params}, x)
    assert recon.shape == x.shape
    assert mean.shape == (2, 8, 8, 2)  # downscale 2 with 2 levels

    params, first, last = _train(
        lambda p, r: vae_loss(model, p, r, x)[0], params, steps=40)
    assert last < first

    # latent convention: encode_latent → decode_latent round-trips the
    # scale/shift normalization exactly at the mean
    z = model.apply({"params": params}, x, method=model.encode_latent)
    back = model.apply({"params": params}, z, method=model.decode_latent)
    mean2, _ = model.apply({"params": params}, x, method=model.encode)
    direct = model.apply({"params": params}, mean2, method=model.decode)
    np.testing.assert_allclose(np.asarray(back), np.asarray(direct),
                               atol=1e-5)


def test_pack_unpack_roundtrip():
    rng = np.random.RandomState(0)
    lat = jnp.asarray(rng.rand(2, 8, 8, 4), jnp.float32)
    x, ids = pack_latents(lat, 2)
    assert x.shape == (2, 16, 16)
    assert ids.shape == (2, 16, 3)
    np.testing.assert_array_equal(np.asarray(unpack_latents(x, 8, 8, 2)),
                                  np.asarray(lat))


def _flux_inputs(B=2, H=8, S_txt=4, cfg=None):
    rng = np.random.RandomState(0)
    cfg = cfg or FluxConfig(hidden_size=64, num_double_layers=2,
                            num_single_layers=1, num_heads=2,
                            context_dim=16, pooled_dim=8,
                            axes_dims=(8, 12, 12))
    lat = jnp.asarray(rng.rand(B, H, H, cfg.in_channels), jnp.float32)
    txt = jnp.asarray(rng.rand(B, S_txt, cfg.context_dim), jnp.float32)
    pooled = jnp.asarray(rng.rand(B, cfg.pooled_dim), jnp.float32)
    return cfg, lat, txt, pooled


def test_flux_trains_and_samples():
    cfg, lat, txt, pooled = _flux_inputs()
    model = FluxTransformer(cfg)
    img, img_ids = pack_latents(lat, cfg.patch_size)
    txt_ids = jnp.zeros((2, txt.shape[1], 3), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), img, txt, img_ids, txt_ids,
                        jnp.zeros((2,)), pooled)["params"]

    params, first, last = _train(
        lambda p, r: flux_flow_loss(model, p, r, lat, txt, pooled),
        params, steps=30)
    assert last < first

    out = flux_sample(model, params, jax.random.PRNGKey(1),
                      (2, 8, 8, cfg.in_channels), txt, pooled, steps=4,
                      shift=3.0)
    assert out.shape == (2, 8, 8, cfg.in_channels)
    assert np.isfinite(np.asarray(out)).all()


def test_flux_controlnet_zero_init_is_identity_then_trains():
    cfg, lat, txt, pooled = _flux_inputs()
    base = FluxTransformer(cfg)
    img, img_ids = pack_latents(lat, cfg.patch_size)
    txt_ids = jnp.zeros((2, txt.shape[1], 3), jnp.int32)
    t = jnp.full((2,), 0.5)
    base_params = base.init(jax.random.PRNGKey(0), img, txt, img_ids,
                            txt_ids, t, pooled)["params"]
    # controlnet trains against a PRETRAINED frozen base (an untrained base
    # has a zero-init output head, which would block all gradients)
    base_params, _, _ = _train(
        lambda p, r: flux_flow_loss(base, p, r, lat, txt, pooled),
        base_params, steps=10)

    ccfg = FluxControlNetConfig(base=cfg, num_control_layers=1)
    cnet = FluxControlNet(ccfg)
    ctrl_lat = lat * 0.5
    ctrl, _ = pack_latents(ctrl_lat, cfg.patch_size)
    cnet_params = cnet.init(jax.random.PRNGKey(1), img, ctrl, txt, img_ids,
                            txt_ids, t, pooled)["params"]

    # zero-init: controlled output == base output exactly at step 0
    v_base = base.apply({"params": base_params}, img, txt, img_ids, txt_ids,
                        t, pooled)
    v_ctrl = controlled_flux_apply(base, base_params, cnet, cnet_params,
                                   img, ctrl, txt, img_ids, txt_ids, t,
                                   pooled)
    np.testing.assert_allclose(np.asarray(v_ctrl), np.asarray(v_base),
                               atol=1e-6)

    # trains (base frozen), and grads to the base are zero
    g = jax.grad(lambda p: controlnet_flow_loss(
        base, base_params, cnet, p, jax.random.PRNGKey(0), lat, ctrl_lat,
        txt, pooled))(cnet_params)
    assert any(float(jnp.abs(l).sum()) > 0 for l in jax.tree.leaves(g))
    cnet_params, first, last = _train(
        lambda p, r: controlnet_flow_loss(base, base_params, cnet, p, r,
                                          lat, ctrl_lat, txt, pooled),
        cnet_params, steps=30)
    assert last < first


def test_edm_precond_and_loss_and_sampler():
    # denoiser net: tiny MLP over flattened images conditioned on c_noise
    import flax.linen as nn

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, c_noise):
            B = x.shape[0]
            h = jnp.concatenate([x.reshape(B, -1), c_noise[:, None]], -1)
            h = nn.Dense(64)(h)
            h = nn.Dense(int(np.prod(x.shape[1:])))(nn.silu(h))
            return h.reshape(x.shape)

    net = Net()
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.rand(4, 4, 4, 1) * 0.5, jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x0, jnp.zeros((4,)))["params"]

    def apply(p):
        return lambda x, cn: net.apply({"params": p}, x, cn)

    # σ→0 limit: c_skip→1, c_out→0 ⇒ D(x;σ)≈x regardless of the net
    d = edm_precond(apply(params), x0, jnp.full((4,), 1e-4))
    np.testing.assert_allclose(np.asarray(d), np.asarray(x0), atol=1e-3)

    params, first, last = _train(
        lambda p, r: edm_loss(apply(p), r, x0), params, steps=60, lr=3e-3)
    assert last < first

    sig = np.asarray(karras_sigmas(8))
    assert sig[0] == pytest.approx(80.0) and sig[-1] == 0.0
    assert (np.diff(sig) < 0).all()

    out = edm_sample(apply(params), jax.random.PRNGKey(1), (2, 4, 4, 1),
                     steps=6, s_churn=2.0)
    assert np.isfinite(np.asarray(out)).all()
    # a trained denoiser pulls samples toward the data scale, far below
    # the initial σ_max=80 noise scale
    assert float(jnp.abs(out).mean()) < 5.0


def test_video_dit_trains_and_samples():
    cfg = VideoDiTConfig(num_frames=4, input_size=8, hidden_size=64,
                         num_layers=2, num_heads=2)
    model = VideoDiT(cfg)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.rand(2, 4, 8, 8, 4), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((2,)))["params"]
    v = model.apply({"params": params}, x0, jnp.full((2,), 0.5))
    assert v.shape == x0.shape

    params, first, last = _train(
        lambda p, r: video_flow_loss(model, p, r, x0), params, steps=30)
    assert last < first
    out = sample_video(model, params, jax.random.PRNGKey(1),
                       (1, 4, 8, 8, 4), steps=4)
    assert np.isfinite(np.asarray(out)).all()


def test_video_dit_cp_sharded_matches_unsharded():
    """CP via a2a reshard: loss under a (dp,cp) mesh with cp=4 equals the
    single-device value — sharding is a layout choice, not a math change."""
    from nemo_tpu.parallel.mesh import MeshConfig, make_mesh

    cfg = VideoDiTConfig(num_frames=4, input_size=8, hidden_size=64,
                         num_layers=2, num_heads=2, cp_shard=False)
    model = VideoDiT(cfg)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.rand(2, 4, 8, 8, 4), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((2,)))["params"]
    ref = float(video_flow_loss(model, params, jax.random.PRNGKey(7), x0))

    mesh = make_mesh(MeshConfig(dp=2, cp=4))
    cp_model = VideoDiT(
        VideoDiTConfig(**{**cfg.__dict__, "cp_shard": True}))
    with jax.set_mesh(mesh):
        loss = jax.jit(lambda p, x: video_flow_loss(
            cp_model, p, jax.random.PRNGKey(7), x))(params, x0)
    assert float(loss) == pytest.approx(ref, rel=1e-5)
