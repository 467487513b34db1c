"""Flux ControlNet: spatially-conditioned control branch for FluxTransformer.

Reference parity: `nemo/collections/diffusion/models/flux_controlnet/
model.py` — a trainable copy of the first N double-stream MMDiT blocks
with (a) a zero-initialized embedder for the control-image latents added
to the image stream, and (b) zero-initialized per-block output
projections whose residuals are injected into the FROZEN base
transformer's double blocks (repeated when the base has more blocks than
the controlnet, `model.py:250` interval logic).

Zero init ⇒ at step 0 the controlled model is numerically identical to
the base model — tested. TPU-first: the branch reuses the same einsum
MMDiT blocks; base + branch run in one jit program so XLA overlaps them.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from nemo_tpu.models.diffusion.dit import timestep_embedding
from nemo_tpu.models.diffusion.flux import (
    FluxConfig, FluxTransformer, MMDiTBlock, pack_latents, rope_nd,
)


@dataclasses.dataclass(frozen=True)
class FluxControlNetConfig:
    base: FluxConfig = dataclasses.field(default_factory=FluxConfig)
    num_control_layers: int = 1   # double-stream blocks in the branch


class FluxControlNet(nn.Module):
    """Runs the control branch → list of per-base-double-block residuals."""

    cfg: FluxControlNetConfig

    @nn.compact
    def __call__(self, img, control_img, txt, img_ids, txt_ids, t, pooled,
                 guidance=None):
        base = self.cfg.base
        x = nn.Dense(base.hidden_size, name="img_in")(img)
        # zero-init control embedder: branch sees base inputs at step 0
        x = x + nn.Dense(base.hidden_size, kernel_init=nn.initializers.zeros,
                         name="controlnet_x_embedder")(control_img)
        y = nn.Dense(base.hidden_size, name="txt_in")(txt)

        c = nn.Dense(base.hidden_size, name="t_mlp1")(timestep_embedding(t, 256))
        c = nn.Dense(base.hidden_size, name="t_mlp2")(nn.silu(c))
        c = c + nn.Dense(base.hidden_size, name="pooled_mlp2")(nn.silu(
            nn.Dense(base.hidden_size, name="pooled_mlp1")(pooled)))
        if base.guidance_embed:
            g = jnp.zeros_like(t) if guidance is None else guidance
            c = c + nn.Dense(base.hidden_size, name="guidance_mlp2")(nn.silu(
                nn.Dense(base.hidden_size, name="guidance_mlp1")(
                    timestep_embedding(g, 256))))

        rope = rope_nd(jnp.concatenate([txt_ids, img_ids], 1), base.axes_dims)
        residuals = []
        for i in range(self.cfg.num_control_layers):
            x, y = MMDiTBlock(base, name=f"double{i}")(x, y, c, rope)
            residuals.append(nn.Dense(
                base.hidden_size, kernel_init=nn.initializers.zeros,
                name=f"controlnet_out{i}")(x))

        # repeat residuals across the base's double blocks (interval logic)
        n_base = base.num_double_layers
        k = len(residuals)
        return [residuals[min(i * k // n_base, k - 1)] for i in range(n_base)]


def controlled_flux_apply(base_model: FluxTransformer, base_params,
                          cnet: FluxControlNet, cnet_params,
                          img, control_img, txt, img_ids, txt_ids, t, pooled,
                          guidance=None, conditioning_scale: float = 1.0):
    """Base forward with control residuals injected after each double block
    (base params frozen by the caller's optimizer masking)."""
    res = cnet.apply({"params": cnet_params}, img, control_img, txt, img_ids,
                     txt_ids, t, pooled, guidance)
    res = [conditioning_scale * r for r in res]
    return base_model.apply({"params": base_params}, img, txt, img_ids,
                            txt_ids, t, pooled, guidance,
                            control_residuals=res)


def controlnet_flow_loss(base_model, base_params, cnet, cnet_params, rng,
                         latents, control_latents, txt, pooled, guidance=None):
    """Flow-matching loss through the controlled model; grads flow only
    into cnet_params (base is stop-gradiented — reference trains the
    controlnet with the transformer frozen)."""
    base_params = jax.lax.stop_gradient(base_params)
    p = base_model.cfg.patch_size
    B = latents.shape[0]
    img, img_ids = pack_latents(latents, p)
    ctrl, _ = pack_latents(control_latents, p)
    txt_ids = jnp.zeros((B, txt.shape[1], 3), jnp.int32)
    r_t, r_n = jax.random.split(rng)
    t = jax.random.uniform(r_t, (B,))
    eps = jax.random.normal(r_n, img.shape, img.dtype)
    xt = (1 - t[:, None, None]) * img + t[:, None, None] * eps
    v = controlled_flux_apply(base_model, base_params, cnet, cnet_params,
                              xt, ctrl, txt, img_ids, txt_ids, t, pooled,
                              guidance)
    return jnp.mean(jnp.square(v - (eps - img)))
