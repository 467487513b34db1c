"""Video DiT: factorized space-time diffusion transformer (MovieGen-style).

Reference parity: `nemo/collections/diffusion/models/dit/dit_model.py`
(DiT over video latents with spatial+temporal attention,
`STDiTLayerWithAdaLN` in `dit_layer_spec.py:206`) and
`sampler/context_parallel.py` (sequence split over CP ranks).

TPU-first CP: instead of ring p2p, the factorized layout makes context
parallelism an ALL-TO-ALL RESHARD (the reference's `cp_comm_type="a2a"`
Ulysses mode): spatial attention shards the FRAME axis over `cp` (frames
are independent), temporal attention shards the SPATIAL axis over `cp`
(pixel trajectories are independent). Two `with_sharding_constraint`
annotations per block express this; XLA inserts the a2a on ICI. No
attention kernel ever sees a sharded softmax axis, so no collectives
inside attention at all.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from nemo_tpu.models.diffusion.dit import timestep_embedding


@dataclasses.dataclass(frozen=True)
class VideoDiTConfig:
    num_frames: int = 8
    input_size: int = 16          # latent H = W
    patch_t: int = 1
    patch_size: int = 2
    in_channels: int = 4
    hidden_size: int = 128
    num_layers: int = 2
    num_heads: int = 4
    mlp_ratio: int = 4
    cond_dim: int = 0             # external conditioning vector dim
    cp_shard: bool = False        # annotate activations for the cp mesh axis

    @property
    def t_tokens(self) -> int:
        return self.num_frames // self.patch_t

    @property
    def s_tokens(self) -> int:
        return (self.input_size // self.patch_size) ** 2


def _mod(c, n, name):
    m = nn.Dense(n * c.shape[-1], kernel_init=nn.initializers.zeros,
                 name=name)(nn.silu(c))[:, None]
    return jnp.split(m, n, axis=-1)


class _Attn(nn.Module):
    heads: int

    @nn.compact
    def __call__(self, x):
        D = x.shape[-1]
        dh = D // self.heads
        q = nn.DenseGeneral((self.heads, dh), name="q")(x)
        k = nn.DenseGeneral((self.heads, dh), name="k")(x)
        v = nn.DenseGeneral((self.heads, dh), name="v")(x)
        att = jax.nn.softmax(
            (jnp.einsum("bshd,bthd->bhst", q, k) / np.sqrt(dh)
             ).astype(jnp.float32), -1).astype(x.dtype)
        out = jnp.einsum("bhst,bthd->bshd", att, v)
        return nn.DenseGeneral(D, axis=(-2, -1), name="o")(out)


class STDiTBlock(nn.Module):
    """Spatial attn → temporal attn → MLP, each adaLN-Zero gated
    (STDiTLayerWithAdaLN: full_self_attention + temporal_self_attention)."""

    cfg: VideoDiTConfig

    @nn.compact
    def __call__(self, x, c):
        """x [B, T', S, D]; c [B, D]."""
        cfg = self.cfg
        B, T, S, D = x.shape
        (s_sh, s_sc, s_g, t_sh, t_sc, t_g, m_sh, m_sc, m_g) = _mod(
            c, 9, "adaLN")

        def ln(h, name):
            return nn.LayerNorm(use_bias=False, use_scale=False, name=name)(h)

        # spatial: frames independent → shard T' over cp
        h = ln(x, "ln_s") * (1 + s_sc[:, None]) + s_sh[:, None]
        if cfg.cp_shard:
            h = jax.lax.with_sharding_constraint(
                h, P(("dp", "fsdp"), "cp", None, None))
        h = _Attn(cfg.num_heads, name="spatial_attn")(
            h.reshape(B * T, S, D)).reshape(B, T, S, D)
        x = x + s_g[:, None] * h

        # temporal: spatial positions independent → shard S over cp
        h = ln(x, "ln_t") * (1 + t_sc[:, None]) + t_sh[:, None]
        if cfg.cp_shard:
            h = jax.lax.with_sharding_constraint(
                h, P(("dp", "fsdp"), None, "cp", None))
        h = jnp.swapaxes(h, 1, 2).reshape(B * S, T, D)
        h = _Attn(cfg.num_heads, name="temporal_attn")(h)
        h = jnp.swapaxes(h.reshape(B, S, T, D), 1, 2)
        x = x + t_g[:, None] * h

        h = ln(x, "ln_m") * (1 + m_sc[:, None]) + m_sh[:, None]
        h = nn.Dense(cfg.mlp_ratio * D, name="fc1")(h)
        h = nn.Dense(D, name="fc2")(nn.gelu(h, approximate=True))
        return x + m_g[:, None] * h


class VideoDiT(nn.Module):
    cfg: VideoDiTConfig

    @nn.compact
    def __call__(self, x, t, y=None):
        """x [B,T,H,W,C] video latents, t [B] in [0,1], y [B, cond_dim]
        → velocity [B,T,H,W,C]."""
        cfg = self.cfg
        B, T, Hi, Wi, C = x.shape
        pt, ps = cfg.patch_t, cfg.patch_size
        h = nn.Conv(cfg.hidden_size, (pt, ps, ps), strides=(pt, ps, ps),
                    padding="VALID", name="patch_embed")(x)
        Tt, Hs, Ws = h.shape[1:4]
        h = h.reshape(B, Tt, Hs * Ws, cfg.hidden_size)
        # factorized learned positions: temporal + spatial
        pos_t = self.param("pos_t", nn.initializers.normal(0.02),
                           (1, cfg.t_tokens, 1, cfg.hidden_size), jnp.float32)
        pos_s = self.param("pos_s", nn.initializers.normal(0.02),
                           (1, 1, cfg.s_tokens, cfg.hidden_size), jnp.float32)
        h = h + pos_t.astype(h.dtype) + pos_s.astype(h.dtype)

        c = nn.Dense(cfg.hidden_size, name="t_mlp1")(timestep_embedding(t, 256))
        c = nn.Dense(cfg.hidden_size, name="t_mlp2")(nn.silu(c))
        if cfg.cond_dim and y is not None:
            c = c + nn.Dense(cfg.hidden_size, name="cond_proj")(y)

        for i in range(cfg.num_layers):
            h = STDiTBlock(cfg, name=f"block{i}")(h, c)

        shift, scale = _mod(c, 2, "final_adaLN")
        h = nn.LayerNorm(use_bias=False, use_scale=False, name="ln_final")(h)
        h = h * (1 + scale[:, None]) + shift[:, None]
        h = nn.Dense(pt * ps * ps * C, kernel_init=nn.initializers.zeros,
                     name="final_proj")(h)
        h = h.reshape(B, Tt, Hs, Ws, pt, ps, ps, C)
        h = jnp.einsum("bthwpqrc->btphqwrc", h)
        return h.reshape(B, T, Hi, Wi, C)


def video_flow_loss(model: VideoDiT, params, rng, x0, y=None):
    """Rectified-flow objective over video latents."""
    B = x0.shape[0]
    r_t, r_n = jax.random.split(rng)
    t = jax.random.uniform(r_t, (B,))
    eps = jax.random.normal(r_n, x0.shape, x0.dtype)
    tb = t.reshape((B,) + (1,) * (x0.ndim - 1))
    xt = (1 - tb) * x0 + tb * eps
    v = model.apply({"params": params}, xt, t, y)
    return jnp.mean(jnp.square(v - (eps - x0)))


def sample_video(model: VideoDiT, params, rng, shape, y=None, steps: int = 10):
    x = jax.random.normal(rng, shape)
    dt = 1.0 / steps

    def step(x, i):
        t = jnp.full((shape[0],), 1.0 - i * dt)
        return x - dt * model.apply({"params": params}, x, t, y), None

    x, _ = jax.lax.scan(step, x, jnp.arange(steps))
    return x
