"""DiT (Diffusion Transformer) with rectified-flow training.

Reference parity: `nemo/collections/diffusion/models/dit/dit_model.py`
(DiT blocks with adaLN-Zero timestep/condition modulation, patchified
latents) and the flow-matching training objective used by the Flux
pipeline (`diffusion/models/flux`).

TPU-first: bidirectional all-einsum attention over patch tokens,
adaLN modulation as fused elementwise ops around the two matmul blocks,
timestep embedding via the standard sinusoidal → MLP; the rectified-flow
loss (v-prediction on the straight path x_t = (1−t)x₀ + t·ε) is a pure
function over the model for use inside any jitted train step.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    input_size: int = 32          # latent H=W
    patch_size: int = 2
    in_channels: int = 4
    hidden_size: int = 384
    num_layers: int = 12
    num_heads: int = 6
    mlp_ratio: int = 4
    num_classes: int = 0          # 0 → unconditional / external cond vector
    cond_dim: Optional[int] = None  # external conditioning vector dim
    compute_dtype: str = "float32"

    @property
    def num_patches(self) -> int:
        return (self.input_size // self.patch_size) ** 2


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """Sinusoidal features of t∈[0,1]-scaled timesteps [B] → [B, dim]."""
    half = dim // 2
    freqs = jnp.exp(-np.log(max_period) * jnp.arange(half) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None] * 1000.0
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], -1)


class _DiTBlock(nn.Module):
    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, c):
        """x [B,P,D]; c [B,D] conditioning → adaLN-Zero modulation."""
        cfg = self.cfg
        D = cfg.hidden_size
        Hh = cfg.num_heads
        dh = D // Hh
        mod = nn.Dense(6 * D, kernel_init=nn.initializers.zeros, name="adaLN")(
            nn.silu(c))[:, None]  # [B,1,6D]
        sh1, sc1, g1, sh2, sc2, g2 = jnp.split(mod, 6, axis=-1)

        h = nn.LayerNorm(use_bias=False, use_scale=False, name="ln1")(x)
        h = h * (1 + sc1) + sh1
        q = nn.DenseGeneral((Hh, dh), name="q")(h)
        k = nn.DenseGeneral((Hh, dh), name="k")(h)
        v = nn.DenseGeneral((Hh, dh), name="v")(h)
        scores = jnp.einsum("bshd,bthd->bhst", q, k) / np.sqrt(dh)
        probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(x.dtype)
        att = jnp.einsum("bhst,bthd->bshd", probs, v)
        att = nn.DenseGeneral(D, axis=(-2, -1), name="o")(att)
        x = x + g1 * att

        h = nn.LayerNorm(use_bias=False, use_scale=False, name="ln2")(x)
        h = h * (1 + sc2) + sh2
        h = nn.Dense(cfg.mlp_ratio * D, name="fc1")(h)
        h = nn.gelu(h, approximate=True)
        h = nn.Dense(D, name="fc2")(h)
        return x + g2 * h


class DiT(nn.Module):
    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, t, y=None, *, train=False):
        """x [B,H,W,C] noised latents, t [B] times in [0,1], y [B] class ids
        or [B, cond_dim] vectors → velocity prediction [B,H,W,C]."""
        cfg = self.cfg
        p = cfg.patch_size
        B, Hi, Wi, C = x.shape
        # patchify via conv
        h = nn.Conv(cfg.hidden_size, (p, p), strides=(p, p), padding="VALID",
                    name="patch_embed")(x)
        h = h.reshape(B, -1, cfg.hidden_size)
        pos = self.param("pos_embedding", nn.initializers.normal(0.02),
                         (1, cfg.num_patches, cfg.hidden_size), jnp.float32)
        h = h + pos.astype(h.dtype)

        c = nn.Dense(cfg.hidden_size, name="t_mlp1")(
            timestep_embedding(t, 256))
        c = nn.Dense(cfg.hidden_size, name="t_mlp2")(nn.silu(c))
        if cfg.num_classes:
            emb = self.param("label_embedding", nn.initializers.normal(0.02),
                             (cfg.num_classes + 1, cfg.hidden_size), jnp.float32)
            c = c + jnp.take(emb, y, axis=0)
        elif cfg.cond_dim and y is not None:
            c = c + nn.Dense(cfg.hidden_size, name="cond_proj")(y)

        for i in range(cfg.num_layers):
            h = _DiTBlock(cfg, name=f"block{i}")(h, c)

        # final adaLN + linear to patch pixels (zero-init: identity at start)
        mod = nn.Dense(2 * cfg.hidden_size, kernel_init=nn.initializers.zeros,
                       name="final_adaLN")(nn.silu(c))[:, None]
        shift, scale = jnp.split(mod, 2, axis=-1)
        h = nn.LayerNorm(use_bias=False, use_scale=False, name="ln_final")(h)
        h = h * (1 + scale) + shift
        h = nn.Dense(p * p * C, kernel_init=nn.initializers.zeros,
                     name="final_proj")(h)
        # unpatchify
        hp = Hi // p
        h = h.reshape(B, hp, hp, p, p, C)
        h = jnp.einsum("bhwpqc->bhpwqc", h).reshape(B, Hi, Wi, C)
        return h


def rectified_flow_loss(model: DiT, params, rng, x0, y=None):
    """Flow matching on the straight path: x_t = (1−t)x₀ + t·ε, target
    velocity v* = ε − x₀; loss = E‖v(x_t,t) − v*‖² (Flux/SD3 objective)."""
    B = x0.shape[0]
    r_t, r_n = jax.random.split(rng)
    t = jax.random.uniform(r_t, (B,))
    eps = jax.random.normal(r_n, x0.shape, x0.dtype)
    tb = t[:, None, None, None]
    xt = (1 - tb) * x0 + tb * eps
    v = model.apply({"params": params}, xt, t, y)
    return jnp.mean(jnp.square(v - (eps - x0)))


def sample_rectified_flow(model: DiT, params, rng, shape, y=None, steps: int = 20):
    """Euler integration of dx/dt = −v from t=1 (noise) to t=0 (data)."""
    x = jax.random.normal(rng, shape)
    dt = 1.0 / steps

    def step(x, i):
        t = 1.0 - i * dt
        v = model.apply({"params": params}, x, jnp.full((shape[0],), t), y)
        return x - dt * v, None

    x, _ = jax.lax.scan(step, x, jnp.arange(steps))
    return x
