"""EDM (Karras et al.) diffusion: preconditioning, training loss, sampler.

Reference parity: `nemo/collections/diffusion/sampler/edm/edm.py`
(EDMPrecond / EDMLoss) and `edm_pipeline.py` (Karras sigma schedule,
stochastic 2nd-order Heun sampler with churn).

TPU-first: the denoiser wrapper is a pure function (preconditioning as
elementwise ops fused into the network's first/last GEMMs by XLA); the
sampler is a `lax.scan` over a precomputed static sigma table — one
compiled program regardless of step count.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def edm_precond(net_apply: Callable, x, sigma, sigma_data: float = 0.5,
                **net_kwargs):
    """D(x;σ) = c_skip·x + c_out·F(c_in·x, c_noise) (edm.py EDMPrecond)."""
    sigma = jnp.asarray(sigma, jnp.float32)
    while sigma.ndim < x.ndim:
        sigma = sigma[..., None]
    c_skip = sigma_data ** 2 / (sigma ** 2 + sigma_data ** 2)
    c_out = sigma * sigma_data * jax.lax.rsqrt(sigma ** 2 + sigma_data ** 2)
    c_in = jax.lax.rsqrt(sigma ** 2 + sigma_data ** 2)
    c_noise = jnp.log(sigma.reshape(x.shape[0])) / 4.0
    F = net_apply((c_in * x).astype(x.dtype), c_noise, **net_kwargs)
    return c_skip * x + c_out * F.astype(jnp.float32)


def edm_loss(net_apply: Callable, rng, x0, p_mean: float = -1.2,
             p_std: float = 1.2, sigma_data: float = 0.5, **net_kwargs):
    """EDMLoss: σ ~ LogNormal(p_mean, p_std), λ(σ)-weighted denoising MSE."""
    B = x0.shape[0]
    r_s, r_n = jax.random.split(rng)
    sigma = jnp.exp(p_mean + p_std * jax.random.normal(r_s, (B,)))
    sig_b = sigma.reshape((B,) + (1,) * (x0.ndim - 1))
    weight = (sig_b ** 2 + sigma_data ** 2) / (sig_b * sigma_data) ** 2
    n = jax.random.normal(r_n, x0.shape) * sig_b
    D = edm_precond(net_apply, x0 + n, sigma, sigma_data, **net_kwargs)
    return jnp.mean(weight * jnp.square(D - x0))


def karras_sigmas(steps: int, sigma_min: float = 0.002,
                  sigma_max: float = 80.0, rho: float = 7.0) -> jnp.ndarray:
    """Karras schedule σ_i = (σ_max^{1/ρ} + i/(N−1)(σ_min^{1/ρ} −
    σ_max^{1/ρ}))^ρ, with trailing 0."""
    i = np.arange(steps)
    s = (sigma_max ** (1 / rho)
         + i / max(steps - 1, 1) * (sigma_min ** (1 / rho)
                                    - sigma_max ** (1 / rho))) ** rho
    return jnp.asarray(np.append(s, 0.0), jnp.float32)


def edm_sample(net_apply: Callable, rng, shape, steps: int = 18,
               sigma_min: float = 0.002, sigma_max: float = 80.0,
               rho: float = 7.0, s_churn: float = 0.0, s_noise: float = 1.0,
               sigma_data: float = 0.5, **net_kwargs):
    """Stochastic Heun sampler (edm_pipeline.py): per step, optional churn
    up to σ̂, Euler step with dx = (x − D(x;σ))/σ, 2nd-order correction
    except at the final step."""
    sigmas = karras_sigmas(steps, sigma_min, sigma_max, rho)
    r0, rloop = jax.random.split(rng)
    x = jax.random.normal(r0, shape, jnp.float32) * sigmas[0]
    gamma = min(s_churn / steps, np.sqrt(2.0) - 1.0) if s_churn > 0 else 0.0

    def step(carry, i):
        x, key = carry
        key, kn = jax.random.split(key)
        sig = sigmas[i]
        sig_hat = sig * (1 + gamma)
        if gamma > 0:
            eps = jax.random.normal(kn, shape) * s_noise
            x = x + jnp.sqrt(sig_hat ** 2 - sig ** 2) * eps
        d = (x - edm_precond(net_apply, x, jnp.full((shape[0],), sig_hat),
                             sigma_data, **net_kwargs)) / sig_hat
        sig_next = sigmas[i + 1]
        x_euler = x + (sig_next - sig_hat) * d

        def heun(_):
            d2 = (x_euler - edm_precond(
                net_apply, x_euler, jnp.full((shape[0],), sig_next),
                sigma_data, **net_kwargs)) / sig_next
            return x + (sig_next - sig_hat) * 0.5 * (d + d2)

        x = jax.lax.cond(sig_next > 0, heun, lambda _: x_euler, None)
        return (x, key), None

    (x, _), _ = jax.lax.scan(step, (x, rloop), jnp.arange(steps))
    return x
