"""SpecAugment as vectorized JAX (no kernel needed on TPU — VPU masks).

Reference parity: SpectrogramAugmentation (`asr/modules/audio_preprocessing.py:443`)
backed by the numba-CUDA kernel (`asr/parts/numba/spec_augment/spec_aug_numba.py`);
here mask generation is pure PRNG + broadcasted comparisons (SURVEY.md §2.9:
"vectorized JAX — no kernel needed").
"""

from __future__ import annotations

from functools import partial
from typing import Tuple, Union

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("freq_masks", "time_masks", "freq_width", "time_width"))
def spec_augment(
    rng: jax.Array,
    spec: jnp.ndarray,  # [B, D, T]
    length: jnp.ndarray,  # [B] valid frames
    freq_masks: int = 2,
    time_masks: int = 10,
    freq_width: int = 27,
    time_width: Union[int, float] = 0.05,
    mask_value: float = 0.0,
) -> jnp.ndarray:
    """Applies `freq_masks` frequency stripes and `time_masks` adaptive time
    stripes per utterance (width ~ U(0, w); fractional time_width scales with
    utterance length, matching the reference's adaptive masking)."""
    B, D, T = spec.shape
    out = spec

    if freq_masks > 0:
        rng, k1, k2 = jax.random.split(rng, 3)
        w = jax.random.randint(k1, (B, freq_masks), 0, freq_width + 1)
        start = jax.random.randint(k2, (B, freq_masks), 0, jnp.maximum(D - freq_width, 1))
        f = jnp.arange(D)[None, None, :]
        mask = ((f >= start[..., None]) & (f < (start + w)[..., None])).any(axis=1)  # [B, D]
        out = jnp.where(mask[:, :, None], mask_value, out)

    if time_masks > 0:
        rng, k1, k2 = jax.random.split(rng, 3)
        if isinstance(time_width, float) and time_width <= 1.0:
            max_w = jnp.maximum((length.astype(jnp.float32) * time_width).astype(jnp.int32), 1)
        else:
            max_w = jnp.full((B,), int(time_width), jnp.int32)
        u = jax.random.uniform(k1, (B, time_masks))
        w = (u * (max_w[:, None] + 1)).astype(jnp.int32)
        su = jax.random.uniform(k2, (B, time_masks))
        start = (su * jnp.maximum(length[:, None] - w, 1)).astype(jnp.int32)
        t = jnp.arange(T)[None, None, :]
        mask = ((t >= start[..., None]) & (t < (start + w)[..., None])).any(axis=1)  # [B, T]
        out = jnp.where(mask[:, None, :], mask_value, out)

    return out
