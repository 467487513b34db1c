"""SSL pretraining patch masking for spectrograms (audio collection).

Reference parity: `nemo/collections/audio/modules/ssl_pretrain_masking.py`
(SSLPretrainWithMaskedPatch): zero out fixed-size time patches so an SSL
model learns to reconstruct them. Train mode samples, per item, a number of
patches covering ~mask_fraction of that item's valid length; eval mode uses
a fixed periodic pattern for checkpoint-comparable validation.

TPU-first: the per-item "sample k random patches" loop is replaced by a
fully-vectorized rank trick — random scores per patch, mask patches whose
rank among this item's valid patches is below k_i — one gather, no host
loop, jit/batch friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ssl_patch_mask(rng: jax.Array, spec: jnp.ndarray, lengths: jnp.ndarray,
                   patch_size: int = 10, mask_fraction: float = 0.7,
                   training: bool = True) -> jnp.ndarray:
    """Apply patch masking to spec [..., T] (time-last, any leading dims
    with batch first) given per-item valid lengths [B].

    Returns the masked spectrogram (same shape).
    """
    if not 0.0 <= mask_fraction <= 1.0:
        raise ValueError(f"mask_fraction must be in [0, 1], got {mask_fraction}")
    if patch_size <= 0:
        raise ValueError(f"patch_size must be positive, got {patch_size}")
    t = spec.shape[-1]
    b = spec.shape[0]
    if not training:
        # fixed periodic pattern: in every chunk of patch_size/fraction
        # frames, the first patch_size frames are masked
        chunk = max(int(patch_size / max(mask_fraction, 1e-6)), patch_size)
        keep = (jnp.arange(t) % chunk) >= patch_size
        shape = (1,) * (spec.ndim - 1) + (t,)
        return spec * keep.reshape(shape).astype(spec.dtype)

    n_patches = t // patch_size
    if n_patches == 0:
        return spec
    lengths = lengths.astype(jnp.int32)
    # per-item number of patches to mask (ceil of fraction over valid frames)
    len_frac = (lengths.astype(jnp.float32) * mask_fraction).astype(jnp.int32)
    k = len_frac // patch_size + (len_frac % patch_size != 0).astype(jnp.int32)
    valid = lengths // patch_size  # patches fully inside the valid region
    k = jnp.minimum(k, valid)  # [B]

    scores = jax.random.uniform(rng, (b, n_patches))
    # invalid patches get +inf so they are never ranked below k
    patch_valid = jnp.arange(n_patches)[None, :] < valid[:, None]
    scores = jnp.where(patch_valid, scores, jnp.inf)
    # rank of each patch's score within its row
    order = jnp.argsort(scores, axis=-1)
    ranks = jnp.argsort(order, axis=-1)
    masked = ranks < k[:, None]  # [B, P] True = zero out
    keep_frames = jnp.repeat(~masked, patch_size, axis=-1)  # [B, P*patch]
    keep = jnp.ones((b, t), bool).at[:, : n_patches * patch_size].set(keep_frames)
    shape = (b,) + (1,) * (spec.ndim - 2) + (t,)
    return spec * keep.reshape(shape).astype(spec.dtype)


class SSLPretrainWithMaskedPatch:
    """Module-style wrapper mirroring the reference class surface."""

    def __init__(self, patch_size: int = 10, mask_fraction: float = 0.7):
        if patch_size <= 0:
            raise ValueError(f"patch_size must be positive, got {patch_size}")
        if not 0.0 <= mask_fraction <= 1.0:
            raise ValueError(
                f"mask_fraction must be in [0.0, 1.0], got {mask_fraction}")
        self.patch_size = patch_size
        self.mask_fraction = mask_fraction

    def __call__(self, rng: jax.Array, input_spec: jnp.ndarray,
                 length: jnp.ndarray, training: bool = True) -> jnp.ndarray:
        return ssl_patch_mask(rng, input_spec, length, self.patch_size,
                              self.mask_fraction, training)
