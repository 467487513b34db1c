"""Diffusion data pipeline: captioned/labelled image shards → latent batches.

Reference parity: `nemo/collections/diffusion/data/diffusion_energon_datamodule.py`
+ `diffusion_taskencoder.py` (Megatron-Energon webdataset shards of
CaptioningSamples decoded to VAE latents + conditioning for DiT training).

TPU-first shape: images are decoded/resized on host workers, then
VAE-encoded to latents ON-DEVICE in one jitted batched call per yielded
batch (the MXU does the conv encoder; no per-image host convs). When no
VAE is given, images train in pixel space scaled to [-1, 1] — the
DiffusionTrainModule contract {"latents" [B,H,W,C], optional "labels"}
is identical either way.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

from nemo_tpu.data.vlm_dataset import TarredVLMDataset


def _to_array(image, image_size: int) -> np.ndarray:
    """PIL image or [H,W,C] uint8 → [S,S,3] float32 in [-1, 1]."""
    import PIL.Image

    if isinstance(image, np.ndarray):
        image = PIL.Image.fromarray(image)
    image = image.convert("RGB").resize(
        (image_size, image_size), PIL.Image.BICUBIC)
    x = np.asarray(image, np.float32) / 127.5 - 1.0
    return x


class TarredDiffusionDataModule:
    """Energon-style (image, json) webdataset shards → DiT train batches.

    Sample json: {"label": int} for class-conditioned DiT and/or
    {"caption": str} for text-conditioned models. With `vae`
    (AutoEncoderKL module + its params) the batch carries VAE latents
    scaled by `latent_scale` (SD convention 0.18215); without it,
    pixel-space images. With `tokenizer`, captions are tokenized to
    {"caption_ids" [B,L], "caption_mask" [B,L]} for MMDiT-style text
    conditioning.
    """

    def __init__(self, tar_paths: Sequence[str],
                 global_batch_size: int,
                 image_size: int = 64,
                 vae=None, vae_params=None,
                 latent_scale: float = 0.18215,
                 tokenizer=None, caption_len: int = 64,
                 shard_rank: int = 0, shard_world: int = 1,
                 seed: int = 0):
        assert global_batch_size % shard_world == 0
        self.ds = TarredVLMDataset(tar_paths, shard_rank=shard_rank,
                                   shard_world=shard_world)
        self.global_batch_size = global_batch_size
        self.batch_size = global_batch_size // shard_world
        self.image_size = image_size
        self.vae = vae
        self.vae_params = vae_params
        self.latent_scale = latent_scale
        self.tokenizer = tokenizer
        self.caption_len = caption_len
        self.seed = seed
        self.micro_batch_size = None
        self._encode_jit = None

    def _encode_latents(self, images: np.ndarray, rng) -> "np.ndarray":
        import jax
        import jax.numpy as jnp

        if self.vae is None:
            return images
        if self._encode_jit is None:
            vae, scale = self.vae, self.latent_scale

            def enc(params, x, key):
                z = vae.apply({"params": params}, x, rng=key,
                              method=type(vae).encode_latent)
                return z * scale

            self._encode_jit = jax.jit(enc)
        import jax.random as jr

        key = jr.PRNGKey(int(rng.randint(1 << 31)))
        return self._encode_jit(self.vae_params, jnp.asarray(images), key)

    def _finalize(self, images, labels, captions, rng) -> Dict:
        batch = {"latents": self._encode_latents(
            np.stack(images).astype(np.float32), rng)}
        if any(l is not None for l in labels):
            batch["labels"] = np.asarray(
                [0 if l is None else int(l) for l in labels], np.int32)
        if self.tokenizer is not None:
            ids = np.zeros((len(captions), self.caption_len), np.int32)
            mask = np.zeros((len(captions), self.caption_len), np.float32)
            for i, c in enumerate(captions):
                t = list(self.tokenizer.text_to_ids(c or ""))[:self.caption_len]
                ids[i, :len(t)] = t
                mask[i, :len(t)] = 1.0
            batch["caption_ids"] = ids
            batch["caption_mask"] = mask
        return batch

    def train_batches(self, start_step: int = 0) -> Iterator[Dict]:
        rng = np.random.RandomState(self.seed)
        skip = start_step
        cycle = 0
        while True:  # cycle shards forever
            # reshuffle shard order every cycle + a small buffer shuffle
            # over decoded records (energon shuffles shards/samples between
            # epochs; a fixed order would repeat identical batches forever)
            order_rng = np.random.RandomState(self.seed + 31 * cycle)
            tar_order = list(self.ds.tar_paths)
            order_rng.shuffle(tar_order)
            shuffled = type(self.ds)(tar_order)
            shuffled.tar_paths = tar_order

            def records():
                buf = []
                for rec in shuffled:
                    buf.append(rec)
                    if len(buf) >= 256:
                        yield buf.pop(order_rng.randint(len(buf)))
                while buf:
                    yield buf.pop(order_rng.randint(len(buf)))

            images, labels, captions = [], [], []
            for rec in records():
                images.append(_to_array(rec["image"], self.image_size))
                labels.append(rec.get("label"))
                captions.append(rec.get("caption"))
                if len(images) == self.batch_size:
                    if skip > 0:
                        skip -= 1
                    else:
                        yield self._finalize(images, labels, captions, rng)
                    images, labels, captions = [], [], []
            cycle += 1


class PrecomputedLatentDataModule:
    """Directory of precomputed `.npy` latent shards (+ optional labels)
    — the reference's prepare_energon_dataset precompute path
    (`diffusion/data/prepare_energon_dataset.py`: VAE+T5 run offline,
    training reads tensors). Each shard: `latents_*.npy` [N,H,W,C] with
    an optional sibling `labels_*.npy` [N]."""

    def __init__(self, latent_dir: str, global_batch_size: int,
                 shard_rank: int = 0, shard_world: int = 1, seed: int = 0):
        names = sorted(f for f in os.listdir(latent_dir)
                       if f.startswith("latents_") and f.endswith(".npy"))
        names = [n for i, n in enumerate(names) if i % shard_world == shard_rank]
        if not names:
            raise FileNotFoundError(f"no latents_*.npy under {latent_dir}")
        self.paths = [os.path.join(latent_dir, n) for n in names]
        self.global_batch_size = global_batch_size
        self.batch_size = global_batch_size // shard_world
        self.seed = seed
        self.micro_batch_size = None

    def train_batches(self, start_step: int = 0) -> Iterator[Dict]:
        rng = np.random.RandomState(self.seed)
        step = 0
        while True:
            for p in self.paths:
                lat = np.load(p, mmap_mode="r")
                lab_p = os.path.join(
                    os.path.dirname(p),
                    os.path.basename(p).replace("latents_", "labels_"))
                lab = np.load(lab_p) if os.path.exists(lab_p) else None
                order = rng.permutation(lat.shape[0])
                for i in range(0, len(order) - self.batch_size + 1,
                               self.batch_size):
                    if step < start_step:
                        step += 1
                        continue
                    idx = np.sort(order[i:i + self.batch_size])
                    b = {"latents": np.asarray(lat[idx], np.float32)}
                    if lab is not None:
                        b["labels"] = np.asarray(lab[idx], np.int32)
                    step += 1
                    yield b


def write_diffusion_shard(tar_path: str, images: Sequence[np.ndarray],
                          metas: Sequence[Dict]) -> None:
    """Write an energon-style (image, json) shard — the
    prepare_energon_dataset packing analog (test/tooling helper)."""
    import io
    import tarfile

    import PIL.Image

    with tarfile.open(tar_path, "w") as tar:
        for i, (img, meta) in enumerate(zip(images, metas)):
            buf = io.BytesIO()
            PIL.Image.fromarray(img).save(buf, format="PNG")
            data = buf.getvalue()
            ti = tarfile.TarInfo(f"{i:06d}.png")
            ti.size = len(data)
            tar.addfile(ti, io.BytesIO(data))
            j = json.dumps(meta).encode()
            tj = tarfile.TarInfo(f"{i:06d}.json")
            tj.size = len(j)
            tar.addfile(tj, io.BytesIO(j))
