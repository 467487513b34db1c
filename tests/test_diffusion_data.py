"""Diffusion data pipeline: energon-style shards → latent batches → DiT
training (reference diffusion_energon_datamodule + prepare_energon_dataset)."""

import numpy as np
import pytest


def _shard(tmp_path, n=6, size=16):
    from nemo_tpu.data.diffusion_dataset import write_diffusion_shard

    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 255, (size, size, 3), np.uint8) for _ in range(n)]
    metas = [{"label": i % 3, "caption": f"a photo number {i}"}
             for i in range(n)]
    p = str(tmp_path / "shard_000000.tar")
    write_diffusion_shard(p, imgs, metas)
    return p


def test_tarred_pixel_space_batches(tmp_path):
    from nemo_tpu.data.diffusion_dataset import TarredDiffusionDataModule

    p = _shard(tmp_path)
    dm = TarredDiffusionDataModule([p], global_batch_size=2, image_size=16)
    it = dm.train_batches()
    b = next(it)
    assert b["latents"].shape == (2, 16, 16, 3)
    assert np.abs(b["latents"]).max() <= 1.0
    assert b["labels"].shape == (2,)
    b2 = next(it)
    assert not np.allclose(b["latents"], b2["latents"])


def test_tarred_vae_latent_batches(tmp_path):
    import jax
    import flax.linen as nn

    from nemo_tpu.data.diffusion_dataset import TarredDiffusionDataModule
    from nemo_tpu.models.diffusion.vae import (
        AutoEncoderKL, AutoEncoderKLConfig)

    p = _shard(tmp_path)
    cfg = AutoEncoderKLConfig(ch=8, ch_mult=(1, 2), z_channels=4,
                              num_res_blocks=1)
    vae = AutoEncoderKL(cfg)
    x0 = np.zeros((1, 16, 16, 3), np.float32)
    params = nn.meta.unbox(
        vae.init(jax.random.PRNGKey(0), x0)["params"])
    dm = TarredDiffusionDataModule([p], global_batch_size=2, image_size=16,
                                   vae=vae, vae_params=params)
    b = next(dm.train_batches())
    # 16px / 2x downscale (one ch_mult step), z_channels latents
    assert b["latents"].shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(b["latents"])).all()


def test_caption_tokenization(tmp_path):
    from nemo_tpu.data.diffusion_dataset import TarredDiffusionDataModule
    from nemo_tpu.data.text_tokenizers import CharTokenizer

    p = _shard(tmp_path)
    tok = CharTokenizer(["<pad>"] + [chr(ord("a") + i) for i in range(26)]
                        + [" "] + list("0123456789"), unk=" ")
    dm = TarredDiffusionDataModule([p], global_batch_size=2, image_size=16,
                                   tokenizer=tok, caption_len=32)
    b = next(dm.train_batches())
    assert b["caption_ids"].shape == (2, 32)
    assert b["caption_mask"].sum() > 0
    # mask marks exactly the token positions
    assert ((b["caption_ids"] != 0) <= (b["caption_mask"] > 0)).all()


def test_precomputed_latents_resume(tmp_path):
    from nemo_tpu.data.diffusion_dataset import PrecomputedLatentDataModule

    rng = np.random.RandomState(1)
    np.save(tmp_path / "latents_000.npy",
            rng.randn(8, 4, 4, 2).astype(np.float32))
    np.save(tmp_path / "labels_000.npy",
            rng.randint(0, 5, 8).astype(np.int32))
    dm = PrecomputedLatentDataModule(str(tmp_path), global_batch_size=2)
    it = dm.train_batches()
    first_two = [next(it), next(it)]
    # start_step resume reproduces the stream
    it2 = dm.train_batches(start_step=1)
    b = next(it2)
    assert np.allclose(b["latents"], first_two[1]["latents"])
    assert (b["labels"] == first_two[1]["labels"]).all()


def test_dit_trains_from_shard(tmp_path):
    from nemo_tpu.data.diffusion_dataset import TarredDiffusionDataModule
    from nemo_tpu.models.diffusion.dit import DiTConfig
    from nemo_tpu.models.diffusion.train import DiffusionTrainModule

    p = _shard(tmp_path, size=8)
    dm = TarredDiffusionDataModule([p], global_batch_size=2, image_size=8)
    cfg = DiTConfig(input_size=8, patch_size=2, in_channels=3,
                    hidden_size=32, num_layers=2, num_heads=2,
                    num_classes=3)
    mod = DiffusionTrainModule(cfg)
    state = mod.init_state()
    it = dm.train_batches()
    for _ in range(2):
        state, m = mod.train_step(state, next(it))
    assert np.isfinite(float(m["loss"]))
