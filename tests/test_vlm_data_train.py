"""VLM data pipeline + NeVA training stage tests (reference
vlm/neva/data/preloaded.py, mock.py; vlm recipes' freeze stages)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu.data.vlm_dataset import (
    CLIPImageProcessor,
    MockVLMDataModule,
    NevaPreloadedDataModule,
    llava_conversation_prompt,
    tokenize_with_images,
)
from nemo_tpu.models.llm.config import GPTConfig
from nemo_tpu.models.vision.vit import ViTConfig
from nemo_tpu.models.vlm.neva import NevaConfig
from nemo_tpu.models.vlm.train import VLMTrainModule


class CharTok:
    def text_to_ids(self, t):
        return [ord(c) % 200 + 1 for c in t]


def test_clip_image_processor_shapes_and_norm():
    proc = CLIPImageProcessor(size=64, crop_size=64)
    img = (np.random.RandomState(0).rand(100, 80, 3) * 255).astype(np.uint8)
    out = proc(img)
    assert out.shape == (64, 64, 3) and out.dtype == np.float32
    # normalization: a mid-gray image lands near (0.5-mean)/std per channel
    gray = np.full((64, 64, 3), 128, np.uint8)
    g = proc(gray)
    expect = (128 / 255 - np.asarray(proc.mean)) / np.asarray(proc.std)
    assert np.allclose(g.mean(axis=(0, 1)), expect, atol=1e-2)
    # pad-to-square keeps aspect (LLaVA 'pad' mode)
    wide = (np.random.RandomState(1).rand(20, 80, 3) * 255).astype(np.uint8)
    assert CLIPImageProcessor(size=64, pad_to_square=True)(wide).shape == \
        (64, 64, 3)


def test_llava_conversation_spans_cover_assistant_only():
    conv = [{"from": "human", "value": "<image>\nWhat?"},
            {"from": "gpt", "value": "A cat."},
            {"from": "human", "value": "Sure?"},
            {"from": "gpt", "value": "Yes."}]
    prompt, spans = llava_conversation_prompt(conv)
    assert [prompt[a:b] for a, b in spans] == ["A cat.", "Yes."]
    assert "<image>" in prompt


def test_tokenize_with_images_expands_placeholders():
    ids = tokenize_with_images("a<image>b", CharTok(), image_token_id=999,
                               num_image_tokens=3)
    assert ids.count(999) == 3
    assert ids[0] == ord("a") % 200 + 1 and ids[-1] == ord("b") % 200 + 1


def test_preloaded_module_batches(tmp_path):
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(3):
        Image.fromarray((np.random.RandomState(i).rand(40, 52, 3) * 255)
                        .astype(np.uint8)).save(img_dir / f"{i}.jpg")
    manifest = [
        {"image": f"{i}.jpg",
         "conversations": [
             {"from": "human", "value": "<image>\nDescribe."},
             {"from": "gpt", "value": f"Answer {i}."}]}
        for i in range(3)
    ]
    mpath = tmp_path / "m.json"
    mpath.write_text(json.dumps(manifest))
    dm = NevaPreloadedDataModule(
        str(mpath), str(img_dir), CharTok(),
        image_processor=CLIPImageProcessor(size=32, crop_size=32),
        seq_length=192, global_batch_size=2, image_token_id=201,
        num_image_tokens=4)
    batch = next(dm.train_batches())
    assert batch["tokens"].shape == (2, 192)
    assert batch["images"].shape == (2, 32, 32, 3)
    # exactly num_image_tokens placeholders per row; supervision only on
    # assistant text (which never includes placeholders)
    toks = np.asarray(batch["tokens"])
    mask = np.asarray(batch["loss_mask"])
    assert ((toks == 201).sum(1) == 4).all()
    assert (mask[toks == 201] == 0).all()
    assert mask.sum() > 0


def test_vlm_train_freeze_stages():
    """Stage-1 (freeze vision+language) must update ONLY the projector;
    loss must be finite and decrease over a few steps on a fixed batch."""
    cfg = NevaConfig(
        llm=GPTConfig(num_layers=1, hidden_size=32, ffn_hidden_size=64,
                      num_attention_heads=2, vocab_size=256, seq_length=32,
                      params_dtype="float32", compute_dtype="float32",
                      remat="none"),
        vision=ViTConfig(image_size=16, patch_size=8, num_layers=1,
                         hidden_size=16, ffn_hidden_size=32, num_heads=2),
        image_token_id=255, freeze_vision=True)
    mod = VLMTrainModule(cfg, freeze=("vision", "language"), image_size=16)
    state = mod.init_state()
    p0 = jax.tree.map(np.asarray, state.params)
    dm = MockVLMDataModule(seq_length=32, global_batch_size=2,
                           vocab_size=256, image_size=16,
                           image_token_id=255, num_image_tokens=4)
    batch = next(dm.train_batches())
    losses = []
    for i in range(5):
        state, m = mod.train_step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
    p1 = jax.tree.map(np.asarray, state.params)

    def changed(a, b):
        return any(np.abs(x - y).max() > 0 for x, y in
                   zip(jax.tree.leaves(a), jax.tree.leaves(b)))

    assert not changed(p0["vision"], p1["vision"])
    assert not changed(p0["llm"], p1["llm"])
    assert changed({k: v for k, v in p0.items() if k.startswith("proj")},
                   {k: v for k, v in p1.items() if k.startswith("proj")})


def test_tarred_vlm_module_batches(tmp_path):
    """Energon-style tar shards (image+json pairs) stream through the same
    static collation as the preloaded module."""
    import tarfile

    from PIL import Image

    from nemo_tpu.data.vlm_dataset import TarredVLMDataModule

    for shard in range(2):
        with tarfile.open(tmp_path / f"shard{shard}.tar", "w") as tar:
            for i in range(3):
                key = f"s{shard}_{i}"
                img_p = tmp_path / f"{key}.jpg"
                Image.fromarray(
                    (np.random.RandomState(i).rand(48, 36, 3) * 255)
                    .astype(np.uint8)).save(img_p)
                meta_p = tmp_path / f"{key}.json"
                meta_p.write_text(json.dumps({"conversations": [
                    {"from": "human", "value": "<image>\nWhat?"},
                    {"from": "gpt", "value": f"Thing {shard}{i}."}]}))
                tar.add(img_p, arcname=f"{key}.jpg")
                tar.add(meta_p, arcname=f"{key}.json")
    from nemo_tpu.data.vlm_dataset import CLIPImageProcessor

    dm = TarredVLMDataModule(
        [str(tmp_path / "shard0.tar"), str(tmp_path / "shard1.tar")],
        CharTok(), image_processor=CLIPImageProcessor(size=32, crop_size=32),
        seq_length=192, global_batch_size=4, image_token_id=201,
        num_image_tokens=4)
    it = dm.train_batches()
    b1 = next(it)
    assert b1["tokens"].shape == (4, 192)
    assert b1["images"].shape == (4, 32, 32, 3)
    toks = np.asarray(b1["tokens"])
    assert ((toks == 201).sum(1) == 4).all()
    # wraps across epochs (6 samples, batch 4 → second batch crosses wrap)
    b2 = next(it)
    assert b2["tokens"].shape == (4, 192)
    # shard scatter: rank 0 of world 2 sees only one shard
    dm0 = TarredVLMDataModule(
        [str(tmp_path / "shard0.tar"), str(tmp_path / "shard1.tar")],
        CharTok(), image_processor=CLIPImageProcessor(size=32, crop_size=32),
        seq_length=192, global_batch_size=3, image_token_id=201,
        num_image_tokens=4, shard_rank=0, shard_world=2)
    assert len(dm0.ds.tar_paths) == 1
