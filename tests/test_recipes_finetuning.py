"""Recipe factories + finetuning datamodule tests."""

import json

import numpy as np
import pytest

import jax

from nemo_tpu.data.fine_tuning import FineTuningDataModule
from nemo_tpu.llm.recipes import RECIPES


def test_all_recipes_build_configs():
    """Every recipe resolves a valid mesh and model config on this host
    (reference: tests/collections/llm/recipes — configs are pure data)."""
    for name, factory in RECIPES.items():
        r = factory()
        assert r.model.num_layers > 0
        mesh = r.mesh
        n = jax.device_count()
        assert mesh.dp * mesh.fsdp * mesh.cp * mesh.ep * mesh.tp == n, (name, mesh)
        sched = r.lr_schedule()
        assert float(sched(0)) >= 0


def test_tiny_recipe_runs():
    r = RECIPES["tiny_test"]()
    module, data, trainer = r.build(max_steps=2)
    metrics = trainer.fit(module, data)
    assert np.isfinite(float(metrics["loss"]))


@pytest.fixture
def jsonl_file(tmp_path):
    p = tmp_path / "sft.jsonl"
    rows = [
        {"input": "What is two plus two?", "output": "four"},
        {"input": "Color of the sky?", "output": "blue"},
        {"input": "Opposite of hot?", "output": "cold"},
        {"input": "First prime?", "output": "two"},
    ]
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return str(p)


class ByteTok:
    eos_id = 0

    def text_to_ids(self, t):
        return [1 + (b % 120) for b in t.encode()]

    def ids_to_text(self, ids):
        return bytes(i - 1 for i in ids if i > 0).decode(errors="replace")


def test_finetuning_datamodule_answer_mask(jsonl_file):
    dm = FineTuningDataModule(jsonl_file, ByteTok(), seq_length=64, global_batch_size=2)
    batch = next(dm.train_batches(0))
    assert batch["tokens"].shape == (2, 64)
    mask = np.asarray(batch["loss_mask"])
    # prompt region masked, answer region not; some of each
    assert (mask.sum(axis=1) > 0).all()
    toks = np.asarray(batch["tokens"])
    valid = (toks != 0).sum(axis=1)
    assert (mask.sum(axis=1) < valid).all()


def test_finetuning_packed(jsonl_file):
    dm = FineTuningDataModule(jsonl_file, ByteTok(), seq_length=64,
                              global_batch_size=1, packed=True)
    batch = next(dm.train_batches(0))
    seg = np.asarray(batch["segment_ids"])
    assert seg.max() >= 2  # multiple samples packed into one row
    assert "positions" in batch
