"""Tuning DB: every row is arithmetically consistent and HBM-feasible
(reference: scripts/performance/recommended_model_configs/*.csv)."""

import pytest

from nemo_tpu.llm.tuning_db import (
    DB, dump_csv, recommended_config, tuned_recipe, validate_row,
)
from nemo_tpu.models.llm.config import PRESETS


@pytest.mark.parametrize("row", DB, ids=lambda r: f"{r.model}@{r.n_chips}")
def test_row_consistency(row):
    assert row.model in PRESETS, row.model
    # mesh product == chips, gbs divides over data shards × mbs
    assert row.dp >= 1
    assert row.num_microbatches >= 1
    cfg = PRESETS[row.model]()
    assert cfg.num_attention_heads % row.tp == 0
    if row.cp > 1:
        assert row.seq_len % (2 * row.cp) == 0
    if row.ep > 1:
        assert cfg.num_moe_experts % row.ep == 0
    if row.pp > 1:
        assert cfg.num_layers % row.pp == 0, (cfg.num_layers, row.pp)


@pytest.mark.parametrize("row", DB, ids=lambda r: f"{r.model}@{r.n_chips}")
def test_row_hbm_feasible(row):
    v = validate_row(row)
    assert v["fits"], (row.model, row.n_chips, v)


def test_query_exact_and_rescaled():
    r = recommended_config("llama3_8b", 16, system="v5e")
    assert r is not None and r.n_chips == 16 and r.fsdp == 16
    # long-context variant selected by seq_len
    r64k = recommended_config("llama3_8b", 64, seq_len=65536)
    assert r64k.cp == 4
    # no exact row @ 64 chips for mistral → rescaled from 16 along dp
    r64 = recommended_config("mistral_7b", 64)
    assert r64.n_chips == 64 and r64.dp * r64.fsdp * r64.tp == 64
    assert r64.gbs % (r64.dp * r64.fsdp * r64.mbs) == 0


def test_tuned_recipe_builds():
    rec = tuned_recipe("llama3_8b", 16, system="v5e")
    assert rec.global_batch_size == 256
    m = rec.mesh.resolved(16)
    assert m.dp * m.fsdp * m.cp * m.ep * m.tp * m.pp == 16


def test_csv_dump_schema():
    csv = dump_csv()
    lines = csv.strip().split("\n")
    assert lines[0].startswith("task,model,system,dtype,num_chips")
    assert len(lines) == len(DB) + 1
