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
        m = r.model
        if r.family == "hyena":
            layers = m.n_layers          # HyenaLM flax module
        elif r.family in ("embedding", "reranker", "vlm", "speechlm"):
            layers = m.llm.num_layers    # config wraps the LLM backbone
        elif r.family == "clip":
            layers = m.text.num_layers   # dual towers; text depth stands in
        elif r.family == "hf":
            layers = m.num_hidden_layers  # transformers config
        else:
            layers = m.num_layers
        assert layers > 0, name
        mesh = r.mesh
        n = jax.device_count()
        assert mesh.dp * mesh.fsdp * mesh.cp * mesh.ep * mesh.tp == n, (name, mesh)
        sched = r.lr_schedule()
        assert float(sched(0)) >= 0


def test_recipe_count_vs_reference():
    """The reference ships 107 model recipe modules; ours must cover ≥90
    (VERDICT r03 item 10)."""
    assert len(RECIPES) >= 90, len(RECIPES)


def test_nongpt_family_recipes_run_tiny():
    """One tiny train step through each non-GPT family path (ssm, hyena,
    bert, embedding, reranker) via Recipe.build — the same loop the GPT
    recipes use."""
    import dataclasses as dc

    from nemo_tpu.llm.recipes import Recipe
    from nemo_tpu.models.llm.ssm import SSMConfig
    from nemo_tpu.ops.hyena import HyenaLM
    from nemo_tpu.models.llm.bert import BertConfig
    from nemo_tpu.models.llm.embedding import EmbeddingConfig
    from nemo_tpu.models.llm.config import GPTConfig
    from nemo_tpu.parallel.mesh import MeshConfig

    mesh = MeshConfig(fsdp=-1).resolved_or_default()
    tiny_gpt = GPTConfig(num_layers=1, hidden_size=16, ffn_hidden_size=32,
                         num_attention_heads=2, vocab_size=64, seq_length=16,
                         causal=False, params_dtype="float32",
                         compute_dtype="float32", remat="none")
    cases = [
        Recipe("ssm_tiny", SSMConfig(num_layers=2, hidden_size=32,
                                     vocab_size=64, seq_length=16,
                                     num_heads=4, head_dim=8),
               mesh, 8, 1, family="ssm"),
        Recipe("hyena_tiny", HyenaLM(vocab_size=64, d_model=32, n_layers=2),
               mesh, 8, 1, family="hyena", seq_length=16),
        Recipe("bert_tiny", BertConfig(num_layers=2, hidden_size=32,
                                       ffn_hidden_size=64,
                                       num_attention_heads=4, vocab_size=64,
                                       seq_length=16),
               mesh, 8, 1, family="bert"),
        Recipe("embed_tiny", EmbeddingConfig(llm=tiny_gpt,
                                             num_hard_negatives=1),
               mesh, 8, 1, family="embedding"),
        Recipe("rerank_tiny", EmbeddingConfig(llm=tiny_gpt,
                                              num_hard_negatives=1),
               mesh, 8, 1, family="reranker"),
    ]
    for r in cases:
        module, data, trainer = r.build(max_steps=2)
        metrics = trainer.fit(module, data)
        assert np.isfinite(float(metrics["loss"])), r.name


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


def test_chat_datamodule_per_turn_mask(tmp_path):
    from nemo_tpu.data.fine_tuning import ChatDataModule

    p = tmp_path / "chat.jsonl"
    rows = [
        {"messages": [
            {"role": "user", "content": "hi there"},
            {"role": "assistant", "content": "hello"},
            {"role": "user", "content": "what is up"},
            {"role": "assistant", "content": "the sky"},
        ]},
        {"messages": [
            {"role": "user", "content": "ping"},
            {"role": "assistant", "content": "pong"},
        ]},
    ]
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    dm = ChatDataModule(str(p), ByteTok(), seq_length=128,
                        global_batch_size=2, prompt_format="chatml")
    batch = next(dm.train_batches(0))
    mask = np.asarray(batch["loss_mask"])
    toks = np.asarray(batch["tokens"])
    valid = (toks != 0).sum(axis=1)
    # loss only on assistant turns: strictly between 0 and all valid tokens
    assert (mask.sum(axis=1) > 0).all()
    assert (mask.sum(axis=1) < valid).all()
    # the multi-turn row has two disjoint unmasked spans (mask 1->0->1);
    # rows are shuffled, so check the max transition count across the batch
    transitions = max(
        int(np.abs(np.diff(mask[b][: int(valid[b])])).sum())
        for b in range(mask.shape[0]))
    assert transitions >= 3


def test_squad_dolly_hf_datamodules(tmp_path):
    from nemo_tpu.data.fine_tuning import (
        DollyDataModule, HFDatasetDataModule, SquadDataModule)

    sq = tmp_path / "squad.jsonl"
    with open(sq, "w") as f:
        f.write(json.dumps({"context": "Paris is in France.",
                            "question": "Where is Paris?",
                            "answers": {"text": ["France"]}}) + "\n")
        f.write(json.dumps({"context": "x", "question": "y",
                            "answers": {"text": []}}) + "\n")
    dm = SquadDataModule(str(sq), ByteTok(), seq_length=96,
                         global_batch_size=1)
    assert len(dm.examples) == 1  # unanswerable row dropped
    assert dm.examples[0]["input"].startswith("Context: Paris")
    assert dm.examples[0]["input"].endswith("Answer:")
    batch = next(dm.train_batches(0))
    assert batch["tokens"].shape == (1, 96)

    do = tmp_path / "dolly.jsonl"
    with open(do, "w") as f:
        f.write(json.dumps({"instruction": "Summarize.",
                            "context": "Long text here.",
                            "response": "Short."}) + "\n")
        f.write(json.dumps({"instruction": "Say hi.", "context": "",
                            "response": "Hi."}) + "\n")
    dm = DollyDataModule(str(do), ByteTok(), seq_length=96,
                         global_batch_size=2)
    assert len(dm.examples) == 2
    joined = dm.examples[0]["input"]
    assert "Summarize." in joined and "Long text here." in joined
    assert dm.examples[1]["input"] == "Say hi."

    rows = [{"q": "a or b?", "a": "a"}, {"q": "b or c?", "a": "c"}]
    dm = HFDatasetDataModule(
        rows, ByteTok(), seq_length=64, global_batch_size=2,
        map_fn=lambda r: {"input": r["q"], "output": r["a"]})
    batch = next(dm.train_batches(0))
    assert batch["tokens"].shape == (2, 64)


def test_finetune_recipe_derivation():
    """finetune_recipe derives SFT defaults from every pretrain recipe
    (reference: recipes/finetune_default.py default_finetune_recipe +
    per-model finetune_recipe factories)."""
    from nemo_tpu.llm.peft import LoRA
    from nemo_tpu.llm.recipes import finetune_recipe

    for name in ("llama3_8b", "mixtral_8x7b", "tiny_test"):
        fr = finetune_recipe(name)
        assert isinstance(fr.peft, LoRA) and not fr.peft.dora
        assert fr.lr == 1e-4
        assert fr.model.seq_length <= 2048
        assert fr.global_batch_size <= 128

    full = finetune_recipe("llama3_8b", peft_scheme="none")
    assert full.peft is None and full.lr == 5e-6
    dora = finetune_recipe("llama3_8b", peft_scheme="dora")
    assert dora.peft.dora

    with pytest.raises(ValueError):
        finetune_recipe("llama3_8b", peft_scheme="qlora")


def test_finetune_recipe_runs_lora(jsonl_file):
    """End-to-end: tiny recipe → LoRA SFT on a jsonl datamodule."""
    from nemo_tpu.llm.recipes import RECIPES, finetune_recipe
    from nemo_tpu.models.llm.train import GPTTrainModule

    gbs = jax.device_count()
    fr = finetune_recipe("tiny_test", peft_scheme="lora",
                         global_batch_size=gbs, max_steps=2, warmup_steps=1)
    base = GPTTrainModule(fr.model, mesh_cfg=fr.mesh)
    params = base.init_state(seed=0).params
    dm = FineTuningDataModule(jsonl_file, ByteTok(),
                              seq_length=fr.model.seq_length,
                              global_batch_size=gbs)
    module, state, metrics = fr.run(params, dm, max_steps=2)
    assert np.isfinite(float(metrics["loss"]))
    # ADVICE r3: the recipe's lr must reach the module's ACTUAL optimizer —
    # the schedule instance flows through finetune() into the train module
    sched = module.lr_schedule
    assert sched is not None
    assert float(sched(1)) == pytest.approx(fr.lr, rel=1e-6)  # warmup_steps=1


def test_finetune_recipe_gbs_mismatch_raises(jsonl_file):
    """A data module whose global_batch_size disagrees with the recipe's is
    rejected instead of silently training at the data module's GBS."""
    from nemo_tpu.llm.recipes import finetune_recipe

    gbs = jax.device_count()
    fr = finetune_recipe("tiny_test", peft_scheme="lora",
                         global_batch_size=gbs * 2, max_steps=2)
    dm = FineTuningDataModule(jsonl_file, ByteTok(),
                              seq_length=fr.model.seq_length,
                              global_batch_size=gbs)
    with pytest.raises(ValueError, match="global_batch_size"):
        fr.run(None, dm)


def test_finetune_full_sft_lr_plumbed(jsonl_file):
    """Full (non-PEFT) finetune: lr 5e-6 reaches GPTTrainModule's schedule
    (the round-3 bug ran full SFT at the 3e-4 pretrain default)."""
    from nemo_tpu.llm.recipes import finetune_recipe
    from nemo_tpu.models.llm.train import GPTTrainModule

    gbs = jax.device_count()
    fr = finetune_recipe("tiny_test", peft_scheme=None,
                         global_batch_size=gbs, max_steps=4, warmup_steps=1)
    assert fr.lr == 5e-6
    base = GPTTrainModule(fr.model, mesh_cfg=fr.mesh)
    params = base.init_state(seed=0).params
    dm = FineTuningDataModule(jsonl_file, ByteTok(),
                              seq_length=fr.model.seq_length,
                              global_batch_size=gbs)
    module, state, metrics = fr.run(params, dm, max_steps=2)
    assert np.isfinite(float(metrics["loss"]))
    assert float(module.lr_schedule(1)) == pytest.approx(5e-6, rel=1e-6)
