"""Finetuning datamodules: jsonl instruct/chat with prompt templates,
optional sequence packing.

Reference parity: FineTuningDataModule (`llm/gpt/data/fine_tuning.py` —
jsonl {input,output} or chat messages, prompt templates, loss-masked prompt
tokens, packed sequences), ChatDataModule (`gpt/data/chat.py` — multi-turn
messages through a chat template with per-turn answer masking),
SquadDataModule (`gpt/data/squad.py:138-141` "Context: … Question: …
Answer:" lines), DollyDataModule (`gpt/data/dolly.py:114-129` randomized
context/instruction order) and HFDatasetDataModule (`gpt/data/hf_dataset.py`
— arbitrary in-memory/`datasets` splits + a row→example mapping).
"""

from __future__ import annotations

import json
from typing import Dict, Iterator, List, Optional

import numpy as np

from nemo_tpu.data.packed_sequence import pack_batch


DEFAULT_PROMPT_TEMPLATE = "{input} {output}"


class FineTuningDataModule:
    def __init__(
        self,
        path: str,  # jsonl with {"input":..., "output":...}
        tokenizer,
        seq_length: int,
        global_batch_size: int,
        prompt_template: str = DEFAULT_PROMPT_TEMPLATE,
        packed: bool = False,
        answer_only_loss: bool = True,
        seed: int = 0,
    ):
        self.tokenizer = tokenizer
        self.seq_length = seq_length
        self.global_batch_size = global_batch_size
        self.micro_batch_size = None
        self.packed = packed
        self.answer_only_loss = answer_only_loss
        self.seed = seed
        self.examples = []
        with open(path) as f:
            for line in f:
                if line.strip():
                    self.examples.append(json.loads(line))
        self.prompt_template = prompt_template

    def _encode(self, ex: Dict) -> Optional[Dict[str, np.ndarray]]:
        prompt = self.prompt_template.split("{output}")[0].format(**ex).rstrip()
        full = self.prompt_template.format(**ex)
        p_ids = self.tokenizer.text_to_ids(prompt)
        f_ids = self.tokenizer.text_to_ids(full)
        eos = getattr(self.tokenizer, "eos_id", None)
        if eos is not None and eos >= 0:
            f_ids = f_ids + [eos]
        if len(f_ids) < 2:
            return None
        f_ids = f_ids[: self.seq_length + 1]
        tokens = np.asarray(f_ids[:-1], np.int32)
        labels = np.asarray(f_ids[1:], np.int32)
        mask = np.ones(len(tokens), np.float32)
        if self.answer_only_loss:
            # mask out loss on prompt positions (label index < len(p_ids)-1)
            n_prompt = max(len(p_ids) - 1, 0)
            mask[:n_prompt] = 0.0
        return {"tokens": tokens, "labels": labels, "loss_mask": mask}

    def train_batches(self, start_step: int = 0) -> Iterator[Dict]:
        import jax.numpy as jnp

        rng = np.random.RandomState(self.seed)
        step = 0
        while True:
            order = rng.permutation(len(self.examples))
            encs = [self._encode(self.examples[i]) for i in order]
            encs = [e for e in encs if e is not None]
            if self.packed:
                packed = pack_batch(
                    [e["tokens"] for e in encs],
                    [e["labels"] for e in encs],
                    [e["loss_mask"] for e in encs],
                    self.seq_length,
                )
                n = packed["tokens"].shape[0]
                for i in range(0, n - self.global_batch_size + 1, self.global_batch_size):
                    if step >= start_step:
                        yield {
                            k: jnp.asarray(v[i : i + self.global_batch_size])
                            for k, v in packed.items()
                        }
                    step += 1
            else:
                B = self.global_batch_size
                for i in range(0, len(encs) - B + 1, B):
                    group = encs[i : i + B]
                    tokens = np.zeros((B, self.seq_length), np.int32)
                    labels = np.zeros((B, self.seq_length), np.int32)
                    mask = np.zeros((B, self.seq_length), np.float32)
                    for b, e in enumerate(group):
                        L = min(len(e["tokens"]), self.seq_length)
                        tokens[b, :L] = e["tokens"][:L]
                        labels[b, :L] = e["labels"][:L]
                        mask[b, :L] = e["loss_mask"][:L]
                    if step >= start_step:
                        yield {
                            "tokens": jnp.asarray(tokens),
                            "labels": jnp.asarray(labels),
                            "loss_mask": jnp.asarray(mask),
                        }
                    step += 1

class ChatDataModule(FineTuningDataModule):
    """Multi-turn chat jsonl: {"messages": [{"role": ..., "content": ...},
    ...]} rendered through a PromptFormatter; only assistant-turn tokens
    carry loss (reference chat.py → GPTSFTChatDataset template masking)."""

    def __init__(self, path, tokenizer, seq_length, global_batch_size,
                 prompt_format: str = "chatml", **kw):
        from nemo_tpu.data.prompt_formatters import get_prompt_formatter

        super().__init__(path, tokenizer, seq_length, global_batch_size, **kw)
        self.formatter = get_prompt_formatter(prompt_format, tokenizer)

    def _encode(self, ex: Dict) -> Optional[Dict[str, np.ndarray]]:
        turns = [{"role": m["role"], "slots": {"message": m["content"]}}
                 for m in ex["messages"]]
        enc = self.formatter.encode_dialog(turns)
        ids, mask = enc["input_ids"], enc["mask"]
        if len(ids) < 2 or mask[1:].sum() == 0:
            return None
        ids = ids[: self.seq_length + 1]
        mask = mask[: self.seq_length + 1]
        return {
            "tokens": ids[:-1].astype(np.int32),
            "labels": ids[1:].astype(np.int32),
            # loss sits on positions whose LABEL is an answer token
            "loss_mask": mask[1:].astype(np.float32),
        }


class SquadDataModule(FineTuningDataModule):
    """SQuAD-schema jsonl ({"context","question","answers":{"text":[...]}})
    preprocessed to the reference's line format (squad.py:138-141)."""

    def __init__(self, path, tokenizer, seq_length, global_batch_size, **kw):
        super().__init__(path, tokenizer, seq_length, global_batch_size, **kw)
        converted = []
        for ex in self.examples:
            if "input" in ex and "output" in ex:  # already preprocessed
                converted.append(ex)
                continue
            answers = ex["answers"]["text"] if isinstance(ex.get("answers"), dict) \
                else ex.get("answers", [])
            if not answers:
                continue
            converted.append({
                "input": "Context: " + ex["context"] + " Question: "
                         + ex["question"] + " Answer:",
                "output": answers[0],
            })
        self.examples = converted


class DollyDataModule(FineTuningDataModule):
    """databricks-dolly-schema jsonl ({"instruction","context","response"})
    with the reference's randomized context/instruction order
    (dolly.py:114-129)."""

    def __init__(self, path, tokenizer, seq_length, global_batch_size, **kw):
        super().__init__(path, tokenizer, seq_length, global_batch_size, **kw)
        rng = np.random.RandomState(self.seed)
        converted = []
        for ex in self.examples:
            if "input" in ex and "output" in ex:
                converted.append(ex)
                continue
            instruction = ex["instruction"].strip()
            context = (ex.get("context") or "").strip()
            if context:
                _input = (f"{context}\n\n{instruction}" if rng.randint(2) == 0
                          else f"{instruction}\n\n{context}")
            else:
                _input = instruction
            converted.append({"input": _input, "output": ex["response"]})
        self.examples = converted


class HFDatasetDataModule(FineTuningDataModule):
    """Arbitrary in-memory rows (list of dicts, or a `datasets.Dataset`
    split if that library is importable) + a row→{"input","output"} mapping
    fn on the FineTuningDataModule batching/packing path (reference
    hf_dataset.py HFDatasetDataModule)."""

    def __init__(self, rows, tokenizer, seq_length, global_batch_size,
                 map_fn=None, **kw):
        import os
        import tempfile

        # route through the jsonl ctor with an empty file, then install rows
        with tempfile.NamedTemporaryFile("w", suffix=".jsonl",
                                         delete=False) as f:
            empty = f.name
        try:
            super().__init__(empty, tokenizer, seq_length, global_batch_size,
                             **kw)
        finally:
            os.unlink(empty)
        rows = list(rows)
        if map_fn is not None:
            rows = [map_fn(r) for r in rows]
        self.examples = [r for r in rows
                         if r and "input" in r and "output" in r]
