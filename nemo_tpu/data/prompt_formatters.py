"""Prompt formatter registry: dialog turns → token ids + training mask.

Reference parity: `nemo/collections/common/prompts/` — a PromptFormatter
base with per-model template registries (formatter.py: NAME-keyed
registry, role templates with |slot| placeholders, `encode_dialog`
returning input_ids + answer-only mask) and the concrete llama2/llama3/
chatml/gemma/canary formats.

Design: templates are plain per-role f-string-ish patterns with |slots|;
`encode_dialog` concatenates per-turn token ids and builds the
answer-token mask the fine-tuning loss consumes (`data/fine_tuning.py`).
Pure host-side preprocessing — nothing here touches the device.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Type

import numpy as np

_REGISTRY: Dict[str, Type["PromptFormatter"]] = {}


class PromptFormatter:
    """Subclass with NAME and TEMPLATE = {role: {"template": str,
    "slots": (...)}}; '|slot|' placeholders are substituted. The
    OUTPUT_ROLE's tokens (and only those) get mask=1."""

    NAME: str = ""
    OUTPUT_ROLE: str = "assistant"
    TEMPLATE: Dict[str, Dict] = {}
    INSERT_BOS: bool = False
    INSERT_EOS_AFTER_OUTPUT: bool = True

    def __init__(self, tokenizer):
        self.tokenizer = tokenizer

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)
        if cls.NAME:
            _REGISTRY[cls.NAME] = cls

    @classmethod
    def resolve(cls, name: str) -> Type["PromptFormatter"]:
        if name not in _REGISTRY:
            raise KeyError(
                f"unknown prompt format '{name}' (have {sorted(_REGISTRY)})")
        return _REGISTRY[name]

    def format_turn(self, role: str, slots: Dict[str, str]) -> str:
        spec = self.TEMPLATE[role]
        out = spec["template"]
        for s in spec.get("slots", ("message",)):
            out = out.replace(f"|{s}|", slots.get(s, ""))
        return out

    def encode_turn(self, role: str, slots: Dict[str, str]) -> List[int]:
        return list(self.tokenizer.text_to_ids(self.format_turn(role, slots)))

    def encode_dialog(self, turns: Sequence[Dict]) -> Dict[str, np.ndarray]:
        """turns: [{"role": ..., "slots": {...}}, ...] → input_ids [S],
        mask [S] (1 on OUTPUT_ROLE tokens — the training targets)."""
        ids: List[int] = []
        mask: List[int] = []
        if self.INSERT_BOS and getattr(self.tokenizer, "bos_id", None) is not None:
            ids.append(self.tokenizer.bos_id)
            mask.append(0)
        for turn in turns:
            role = turn["role"]
            t_ids = self.encode_turn(role, turn.get("slots", {}))
            is_out = role == self.OUTPUT_ROLE
            ids.extend(t_ids)
            mask.extend([1 if is_out else 0] * len(t_ids))
            if (is_out and self.INSERT_EOS_AFTER_OUTPUT
                    and getattr(self.tokenizer, "eos_id", None) is not None):
                ids.append(self.tokenizer.eos_id)
                mask.append(1)
        return {
            "input_ids": np.asarray(ids, np.int32),
            "mask": np.asarray(mask, np.float32),
        }


class ChatMLFormatter(PromptFormatter):
    NAME = "chatml"
    TEMPLATE = {
        "system": {"template": "<|im_start|>system\n|message|<|im_end|>\n"},
        "user": {"template": "<|im_start|>user\n|message|<|im_end|>\n"},
        "assistant": {
            "template": "<|im_start|>assistant\n|message|<|im_end|>\n"},
    }


class Llama2Formatter(PromptFormatter):
    NAME = "llama2"
    INSERT_BOS = True
    TEMPLATE = {
        "system_and_user": {
            "template": "[INST] <<SYS>>\n|system|\n<</SYS>>\n\n|message| [/INST]",
            "slots": ("system", "message")},
        "user": {"template": "[INST] |message| [/INST]"},
        "assistant": {"template": " |message|"},
    }


class Llama3Formatter(PromptFormatter):
    NAME = "llama3"
    INSERT_BOS = True
    TEMPLATE = {
        "system": {"template": "<|start_header_id|>system<|end_header_id|>"
                               "\n\n|message|<|eot_id|>"},
        "user": {"template": "<|start_header_id|>user<|end_header_id|>"
                             "\n\n|message|<|eot_id|>"},
        "assistant": {"template": "<|start_header_id|>assistant"
                                  "<|end_header_id|>\n\n|message|<|eot_id|>"},
    }


class GemmaFormatter(PromptFormatter):
    NAME = "gemma"
    OUTPUT_ROLE = "model"
    TEMPLATE = {
        "user": {"template": "<start_of_turn>user\n|message|<end_of_turn>\n"},
        "model": {"template": "<start_of_turn>model\n|message|<end_of_turn>\n"},
    }


class MistralFormatter(PromptFormatter):
    NAME = "mistral"
    INSERT_BOS = True
    TEMPLATE = {
        "user": {"template": "[INST] |message|[/INST]"},
        "assistant": {"template": " |message|"},
    }


class PlainFormatter(PromptFormatter):
    """Bare completion format (no chat markup)."""

    NAME = "plain"
    TEMPLATE = {
        "user": {"template": "|message|"},
        "assistant": {"template": "|message|"},
    }


class CanaryPromptFormatter(PromptFormatter):
    """Canary AED prompt (common/prompts/canary.py): the decoder prompt is
    the special-token schema <|startoftranscript|><|lang|><|task|>…; slots
    carry the language/task special tokens verbatim."""

    NAME = "canary"
    OUTPUT_ROLE = "assistant"
    INSERT_EOS_AFTER_OUTPUT = True
    TEMPLATE = {
        "user": {
            "template": "<|startoftranscript|>|source_lang||task|"
                        "|target_lang||pnc|",
            "slots": ("source_lang", "task", "target_lang", "pnc")},
        "assistant": {"template": "|message|"},
    }


def get_prompt_formatter(name: str, tokenizer) -> PromptFormatter:
    return PromptFormatter.resolve(name)(tokenizer)
