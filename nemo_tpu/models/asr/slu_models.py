"""SLU: end-to-end spoken language understanding (intent + slots).

Reference parity: `nemo/collections/asr/models/slu_models.py`
(SLUIntentSlotBPEModel: ASR encoder + transformer decoder generating a
flat semantics string, e.g. SLURP). Built on the same AED stack as the
Canary multitask model — SLU is a generation task with a semantics
serialization, so the encoder/decoder/beam machinery is shared and only
the task prompt + the semantics (de)serialization differ.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.models.asr.aed_models import EncDecMultiTaskModel


def format_semantics(intent: str, slots: Dict[str, str]) -> str:
    """SLURP-style flat serialization (reference slu_models target format):
    `intent:<name> (key=value, …)`."""
    parts = [f"intent:{intent}"]
    if slots:
        inner = ", ".join(f"{k}={v}" for k, v in slots.items())
        parts.append(f"({inner})")
    return " ".join(parts)


_SEM_RE = re.compile(r"intent:([^\s(]+)\s*(?:\((.*)\))?")


def parse_semantics(text: str) -> Tuple[Optional[str], Dict[str, str]]:
    m = _SEM_RE.search(text)
    if not m:
        return None, {}
    intent = m.group(1)
    slots: Dict[str, str] = {}
    if m.group(2):
        for pair in m.group(2).split(","):
            if "=" in pair:
                k, v = pair.split("=", 1)
                slots[k.strip()] = v.strip()
    return intent, slots


class SLUIntentSlotModel(EncDecMultiTaskModel):
    """AED model specialized for semantics generation.

    Config adds nothing over the multitask model except that "slu" is
    guaranteed in the prompt task set; targets during training are
    `format_semantics(...)` strings through the standard AED loss.
    """

    def __init__(self, cfg: ConfigDict, init_params: bool = True):
        cfg = ConfigDict(cfg)
        pf = ConfigDict(cfg.get("prompt_format", ConfigDict()))
        tasks = list(pf.get("tasks", ["transcribe"]))
        if "slu" not in tasks:
            tasks.append("slu")
        pf["tasks"] = tasks
        cfg["prompt_format"] = pf
        super().__init__(cfg, init_params=init_params)

    def semantics_to_ids(self, intent: str, slots: Dict[str, str]) -> List[int]:
        return self.text_to_ids(format_semantics(intent, slots))

    def predict(
        self,
        audio: Sequence[Union[str, np.ndarray]],
        batch_size: int = 4,
        max_len: int = 96,
    ) -> List[Dict]:
        """audio → [{'intent', 'slots', 'raw'}] (reference predict path)."""
        texts = self.transcribe(audio, batch_size=batch_size, task="slu",
                                max_len=max_len)
        out = []
        for t in texts:
            intent, slots = parse_semantics(t)
            out.append({"intent": intent, "slots": slots, "raw": t})
        return out
