"""Generic adapter framework: wildcard module targeting + PEFT over any model.

Reference parity: `nemo/core/classes/mixins/adapter_mixins.py` (adapter
injection into arbitrary modules by name) and
`nemo/collections/llm/peft/module_matcher.py` (wildcard target matching).

TPU-native stance: models are pure functions of a variables tree, so the
generic mechanism operates on the TREE, not on module objects —
1. `match_params(variables, patterns)` finds kernels by fnmatch-style
   wildcard paths ("*/attn/*/kernel", "*ff1*");
2. `GenericLoRA` attaches low-rank deltas to every matched kernel and
   merges them functionally (W + B·A·α/r) inside the jitted step — works
   for ANY collection (ASR encoders, TTS nets), no model cooperation;
3. `freeze_mask(variables, trainable_pred)` builds the optax mask that
   trains adapters with the base frozen (the PEFT-callback analog).

Structural (houlsby) adapters need an insertion point, which modules
expose via config (e.g. `ConformerEncoder(adapter_dim=...)`); this file
provides the shared freeze/merge machinery for both styles.
"""

from __future__ import annotations

import dataclasses
from fnmatch import fnmatch
from typing import Any, Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import traverse_util


def _flat(variables) -> Dict[Tuple[str, ...], Any]:
    return traverse_util.flatten_dict(variables)


def match_params(variables, patterns: Sequence[str],
                 leaf: str = "kernel") -> List[Tuple[str, ...]]:
    """Paths of `leaf` params whose '/'-joined path matches ANY wildcard
    pattern (reference module_matcher semantics: a bare name matches that
    module anywhere in the tree)."""
    out = []
    for path in _flat(variables):
        if path[-1] != leaf:
            continue
        s = "/".join(path)
        for pat in patterns:
            p = pat if any(c in pat for c in "*?[") else f"*{pat}*"
            if fnmatch(s, p):
                out.append(path)
                break
    return out


@dataclasses.dataclass
class GenericLoRA:
    """LoRA over arbitrary matched kernels of ANY flax variables tree."""

    targets: Sequence[str] = ("attn/q", "attn/v")
    dim: int = 8
    alpha: int = 16

    def init(self, variables, seed: int = 0) -> Dict[str, Dict[str, jnp.ndarray]]:
        """Adapter tree {joined_path: {lora_a, lora_b}} for matched 2-D+
        kernels (trailing dim = out features, rest flattened as in)."""
        paths = match_params(variables, self.targets)
        if not paths:
            raise ValueError(f"no kernels match {self.targets}")
        rng = np.random.RandomState(seed)
        adapters = {}
        for path in paths:
            k = _flat(variables)[path]
            d_out = k.shape[-1]
            d_in = int(np.prod(k.shape[:-1]))
            a = rng.normal(0, 1.0 / np.sqrt(d_in), (d_in, self.dim))
            adapters["/".join(path)] = {
                "lora_a": jnp.asarray(a, jnp.float32),
                "lora_b": jnp.zeros((self.dim, d_out), jnp.float32),
            }
        return adapters

    def merge(self, variables, adapters):
        """Functional W + (α/r)·A·B for every adapter (identity at init —
        lora_b starts at zero). Call inside the jitted step; XLA fuses."""
        flat = dict(_flat(variables))
        scale = self.alpha / self.dim
        for joined, ad in adapters.items():
            path = tuple(joined.split("/"))
            k = flat[path]
            delta = (ad["lora_a"] @ ad["lora_b"]) * scale
            flat[path] = k + delta.reshape(k.shape).astype(k.dtype)
        return traverse_util.unflatten_dict(flat)


def freeze_mask(variables, trainable_pred: Callable[[str], bool]):
    """Pytree of bools matching `variables`: True where trainable.
    Use with `optax.masked` / `multi_transform` (PEFT frozen-base)."""
    return traverse_util.unflatten_dict({
        p: bool(trainable_pred("/".join(p))) for p in _flat(variables)
    })


def frozen_base_optimizer(variables, lr: float,
                          trainable_pred: Callable[[str], bool]):
    """adamw that updates ONLY params passing `trainable_pred`; everything
    else is frozen exactly (zero update, no optimizer state drift)."""
    mask = freeze_mask(variables, trainable_pred)
    return optax.multi_transform(
        {"train": optax.adamw(lr), "freeze": optax.set_to_zero()},
        jax.tree.map(lambda t: "train" if t else "freeze", mask),
    )


def adapter_trainable(path: str) -> bool:
    """Default predicate: houlsby (`adapter_*`) and LoRA params train."""
    return "adapter" in path or "lora" in path
