"""PEFT: LoRA / DoRA for GPT models.

Reference parity: `nemo/collections/llm/peft/lora.py` (LoRALinear on
attention/MLP projections) + the PEFT callback machinery
(`lightning/pytorch/callbacks/peft.py`: freeze base model, train/save only
adapter weights, two-stage restore).

TPU-native formulation: adapters are held as a SEPARATE param tree; the
train step materializes effective kernels W + (α/r)·A·B on the fly inside
jit (XLA fuses the low-rank update into the matmul epilogue), gradients flow
only to A/B, and checkpoints contain only adapter weights
(adapter_key_filter equivalent).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from nemo_tpu.models.llm.config import GPTConfig
from nemo_tpu.models.llm.gpt import GPTModel
from nemo_tpu.models.llm.loss import masked_token_loss
from nemo_tpu.parallel.mesh import MeshConfig, make_mesh


@dataclasses.dataclass
class LoRA:
    """Reference parity: llm.peft.LoRA (target_modules default QKVO)."""

    target_modules: Sequence[str] = ("q_proj", "k_proj", "v_proj", "o_proj")
    dim: int = 32
    alpha: int = 64
    dropout: float = 0.0
    dora: bool = False  # DoRA: magnitude-normalized update (peft/dora.py)

    def build_module(self, cfg: GPTConfig, base_params, mesh_cfg: MeshConfig,
                     optimizer=None, lr_schedule=None):
        return LoRATrainModule(cfg, base_params, self, mesh_cfg,
                               optimizer=optimizer, lr_schedule=lr_schedule)


def _find_kernels(params: Dict, targets) -> Dict[str, Tuple]:
    """path-tuple → kernel array for every targeted projection."""
    found = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        else:
            if len(path) >= 2 and path[-1] == "kernel" and path[-2] in targets:
                found[path] = node

    walk(params, ())
    return found


def _set_in(tree, path, value):
    if len(path) == 1:
        return {**tree, path[0]: value}
    return {**tree, path[0]: _set_in(tree[path[0]], path[1:], value)}


class LoRATrainModule:
    """Duck-typed train module (Trainer protocol) training only adapters."""

    def __init__(self, cfg: GPTConfig, base_params, lora: LoRA, mesh_cfg: MeshConfig,
                 optimizer=None, lr_schedule=None):
        self.cfg = cfg
        self.lora = lora
        self.model = GPTModel(cfg)
        self.mesh = make_mesh(mesh_cfg)
        self.base_params = base_params
        self.targets = _find_kernels(base_params, set(lora.target_modules))
        if not self.targets:
            raise ValueError(f"no target modules {lora.target_modules} found")
        # recipe-provided schedule/optimizer (reference finetune_default.py:
        # LoRA lr 1e-4) — a FinetuneRecipe's lr/lr_schedule flows here
        self.lr_schedule = lr_schedule
        self.optimizer = optimizer or optax.adamw(lr_schedule or 1e-4)
        self._jit_step = jax.jit(self._step)

    # -- adapter params ------------------------------------------------------
    def init_adapters(self, seed: int = 0) -> Dict[str, Any]:
        rng = np.random.RandomState(seed)
        adapters = {}
        for path, kernel in self.targets.items():
            shape = kernel.shape
            # flatten all output dims; keep optional leading layer-stack axis
            if shape[0] == self.cfg.num_layers and len(shape) >= 3:
                L, d_in = shape[0], shape[1]
                d_out = int(np.prod(shape[2:]))
                a = rng.normal(0, 1.0 / self.lora.dim, (L, d_in, self.lora.dim))
                b = np.zeros((L, self.lora.dim, d_out))
            else:
                d_in = shape[0]
                d_out = int(np.prod(shape[1:]))
                a = rng.normal(0, 1.0 / self.lora.dim, (d_in, self.lora.dim))
                b = np.zeros((self.lora.dim, d_out))
            key = "/".join(path)
            adapters[key] = {
                "lora_a": jnp.asarray(a, jnp.float32),
                "lora_b": jnp.asarray(b, jnp.float32),
            }
            if self.lora.dora:
                # trainable per-output-channel magnitude, init ‖W‖ per column
                # (DoRA defines m over output channels; reference peft/dora.py)
                kf = np.asarray(kernel, np.float32).reshape(
                    a.shape[:-2] + (a.shape[-2], -1))
                adapters[key]["dora_m"] = jnp.asarray(
                    np.linalg.norm(kf, axis=-2, keepdims=True), jnp.float32)
        return adapters

    def merge(self, base_params, adapters):
        """Effective params: W + (α/r)·A·B (jit-inlined)."""
        scale = self.lora.alpha / self.lora.dim
        params = base_params
        for path, kernel in self.targets.items():
            ad = adapters["/".join(path)]
            a, b = ad["lora_a"], ad["lora_b"]
            delta = jnp.einsum("...ir,...ro->...io", a, b) * scale
            if self.lora.dora:
                # DoRA: W' = m · (W + ΔW) / ‖W + ΔW‖_col with the norm taken
                # per OUTPUT channel (over the input/contraction axis) and m
                # a trainable magnitude vector (reference peft/dora.py)
                kf = kernel.reshape(delta.shape).astype(jnp.float32)
                new_f = kf + delta
                col_norm = jnp.linalg.norm(new_f, axis=-2, keepdims=True)
                new_f = ad["dora_m"] * new_f / jnp.maximum(col_norm, 1e-6)
                new = new_f.reshape(kernel.shape).astype(kernel.dtype)
            else:
                new = kernel + delta.reshape(kernel.shape).astype(kernel.dtype)
            params = _set_in(params, path, new)
        return params

    # -- Trainer protocol ------------------------------------------------------
    def init_state(self):
        adapters = self.init_adapters()
        return {"step": jnp.zeros((), jnp.int32), "adapters": adapters,
                "opt_state": self.optimizer.init(adapters)}

    def _step(self, state, base_params, batch, rng):
        def loss_fn(adapters):
            params = self.merge(base_params, adapters)
            logits = self.model.apply({"params": params}, batch["tokens"],
                                      train=True, rngs={"dropout": rng})
            loss, _ = masked_token_loss(logits, batch["labels"], batch.get("loss_mask"))
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state["adapters"])
        updates, new_opt = self.optimizer.update(grads, state["opt_state"], state["adapters"])
        adapters = optax.apply_updates(state["adapters"], updates)
        return (
            {"step": state["step"] + 1, "adapters": adapters, "opt_state": new_opt},
            {"loss": loss, "grad_norm": optax.global_norm(grads)},
        )

    def train_step(self, state, batch, rng):
        return self._jit_step(state, self.base_params, batch, rng)

    def merged_params(self, state):
        """Export: bake adapters into base weights (reference: merge_lora)."""
        return jax.jit(self.merge)(self.base_params, state["adapters"])

    @property
    def num_adapter_weights(self) -> int:
        a = self.init_adapters()
        return sum(x.size for x in jax.tree.leaves(a))


@dataclasses.dataclass
class CanonicalLoRA(LoRA):
    """Canonical LoRA (reference `llm/peft/canonical_lora.py`): HF-PEFT-
    compatible semantics — each projection gets its OWN adapter pair (our
    q/k/v/o are already separate kernels, so the fused-qkv split the
    reference performs is structural here), with optional per-target rank
    overrides and HF PEFT state-dict export for interop.
    """

    dim_overrides: Optional[Dict[str, int]] = None  # module name → rank

    def build_module(self, cfg: GPTConfig, base_params, mesh_cfg: MeshConfig,
                     optimizer=None, lr_schedule=None):
        return CanonicalLoRATrainModule(cfg, base_params, self, mesh_cfg,
                                        optimizer=optimizer,
                                        lr_schedule=lr_schedule)


class CanonicalLoRATrainModule(LoRATrainModule):
    def _rank_of(self, path) -> int:
        ov = self.lora.dim_overrides or {}
        return int(ov.get(path[-2], self.lora.dim))

    def init_adapters(self, seed: int = 0) -> Dict[str, Any]:
        rng = np.random.RandomState(seed)
        adapters = {}
        for path, kernel in self.targets.items():
            r = self._rank_of(path)
            shape = kernel.shape
            if shape[0] == self.cfg.num_layers and len(shape) >= 3:
                L, d_in = shape[0], shape[1]
                d_out = int(np.prod(shape[2:]))
                a = rng.normal(0, 1.0 / r, (L, d_in, r))
                b = np.zeros((L, r, d_out))
            else:
                d_in = shape[0]
                d_out = int(np.prod(shape[1:]))
                a = rng.normal(0, 1.0 / r, (d_in, r))
                b = np.zeros((r, d_out))
            adapters["/".join(path)] = {
                "lora_a": jnp.asarray(a, jnp.float32),
                "lora_b": jnp.asarray(b, jnp.float32),
            }
        return adapters

    def merge(self, base_params, adapters):
        # per-target alpha/rank scaling (alpha scales with the rank override
        # so alpha/r stays the user-set ratio, HF PEFT convention)
        base_scale = self.lora.alpha / self.lora.dim
        params = base_params
        for path, kernel in self.targets.items():
            ad = adapters["/".join(path)]
            a, b = ad["lora_a"], ad["lora_b"]
            delta = jnp.einsum("...ir,...ro->...io", a, b) * base_scale
            params = _set_in(params, path,
                             kernel + delta.reshape(kernel.shape).astype(kernel.dtype))
        return params

    def export_hf_peft(self, adapters) -> Dict[str, np.ndarray]:
        """Adapter state dict in HF PEFT naming:
        base_model.model.model.layers.<i>.self_attn.<mod>.lora_A.weight
        ([r, d_in] torch layout) / lora_B.weight ([d_out, r]).
        Scan-stacked kernels are unstacked to per-layer entries."""
        hf_mod = {"q_proj": "self_attn.q_proj", "k_proj": "self_attn.k_proj",
                  "v_proj": "self_attn.v_proj", "o_proj": "self_attn.o_proj",
                  "gate_proj": "mlp.gate_proj", "up_proj": "mlp.up_proj",
                  "down_proj": "mlp.down_proj"}
        out = {}
        for path in self.targets:
            name = path[-2]
            ad = adapters["/".join(path)]
            a = np.asarray(ad["lora_a"], np.float32)
            b = np.asarray(ad["lora_b"], np.float32)
            mod = hf_mod.get(name, name)
            if a.ndim == 3:  # [L, d_in, r] scan-stacked
                for i in range(a.shape[0]):
                    pre = f"base_model.model.model.layers.{i}.{mod}"
                    out[f"{pre}.lora_A.weight"] = a[i].T.copy()
                    out[f"{pre}.lora_B.weight"] = b[i].T.copy()
            else:
                pre = f"base_model.model.model.{mod}"
                out[f"{pre}.lora_A.weight"] = a.T.copy()
                out[f"{pre}.lora_B.weight"] = b.T.copy()
        return out
