"""Train any HuggingFace Flax causal-LM through the nemo_tpu Trainer.

Reference parity: `nemo/collections/llm/gpt/model/hf_auto_model_for_causal_lm.py`
(HFAutoModelForCausalLM: wrap transformers AutoModel so the NeMo trainer can
fine-tune arbitrary hub architectures without a native port).

TPU-native: uses the transformers FLAX model classes (pure functional
params + apply), so the whole train step jits exactly like native models —
no torch bridge. Works with `core.trainer.Trainer` (init_state/train_step
protocol) and the same batch dicts as GPTTrainModule.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct


class HFStatePytree(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


class HFAutoModelForCausalLM:
    """Trainer-protocol module around a transformers Flax causal LM."""

    def __init__(
        self,
        model_name: Optional[str] = None,
        config: Optional[Any] = None,
        learning_rate: float = 2e-5,
        weight_decay: float = 0.0,
        grad_clip: float = 1.0,
        dtype: str = "float32",
        seed: int = 0,
    ):
        from transformers import FlaxAutoModelForCausalLM

        if model_name is not None:
            self.model = FlaxAutoModelForCausalLM.from_pretrained(
                model_name, dtype=getattr(jnp, dtype))
        elif config is not None:
            self.model = FlaxAutoModelForCausalLM.from_config(
                config, dtype=getattr(jnp, dtype), seed=seed)
        else:
            raise ValueError("need model_name or config")
        txs = [optax.clip_by_global_norm(grad_clip)]
        txs.append(optax.adamw(learning_rate, weight_decay=weight_decay))
        self.optimizer = optax.chain(*txs)
        self._jit_step = jax.jit(self._step, donate_argnums=(0,))

    # -- Trainer protocol ----------------------------------------------------
    def init_state(self, seed: int = 0) -> HFStatePytree:
        params = self.model.params
        return HFStatePytree(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.optimizer.init(params),
        )

    def _loss(self, params, batch, rng):
        tokens = batch["tokens"]
        labels = batch["labels"]
        mask = batch.get("loss_mask")
        attn = batch.get("attention_mask", jnp.ones_like(tokens))
        logits = self.model(
            input_ids=tokens, attention_mask=attn, params=params,
            dropout_rng=rng, train=True,
        ).logits
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(lp, labels[..., None], -1)[..., 0]
        if mask is None:
            mask = jnp.ones_like(nll)
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    def _step(self, state: HFStatePytree, batch, rng):
        loss, grads = jax.value_and_grad(self._loss)(state.params, batch, rng)
        updates, new_opt = self.optimizer.update(grads, state.opt_state,
                                                 state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            HFStatePytree(step=state.step + 1, params=params, opt_state=new_opt),
            {"loss": loss, "grad_norm": optax.global_norm(grads)},
        )

    def train_step(self, state, batch, rng):
        return self._jit_step(state, batch, rng)

    # -- convenience ---------------------------------------------------------
    def generate_greedy(self, state: HFStatePytree, tokens: jnp.ndarray,
                        max_new_tokens: int = 16) -> np.ndarray:
        """Tiny greedy loop via the model's full forward (no KV cache —
        convenience/sanity only; production decode uses the native engine)."""
        toks = np.asarray(tokens)
        for _ in range(max_new_tokens):
            logits = self.model(input_ids=jnp.asarray(toks),
                                params=state.params, train=False).logits
            nxt = np.asarray(jnp.argmax(logits[:, -1], -1))[:, None]
            toks = np.concatenate([toks, nxt], axis=1)
        return toks

    @property
    def num_weights(self) -> int:
        return sum(x.size for x in jax.tree.leaves(self.model.params))
