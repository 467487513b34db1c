"""NeVA/LLaVA training: Trainer-protocol module + finetune/pretrain recipes.

Reference parity: `nemo/collections/vlm/recipes/neva_llama3_8b.py` and
`vlm/neva/model/base.py` (freeze_language_model/freeze_vision_model stages:
stage-1 'pretrain' trains the projector only; stage-2 'finetune' unfreezes
the LLM). TPU-first: one jitted step; freezing is an optax mask (frozen
subtrees get zero updates — same params tree, no module surgery)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

import flax.linen as nn

from nemo_tpu.models.vlm.neva import NevaConfig, NevaModel


def build_vlm_model(cfg):
    """Config type → model (NeVA / Gemma3-VL / Llama4-omni share the
    (images, tokens, loss_mask) → loss training contract)."""
    from nemo_tpu.models.vlm.gemma3vl import Gemma3VLConfig, Gemma3VLModel
    from nemo_tpu.models.vlm.llama4vl import Llama4VLConfig, Llama4VLModel

    if isinstance(cfg, Gemma3VLConfig):
        return Gemma3VLModel(cfg)
    if isinstance(cfg, Llama4VLConfig):
        return Llama4VLModel(cfg)
    return NevaModel(cfg)


class VLMTrainModule:
    """batch: {"images" [B,S,S,3], "tokens" [B,L] (image placeholders
    included), "loss_mask" [B,L]} → model.loss (NeVA, Gemma3-VL or
    Llama4-omni — see build_vlm_model).

    freeze: any of {"vision", "language", "projector"} — reference
    neva/model/base.py NevaModel freeze_* config (stage-1 trains the
    projector with both towers frozen)."""

    def __init__(self, cfg, lr_schedule=None,
                 freeze: tuple = ("vision",), image_size: int = 336):
        self.cfg = cfg
        self.model = build_vlm_model(cfg)
        self.image_size = image_size
        sched = lr_schedule or (lambda step: 2e-5)
        base = optax.chain(optax.clip_by_global_norm(1.0),
                           optax.adamw(sched, b1=0.9, b2=0.95,
                                       weight_decay=0.1))

        def label(params):
            def lab(path):
                top = path[0]
                if top == "vision":
                    return "vision"
                if top == "llm":
                    return "language"
                return "projector"

            return jax.tree_util.tree_map_with_path(
                lambda p, _: lab([k.key for k in p]), params)

        # ONE clip+adamw chain masked to the trainable subset (clip stays
        # GLOBAL over all trainable params — per-group chains would clip
        # each unfrozen tower independently, different dynamics from the
        # reference's single global clip), plus set_to_zero on the frozen
        # subset. optax.masked keeps optimizer state ONLY for trainable
        # leaves — frozen towers cost no Adam-moment HBM (stage-1 trains
        # a few-M-param projector under a multi-B frozen LLM).
        def trainable_mask(params):
            lbl = label(params)
            return jax.tree.map(lambda g: g not in freeze, lbl)

        def frozen_mask(params):
            lbl = label(params)
            return jax.tree.map(lambda g: g in freeze, lbl)

        self.optimizer = optax.chain(
            optax.masked(base, trainable_mask),
            optax.masked(optax.set_to_zero(), frozen_mask))
        self._jit = None

    def init_state(self, seed: int = 0):
        from nemo_tpu.models.llm.train import TrainState

        S = self.image_size
        images = jnp.zeros((1, S, S, 3), jnp.float32)
        tokens = jnp.zeros((1, 8), jnp.int32)
        params = nn.meta.unbox(self.model.init(
            jax.random.PRNGKey(seed), images, tokens)["params"])
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=self.optimizer.init(params))

    def train_step(self, state, batch, rng=None):
        from nemo_tpu.models.llm.train import TrainState

        if self._jit is None:
            opt, model = self.optimizer, self.model

            def step(state, batch, rng):
                def lf(p):
                    return model.apply(
                        {"params": p}, batch["images"], batch["tokens"],
                        batch["loss_mask"], method=type(model).loss,
                        rngs={"dropout": rng})

                loss, grads = jax.value_and_grad(lf)(state.params)
                updates, new_opt = opt.update(grads, state.opt_state,
                                              state.params)
                params = optax.apply_updates(state.params, updates)
                return (TrainState(step=state.step + 1, params=params,
                                   opt_state=new_opt),
                        {"loss": loss,
                         "grad_norm": optax.global_norm(grads)})

            self._jit = jax.jit(step, donate_argnums=(0,))
        if rng is None:
            rng = jax.random.PRNGKey(int(state.step))
        return self._jit(state, batch, rng)
