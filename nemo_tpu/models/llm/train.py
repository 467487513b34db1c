"""Sharded pretrain/finetune step for GPT models.

Reference parity: the MegatronStrategy/MegatronParallel hot loop
(SURVEY.md §3.1): microbatch loop × forward/backward × DDP grad reduce ×
distributed-optimizer step. TPU-native shape:
- one `jit`-compiled train step over the mesh; grad accumulation is a
  `lax.scan` over microbatches INSIDE the step (the pipeline-schedule
  equivalent — no host round-trips between microbatches);
- optimizer state inherits param shardings (distributed-optimizer/ZeRO
  equivalent falls out of GSPMD + fsdp axis);
- grad clipping + LR schedule inside the step.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import unfreeze
import flax.linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nemo_tpu.models.llm.config import GPTConfig
from nemo_tpu.models.llm.gpt import GPTModel
from nemo_tpu.models.llm.loss import masked_token_loss
from nemo_tpu.parallel.mesh import MeshConfig, default_axis_rules, make_mesh


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


@dataclasses.dataclass
class GPTTrainModule:
    """Owns model + optimizer + mesh; builds the jitted sharded train step.

    batch dict: {"tokens": [B,S], "labels": [B,S], "loss_mask": [B,S]} with
    B = global_batch // num_microbatches, or [A, B_micro, S] with a leading
    accumulation axis for in-step microbatching.
    """

    cfg: GPTConfig
    mesh_cfg: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    optimizer: Optional[optax.GradientTransformation] = None
    lr_schedule: Optional[Callable] = None
    mesh: Optional[Mesh] = None

    def __post_init__(self):
        self.model = GPTModel(self.cfg)
        if self.mesh is None:
            self.mesh = make_mesh(self.mesh_cfg)
        self.rules = default_axis_rules()
        if self.optimizer is None:
            sched = self.lr_schedule or (lambda step: 3e-4)
            self.optimizer = optax.chain(
                optax.clip_by_global_norm(1.0),
                optax.adamw(sched, b1=0.9, b2=0.95, eps=1e-8, weight_decay=0.1),
            )
        self._build()

    # -- init ---------------------------------------------------------------
    def _abstract_state(self):
        tokens = jnp.zeros((1, self.cfg.seq_length), jnp.int32)

        def init_fn(rng):
            variables = self.model.init(rng, tokens)
            params = variables["params"]  # boxed with logical-axis metadata
            opt_state = self.optimizer.init(nn.meta.unbox(params))
            return TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=opt_state)

        return jax.eval_shape(init_fn, jax.random.PRNGKey(0))

    def abstract_state(self):
        """Unboxed abstract TrainState (for checkpoint restore targets)."""
        return jax.tree.map(
            lambda x: x, nn.meta.unbox(self._abstract_state())
        )

    def state_shardings(self):
        abstract = self._abstract_state()
        specs = nn.get_partition_spec(abstract)
        return nn.logical_to_mesh_sharding(specs, self.mesh, self.rules)

    def init_state(self, seed: int = 0) -> TrainState:
        shardings = self.state_shardings()
        tokens = jnp.zeros((1, self.cfg.seq_length), jnp.int32)

        def init_fn(rng):
            variables = self.model.init(rng, tokens)
            params = nn.meta.unbox(variables["params"])
            opt_state = self.optimizer.init(params)
            return TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=opt_state)

        with jax.set_mesh(self.mesh):
            init_jit = jax.jit(init_fn, out_shardings=shardings)
            return init_jit(jax.random.PRNGKey(seed))

    # -- step ---------------------------------------------------------------
    def _build(self):
        mesh = self.mesh
        model, optimizer = self.model, self.optimizer
        rules = self.rules

        def loss_fn(params, batch, rng):
            logits = model.apply(
                {"params": params}, batch["tokens"],
                batch.get("positions"),
                segment_ids=batch.get("segment_ids"),
                train=True, rngs={"dropout": rng},
            )
            loss, n = masked_token_loss(logits, batch["labels"], batch.get("loss_mask"))
            return loss, n

        def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng) -> Tuple[TrainState, Dict]:
            if batch["tokens"].ndim == 3:  # [A, B, S] microbatch accumulation
                def micro(carry, mb):
                    acc_grads, acc_loss = carry
                    (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                        state.params, mb, rng
                    )
                    return (jax.tree.map(jnp.add, acc_grads, grads), acc_loss + loss), None

                zero = jax.tree.map(jnp.zeros_like, state.params)
                (grads, loss_sum), _ = jax.lax.scan(micro, (zero, 0.0), batch)
                A = batch["tokens"].shape[0]
                grads = jax.tree.map(lambda g: g / A, grads)
                loss = loss_sum / A
            else:
                (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, batch, rng
                )
            updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            gnorm = optax.global_norm(grads)
            metrics = {"loss": loss, "grad_norm": gnorm, "step": state.step}
            return TrainState(step=state.step + 1, params=new_params, opt_state=new_opt), metrics

        shardings = None  # resolved lazily at first call

        def jitted(state, batch, rng):
            return train_step(state, batch, rng)

        self._train_step_fn = train_step
        self._jit_cache = None

    def train_step_jit(self):
        if self._jit_cache is None:
            shardings = self.state_shardings()
            batch_spec = NamedSharding(self.mesh, P(("dp", "fsdp")))
            rep = NamedSharding(self.mesh, P())

            def bspec(x):
                # shard dim 0 for 2-D [B,S]; dim 1 for [A,B,S] microbatched
                if x.ndim == 3:
                    return NamedSharding(self.mesh, P(None, ("dp", "fsdp")))
                return batch_spec

            with jax.set_mesh(self.mesh):
                self._jit_cache = jax.jit(
                    self._train_step_fn,
                    in_shardings=(shardings, None, rep),
                    out_shardings=(shardings, None),
                    donate_argnums=(0,),
                )
        return self._jit_cache

    def train_step(self, state, batch, rng):
        step = self.train_step_jit()
        with jax.set_mesh(self.mesh):
            return step(state, batch, rng)
