"""Trainer: jitted step fn + python loop + callback bus + checkpoint/resume.

Reference parity: the NeMo 2.0 training loop (SURVEY.md §3.1 —
MegatronStrategy.training_step / optimizer step / logging / ModelCheckpoint)
collapsed into its TPU-native shape: the module owns ONE jit-compiled
sharded train step (microbatching inside), the Trainer is a thin host loop
driving callbacks, logging, validation, checkpointing and resume.

Module protocol (duck-typed; GPTTrainModule satisfies it):
  init_state() -> state
  train_step(state, batch, rng) -> (state, metrics)
  [optional] eval_step(state, batch) -> metrics
  [optional] state_shardings() / _abstract_state()
DataModule protocol:
  train_batches(start_step) -> iterator of batches
  [optional] val_batches() -> iterator
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Iterable, List, Optional

import jax
import numpy as np

from nemo_tpu.core.callbacks import Callback, ProgressPrinter, TimingCallback
from nemo_tpu.core.checkpoint import AutoResume, CheckpointIO
from nemo_tpu.utils.logging import logging


class Trainer:
    def __init__(
        self,
        max_steps: int,
        callbacks: Optional[List[Callback]] = None,
        ckpt_io: Optional[CheckpointIO] = None,
        ckpt_every: int = 1000,
        val_every: int = 0,
        resume: Optional[AutoResume] = None,
        logger: Optional[Any] = None,  # exp_manager MetricsLogger
        seed: int = 0,
    ):
        self.max_steps = max_steps
        self.callbacks = callbacks if callbacks is not None else [TimingCallback(), ProgressPrinter()]
        self.ckpt_io = ckpt_io
        self.ckpt_every = ckpt_every
        self.val_every = val_every
        self.resume = resume
        self.logger = logger
        self.seed = seed
        self.should_stop = False
        self.module = None
        self.state = None
        self.global_step = 0
        self._last_metrics: Dict[str, Any] = {}

    # ------------------------------------------------------------------
    def _emit(self, event: str, *args):
        for cb in self.callbacks:
            getattr(cb, event)(self, *args)

    def save_checkpoint(self, step: int):
        if self.ckpt_io is None:
            return
        context = getattr(self.module, "context", None)
        if callable(context):
            context = context()
        path = self.ckpt_io.save(
            self.state, step, context=context, metrics=self._last_metrics
        )
        self._emit("on_checkpoint", step, path)

    # ------------------------------------------------------------------
    def fit(self, module, datamodule, initial_state=None) -> Dict[str, Any]:
        """`initial_state` seeds the loop with pre-built state (finetuning
        from imported weights); an AutoResume restore still wins over it."""
        self.module = module
        start_step = 0
        self.state = None

        if self.resume is not None and self.ckpt_io is not None:
            if hasattr(module, "abstract_state"):
                abstract = module.abstract_state()
            else:
                abstract = jax.eval_shape(lambda: module.init_state())
            restored, step = self.resume.setup(self.ckpt_io, abstract)
            if restored is not None:
                self.state = restored
                start_step = int(step)
        if self.state is None:
            self.state = initial_state if initial_state is not None else module.init_state()

        rng = jax.random.PRNGKey(self.seed)
        self._emit("on_train_start")
        metrics: Dict[str, Any] = {}
        batches = datamodule.train_batches(start_step)
        for step in range(start_step, self.max_steps):
            self.global_step = step
            try:
                batch = next(batches)
            except StopIteration:
                logging.info("datamodule exhausted — stopping")
                break
            self._emit("on_step_start", step)
            rng, sub = jax.random.split(rng)
            self.state, metrics = module.train_step(self.state, batch, sub)
            metrics = dict(metrics)
            self._last_metrics = {
                k: v for k, v in metrics.items() if k in ("loss", "grad_norm")
            }
            self._emit("on_step_end", step, metrics)
            if self.logger is not None:
                self.logger.log(step, metrics)

            if self.val_every and (step + 1) % self.val_every == 0 and hasattr(module, "eval_step"):
                vals = []
                for vb in datamodule.val_batches():
                    vals.append(module.eval_step(self.state, vb))
                if vals:
                    vm = {k: float(np.mean([float(v[k]) for v in vals])) for k in vals[0]}
                    self._emit("on_validation", step, vm)
                    if self.logger is not None:
                        self.logger.log(step, {f"val_{k}": v for k, v in vm.items()})

            if self.ckpt_every and (step + 1) % self.ckpt_every == 0:
                self.save_checkpoint(step + 1)
            if self.should_stop:
                break

        if self.ckpt_io is not None:
            self.save_checkpoint(self.global_step + 1)
            self.ckpt_io.wait()
        self._emit("on_train_end")
        return metrics
