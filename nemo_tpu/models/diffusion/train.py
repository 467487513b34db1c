"""Diffusion training: Trainer-protocol module (DiT + EDM loss) + mock
latent data module.

Reference parity: `nemo/collections/diffusion/train.py` /
`diffusion/models/dit_llama` training scripts (DiT trained with the EDM
objective over VAE latents, class- or text-conditioned). Batch contract:
{"latents" [B,H,W,C], optional "labels" [B]}."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

import flax.linen as nn

from nemo_tpu.models.diffusion.dit import DiT, DiTConfig
from nemo_tpu.models.diffusion.edm import edm_loss


class DiffusionTrainModule:
    """EDM-objective DiT training (Trainer protocol)."""

    def __init__(self, cfg: DiTConfig, lr_schedule=None,
                 sigma_data: float = 0.5):
        self.cfg = cfg
        self.model = DiT(cfg)
        self.sigma_data = sigma_data
        sched = lr_schedule or (lambda step: 1e-4)
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(1.0), optax.adamw(sched))
        self._jit = None

    def init_state(self, seed: int = 0):
        from nemo_tpu.models.llm.train import TrainState

        S, C = self.cfg.input_size, self.cfg.in_channels
        x = jnp.zeros((1, S, S, C), jnp.float32)
        t = jnp.zeros((1,), jnp.float32)
        y = (jnp.zeros((1,), jnp.int32) if self.cfg.num_classes else None)
        params = nn.meta.unbox(self.model.init(
            jax.random.PRNGKey(seed), x, t, y)["params"])
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=self.optimizer.init(params))

    def train_step(self, state, batch, rng=None):
        from nemo_tpu.models.llm.train import TrainState

        if self._jit is None:
            opt, model, sd = self.optimizer, self.model, self.sigma_data

            def step(state, batch, rng):
                def lf(p):
                    def net(x, c_noise, **kw):
                        # edm_precond already passes c_noise = log(σ)/4 —
                        # feed it straight to DiT as the timestep signal
                        return model.apply({"params": p}, x, c_noise,
                                           batch.get("labels"))

                    return edm_loss(net, rng, batch["latents"],
                                    sigma_data=sd)

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


class MockLatentDataModule:
    """Random VAE-latent batches (the diffusion mock-data analog)."""

    def __init__(self, input_size: int = 32, in_channels: int = 4,
                 global_batch_size: int = 4, num_classes: int = 0,
                 seed: int = 0):
        self.input_size = input_size
        self.in_channels = in_channels
        self.global_batch_size = global_batch_size
        self.num_classes = num_classes
        self.seed = seed
        self.micro_batch_size = None

    def train_batches(self, start_step: int = 0):
        rng = np.random.RandomState(self.seed + start_step)
        B, S, C = (self.global_batch_size, self.input_size, self.in_channels)
        while True:
            batch = {"latents": jnp.asarray(
                rng.randn(B, S, S, C).astype(np.float32))}
            if self.num_classes:
                batch["labels"] = jnp.asarray(
                    rng.randint(0, self.num_classes, B).astype(np.int32))
            yield batch
