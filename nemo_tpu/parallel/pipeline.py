"""Pipeline parallelism: GPipe-schedule training over a 'pp' mesh axis.

Reference parity: MegatronParallel's pipeline schedules
(`nemo/lightning/megatron_parallel.py:1411-1436` — 1F1B / interleaved
forward-backward over PP process groups with p2p sends).

TPU-native design (this is NOT a port of the NCCL p2p machinery):
- the layer stack's leading 'layers' axis is sharded over 'pp', so each
  stage holds a contiguous slab of layers — no per-stage modules;
- the schedule is ONE `lax.scan` over T = n_micro + pp − 1 ticks inside a
  partial-manual `shard_map(axis_names={'pp'})`: every tick runs the
  stage body on its current activation and hands it to the next stage
  with `lax.ppermute` (the ICI p2p analog). Remaining mesh axes
  (dp/fsdp/tp/cp) stay in GSPMD auto mode, so pipeline composes with
  tensor/data sharding the usual way;
- backward is `jax.grad` straight through the scan+ppermute (the
  transpose of a permute is the reverse permute) with per-tick remat —
  a GPipe schedule: same bubble fraction (pp−1)/T as 1F1B; 1F1B's
  advantage is peak-memory, which remat of the stage body recovers;
- embedding and the LM head/loss run OUTSIDE the pipeline in ordinary
  GSPMD (they are batch/vocab-sharded, not stage-local).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nemo_tpu.models.llm.config import GPTConfig
from nemo_tpu.models.llm.gpt import GPTModel, TransformerLayer
from nemo_tpu.models.llm.loss import fused_linear_cross_entropy, masked_token_loss
from nemo_tpu.models.llm.train import TrainState
from nemo_tpu.parallel.mesh import MeshConfig, default_axis_rules, make_mesh


@dataclasses.dataclass
class PipelinedGPTModule:
    """GPT train module with pipeline parallelism (drop-in for
    GPTTrainModule where mesh_cfg.pp > 1). Batches must carry a leading
    microbatch axis: tokens [n_micro, B_mb, S]."""

    cfg: GPTConfig
    mesh_cfg: MeshConfig = dataclasses.field(default_factory=lambda: MeshConfig(pp=2))
    optimizer: Optional[optax.GradientTransformation] = None
    mesh: Optional[Mesh] = None

    def __post_init__(self):
        if self.mesh is None:
            self.mesh = make_mesh(self.mesh_cfg)
        self.pp = self.mesh.shape["pp"]
        if self.cfg.num_layers % self.pp:
            raise ValueError(f"num_layers {self.cfg.num_layers} % pp {self.pp} != 0")
        if not self.cfg.scan_layers:
            raise ValueError("pipeline needs scan_layers=True (stacked layer params)")
        if self.cfg.hidden_dropout or self.cfg.attention_dropout:
            raise ValueError("pipeline v0 supports dropout=0 only")
        self.model = GPTModel(self.cfg)
        self.rules = default_axis_rules()
        if self.optimizer is None:
            self.optimizer = optax.chain(
                optax.clip_by_global_norm(1.0),
                optax.adamw(3e-4, b1=0.9, b2=0.95, weight_decay=0.1))
        self._jit_cache = None

    # -- init / shardings -----------------------------------------------------
    def _abstract_state(self):
        tokens = jnp.zeros((1, self.cfg.seq_length), jnp.int32)

        def init_fn(rng):
            params = self.model.init(rng, tokens)["params"]
            opt_state = self.optimizer.init(nn.meta.unbox(params))
            return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                              opt_state=opt_state)

        with jax.set_mesh(self.mesh):
            return jax.eval_shape(init_fn, jax.random.PRNGKey(0))

    def state_shardings(self):
        abstract = self._abstract_state()
        specs = nn.get_partition_spec(abstract)
        shardings = nn.logical_to_mesh_sharding(specs, self.mesh, self.rules)

        # stamp 'pp' onto the leading layers axis of every stacked leaf
        def fix(path, sh):
            keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
            if "layers" in keys and isinstance(sh, NamedSharding):
                spec = list(sh.spec) or [None]
                spec[0] = "pp"
                return NamedSharding(self.mesh, P(*spec))
            return sh

        return jax.tree_util.tree_map_with_path(fix, shardings)

    def init_state(self, seed: int = 0) -> TrainState:
        shardings = self.state_shardings()
        tokens = jnp.zeros((1, self.cfg.seq_length), jnp.int32)

        def init_fn(rng):
            params = nn.meta.unbox(self.model.init(rng, tokens)["params"])
            return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                              opt_state=self.optimizer.init(params))

        with jax.set_mesh(self.mesh):
            return jax.jit(init_fn, out_shardings=nn.meta.unbox(shardings))(
                jax.random.PRNGKey(seed))

    # -- the pipelined forward -------------------------------------------------
    def _pipeline_hidden(self, layer_params, embeds, positions):
        """embeds [n_micro, B_mb, S, D] → hidden [n_micro, B_mb, S, D]
        through all L layers via the pp-staged schedule."""
        cfg, pp = self.cfg, self.pp
        layer = TransformerLayer(cfg, is_training=True)

        def stage_fn(p_local, x, positions):
            # p_local: this stage's [L/pp, ...] slab; scan its layers
            def body(carry, p_layer):
                y, _ = layer.apply({"params": p_layer}, carry, positions)
                return y, None

            x, _ = jax.lax.scan(body, x, p_local)
            return x

        stage_fn = jax.checkpoint(stage_fn, prevent_cse=False)

        def pipe(p_local, mbs, positions):
            stage = jax.lax.axis_index("pp")
            n_micro = mbs.shape[0]
            T = n_micro + pp - 1
            out0 = jnp.zeros_like(mbs)

            def tick(carry, t):
                act, out = carry
                mb_idx = jnp.clip(t, 0, n_micro - 1)
                feed = jax.lax.dynamic_index_in_dim(mbs, mb_idx, 0, keepdims=False)
                x = jnp.where(stage == 0, feed, act)
                y = stage_fn(p_local, x, positions)
                nxt = jax.lax.ppermute(y, "pp", [(i, (i + 1) % pp) for i in range(pp)])
                # the last stage retires microbatch t-(pp-1) this tick
                out_idx = t - (pp - 1)
                slot = jnp.maximum(out_idx, 0)
                cur = jax.lax.dynamic_index_in_dim(out, slot, 0, keepdims=False)
                val = jnp.where((stage == pp - 1) & (out_idx >= 0), y, cur)
                out = jax.lax.dynamic_update_index_in_dim(out, val, slot, 0)
                return (nxt, out), None

            (_, out), _ = jax.lax.scan(tick, (jnp.zeros_like(mbs[0]), out0),
                                       jnp.arange(T))
            # only the last stage holds real outputs → broadcast over pp
            return jax.lax.psum(jnp.where(stage == pp - 1, out, 0.0), "pp")

        return jax.shard_map(
            pipe,
            mesh=self.mesh,
            in_specs=(P("pp"), P(), P()),
            out_specs=P(),
            axis_names={"pp"},
            check_vma=False,
        )(layer_params, embeds, positions)

    # -- train step --------------------------------------------------------------
    def _loss(self, params, batch):
        cfg = self.cfg
        tokens = batch["tokens"]  # [n_micro, B_mb, S]
        n_micro, B_mb, S = tokens.shape
        positions = jnp.arange(S)[None, :].repeat(B_mb, 0)

        embed_w = params["embedding"]
        x = jnp.take(embed_w, tokens, axis=0).astype(
            jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32)

        hidden = self._pipeline_hidden(params["layers"], x, positions)

        # final norm + LM head/loss outside the pipeline (GSPMD)
        flat = hidden.reshape(n_micro * B_mb, S, -1)
        normed = _apply_final_norm(cfg, params["final_norm"], flat)
        labels = batch["labels"].reshape(n_micro * B_mb, S)
        mask = batch.get("loss_mask")
        if mask is not None:
            mask = mask.reshape(n_micro * B_mb, S)
        if cfg.share_embeddings_and_output_weights:
            w_vd = embed_w
        else:
            w_vd = params["lm_head"]["kernel"].T
        loss, n = fused_linear_cross_entropy(
            normed, w_vd, labels, mask, logit_softcapping=cfg.logit_softcapping,
            chunk=cfg.fused_ce_chunk)
        return loss, n

    def train_step_jit(self):
        if self._jit_cache is None:
            shardings = nn.meta.unbox(self.state_shardings())
            optimizer = self.optimizer

            def step(state, batch):
                (loss, _), grads = jax.value_and_grad(self._loss, has_aux=True)(
                    state.params, batch)
                updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
                new_params = optax.apply_updates(state.params, updates)
                metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
                return TrainState(step=state.step + 1, params=new_params,
                                  opt_state=new_opt), metrics

            with jax.set_mesh(self.mesh):
                self._jit_cache = jax.jit(
                    step, in_shardings=(shardings, None),
                    out_shardings=(shardings, None), donate_argnums=(0,))
        return self._jit_cache

    def train_step(self, state, batch, rng=None):
        step = self.train_step_jit()
        with jax.set_mesh(self.mesh):
            spec = P(None, ("dp", "fsdp"))
            batch = jax.device_put(batch, jax.tree.map(
                lambda x: NamedSharding(self.mesh, spec), batch))
            return step(state, batch)


def _apply_final_norm(cfg: GPTConfig, norm_params, x):
    x32 = x.astype(jnp.float32)
    if cfg.normalization == "RMSNorm":
        var = jnp.mean(jnp.square(x32), -1, keepdims=True)
        g = norm_params["scale"].astype(jnp.float32)
        if cfg.layernorm_zero_centered_gamma:
            g = 1.0 + g
        return (x32 * jax.lax.rsqrt(var + cfg.layernorm_epsilon) * g).astype(x.dtype)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), -1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + cfg.layernorm_epsilon)
    g = norm_params["scale"].astype(jnp.float32)
    if cfg.layernorm_zero_centered_gamma:
        g = 1.0 + g
    return (y * g + norm_params["bias"].astype(jnp.float32)).astype(x.dtype)
