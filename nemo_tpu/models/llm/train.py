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
from flax import struct, traverse_util
from flax.core import unfreeze
import flax.linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nemo_tpu.models.llm.config import GPTConfig
from nemo_tpu.models.llm.gpt import GPTModel
from nemo_tpu.models.llm.loss import fused_linear_cross_entropy, masked_token_loss
from nemo_tpu.parallel.mesh import MeshConfig, default_axis_rules, make_mesh


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def _moe_aux_total(losses_col) -> jnp.ndarray:
    """Sum every sown 'moe_aux' leaf (already coeff-weighted per layer)."""
    total = jnp.zeros((), jnp.float32)
    for path, leaf in traverse_util.flatten_dict(losses_col).items():
        if path[-1] == "moe_aux":
            for v in leaf if isinstance(leaf, (tuple, list)) else (leaf,):
                total = total + jnp.sum(v)
    return total


def _update_expert_bias(params, losses_col, rate: float):
    """DeepSeek-V3 aux-loss-free balancing (reference:
    gpt/model/deepseek.py expert-bias fields): after each step move each
    expert's e-score correction bias by ±rate against its load error —
    underloaded experts (load < mean) gain bias, overloaded lose it. The
    sown 'expert_load' collection mirrors the params tree, so the matching
    'expert_bias' leaf lives at the sibling path."""
    flat_p = traverse_util.flatten_dict(params)
    for path, leaf in traverse_util.flatten_dict(losses_col).items():
        if path[-1] != "expert_load":
            continue
        load = leaf[0] if isinstance(leaf, (tuple, list)) else leaf
        bias_path = path[:-1] + ("expert_bias",)
        if bias_path in flat_p:
            err = jnp.mean(load, axis=-1, keepdims=True) - load
            flat_p[bias_path] = flat_p[bias_path] + rate * jnp.sign(err)
    return traverse_util.unflatten_dict(flat_p)


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
    # knowledge distillation (reference: llm/api.py:390 `distill` /
    # megatron distillation GPT): when a batch carries "teacher_logits",
    # loss = (1−α)·CE + α·T²·KL(teacher/T ‖ student/T)
    kd_temperature: float = 1.0
    kd_alpha: float = 0.5

    def __post_init__(self):
        if self.cfg.quantization == "int8_ptq":
            raise ValueError(
                "quantization='int8_ptq' is the weight-resident SERVING "
                "path (ptq(algorithm='int8_serve')); its int8 params have "
                "no useful gradients. Train with quantization in "
                "{'fp8','fp8_e4m3','int8'} instead.")
        if self.mesh is None:
            self.mesh = make_mesh(self.mesh_cfg)
        cp = self.mesh.shape.get("cp", 1)
        if cp > 1 and self.cfg.cp_size != cp:
            # auto-wire ring-attention context parallelism to the mesh
            self.cfg = dataclasses.replace(self.cfg, cp_size=cp)
        self.model = GPTModel(self.cfg)
        self.rules = default_axis_rules()
        if self.optimizer is None:
            sched = self.lr_schedule or (lambda step: 3e-4)
            self.optimizer = optax.chain(
                optax.clip_by_global_norm(1.0),
                optax.adamw(sched, b1=0.9, b2=0.95, eps=1e-8, weight_decay=0.1),
            )
        self._build()

    # -- init ---------------------------------------------------------------
    def _init_tokens(self):
        # batch dim must divide (dp, fsdp) for shard_map'd attention paths;
        # the init forward is dead code (only params survive), XLA DCEs it.
        b = self.mesh.shape.get("dp", 1) * self.mesh.shape.get("fsdp", 1)
        return jnp.zeros((max(1, b), self.cfg.seq_length), jnp.int32)

    def _init_kwargs(self):
        # MTP params only materialize when the block runs (flax compact):
        # init with output_hidden + mtp_targets so they exist in the tree
        if self.cfg.mtp_num_layers > 0:
            return dict(mtp_targets=self._init_tokens())
        return {}

    def _abstract_state(self):
        tokens = self._init_tokens()

        def init_fn(rng):
            variables = self.model.init(rng, tokens, **self._init_kwargs())
            params = variables["params"]  # boxed with logical-axis metadata
            opt_state = self.optimizer.init(nn.meta.unbox(params))
            return TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=opt_state)

        with jax.set_mesh(self.mesh):
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
        tokens = self._init_tokens()

        def init_fn(rng):
            variables = self.model.init(rng, tokens, **self._init_kwargs())
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

        cfg = self.cfg

        moe = cfg.num_moe_experts > 0

        def apply_model(params, *args, **kw):
            """model.apply that collects the sown MoE 'losses' collection
            (aux load-balancing loss + per-expert load) when the model has
            experts — otherwise the sow would be silently dropped."""
            if moe:
                out, mut = model.apply(
                    {"params": params}, *args, mutable=["losses"], **kw)
                return out, mut.get("losses", {})
            return model.apply({"params": params}, *args, **kw), {}

        def loss_fn(params, batch, rng):
            tokens, labels = batch["tokens"], batch["labels"]
            loss_mask = batch.get("loss_mask")
            positions = batch.get("positions")
            if cfg.cp_size > 1 and positions is None:
                # zig-zag causal load balance: rank r gets chunks (r, 2cp−1−r)
                # (reference: get_batch_on_this_cp_rank, gpt/model/base.py:110).
                # Reorder the sequence dim in-step; masked CE is order-free.
                from nemo_tpu.ops.ring_attention import zigzag_chunk_ids

                S = tokens.shape[-1]
                if S % (2 * cfg.cp_size) == 0:
                    ids = zigzag_chunk_ids(cfg.cp_size).reshape(-1)
                    clen = S // (2 * cfg.cp_size)
                    order = np.concatenate(
                        [np.arange(i * clen, (i + 1) * clen) for i in ids]
                    )
                    tokens = tokens[..., order]
                    labels = labels[..., order]
                    if loss_mask is not None:
                        loss_mask = loss_mask[..., order]
                    positions = jnp.asarray(order, jnp.int32)[None, :].repeat(
                        tokens.shape[0], 0
                    )
            teacher_logits = batch.get("teacher_logits")
            if teacher_logits is not None:
                logits, losses_col = apply_model(
                    params, tokens, positions,
                    segment_ids=batch.get("segment_ids"),
                    train=True, rngs={"dropout": rng},
                )
                ce, n = masked_token_loss(logits, labels, loss_mask)
                T = self.kd_temperature
                lp_s = jax.nn.log_softmax(logits.astype(jnp.float32) / T)
                p_t = jax.nn.softmax(teacher_logits.astype(jnp.float32) / T)
                kl = jnp.sum(p_t * (jnp.log(jnp.maximum(p_t, 1e-20)) - lp_s), -1)
                if loss_mask is not None:
                    kl = jnp.sum(kl * loss_mask) / jnp.maximum(jnp.sum(loss_mask), 1)
                else:
                    kl = jnp.mean(kl)
                a = self.kd_alpha
                loss = (1 - a) * ce + a * (T * T) * kl
            elif cfg.fused_ce:
                mtp_kw = {}
                if cfg.mtp_num_layers > 0:
                    # the MTP block consumes the KNOWN next token x_{t+1}
                    # (= the main label at t) and predicts x_{t+2}
                    mtp_kw = dict(mtp_targets=labels)
                out = apply_model(
                    params, tokens,
                    positions,
                    segment_ids=batch.get("segment_ids"),
                    train=True, output_hidden=True, rngs={"dropout": rng},
                    **mtp_kw,
                )
                hidden, losses_col = out
                mtp_hidden = None
                if cfg.mtp_num_layers > 0:
                    hidden, mtp_hidden = hidden
                if cfg.share_embeddings_and_output_weights:
                    w_vd = params["embedding"]
                else:
                    w_vd = params["lm_head"]["kernel"].T
                loss, n = fused_linear_cross_entropy(
                    hidden, w_vd, labels, loss_mask,
                    logit_softcapping=cfg.logit_softcapping,
                    chunk=cfg.fused_ce_chunk,
                )
                if mtp_hidden is not None:
                    # MTP labels: x_{t+2} = labels shifted left; last
                    # position has no target
                    mtp_labels = jnp.concatenate(
                        [labels[:, 1:], jnp.zeros_like(labels[:, :1])], 1)
                    mm = (loss_mask if loss_mask is not None
                          else jnp.ones_like(labels, jnp.float32))
                    mtp_mask = jnp.concatenate(
                        [mm[:, 1:], jnp.zeros_like(mm[:, :1])], 1)
                    mtp_loss, _ = fused_linear_cross_entropy(
                        mtp_hidden, w_vd, mtp_labels, mtp_mask,
                        logit_softcapping=cfg.logit_softcapping,
                        chunk=cfg.fused_ce_chunk,
                    )
                    loss = loss + cfg.mtp_loss_coeff * mtp_loss
            else:
                logits, losses_col = apply_model(
                    params, tokens,
                    positions,
                    segment_ids=batch.get("segment_ids"),
                    train=True, rngs={"dropout": rng},
                )
                loss, n = masked_token_loss(logits, labels, loss_mask)
            if moe and cfg.moe_aux_loss_coeff:
                loss = loss + _moe_aux_total(losses_col)
            return loss, {"n": n, "losses": losses_col}

        def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng) -> Tuple[TrainState, Dict]:
            if batch["tokens"].ndim == 3:  # [A, B, S] microbatch accumulation
                def micro(carry, mb):
                    acc_grads, acc_loss, acc_aux = carry
                    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                        state.params, mb, rng
                    )
                    acc_aux = jax.tree.map(jnp.add, acc_aux, aux["losses"])
                    return (jax.tree.map(jnp.add, acc_grads, grads),
                            acc_loss + loss, acc_aux), None

                zero = jax.tree.map(jnp.zeros_like, state.params)
                zero_aux = jax.tree.map(
                    jnp.zeros_like,
                    jax.eval_shape(lambda: loss_fn(
                        state.params, jax.tree.map(lambda x: x[0], batch), rng
                    )[1]["losses"]))
                (grads, loss_sum, losses_col), _ = jax.lax.scan(
                    micro, (zero, 0.0, zero_aux), batch)
                A = batch["tokens"].shape[0]
                grads = jax.tree.map(lambda g: g / A, grads)
                loss = loss_sum / A
            else:
                (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, batch, rng
                )
                losses_col = aux["losses"]
            updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            if (moe and cfg.moe_router_enable_expert_bias
                    and cfg.moe_router_bias_update_rate):
                new_params = _update_expert_bias(
                    new_params, losses_col, cfg.moe_router_bias_update_rate)
            gnorm = optax.global_norm(grads)
            metrics = {"loss": loss, "grad_norm": gnorm, "step": state.step}
            return TrainState(step=state.step + 1, params=new_params, opt_state=new_opt), metrics

        self._train_step_fn = train_step
        self._jit_cache = None

    def batch_shardings(self, batch):
        """Batch dim over (dp, fsdp); sequence dim over cp (ring attention
        shards move data once at host→device instead of inside the step)."""
        seq = "cp" if self.mesh.shape.get("cp", 1) > 1 else None

        def spec(x):
            if x.ndim == 3:  # [A, B, S] microbatched
                return NamedSharding(self.mesh, P(None, ("dp", "fsdp"), seq))
            if x.ndim == 2:  # [B, S]
                return NamedSharding(self.mesh, P(("dp", "fsdp"), seq))
            return NamedSharding(self.mesh, P(("dp", "fsdp")))

        return jax.tree.map(spec, batch)

    def train_step_jit(self):
        if self._jit_cache is None:
            shardings = self.state_shardings()
            rep = NamedSharding(self.mesh, P())
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
            batch = jax.device_put(batch, self.batch_shardings(batch))
            return step(state, batch, rng)


class LMTrainModule:
    """Generic token-LM train module (Trainer protocol) for non-GPT stacks
    — SSM/mamba hybrids, hyena/Evo2, BERT MLM — anything whose apply maps
    tokens [B,S] → logits [B,S,V]. Data-parallel over the mesh's (dp,fsdp)
    axes via batch sharding; params replicated (these recipe entries are
    configs-first; the GPT stack keeps the fully sharded path).

    Reference parity: recipes/mamba2_*.py, hyena_*.py, bert_*.py drive
    their collections through the same pretrain loop as GPT."""

    def __init__(self, model, cfg, mesh_cfg=None, lr_schedule=None,
                 optimizer=None, loss: str = "causal_lm"):
        self.model = model
        self.cfg = cfg
        self.mesh = make_mesh(mesh_cfg or MeshConfig())
        if optimizer is None:
            sched = lr_schedule or (lambda step: 3e-4)
            optimizer = optax.chain(
                optax.clip_by_global_norm(1.0),
                optax.adamw(sched, b1=0.9, b2=0.95, weight_decay=0.1))
        self.optimizer = optimizer
        self.loss_kind = loss
        self._jit = None

    def init_state(self, seed: int = 0) -> TrainState:
        tokens = jnp.zeros((1, int(self.cfg.seq_length)), jnp.int32)
        variables = self.model.init(jax.random.PRNGKey(seed), tokens)
        params = nn.meta.unbox(variables["params"])
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=self.optimizer.init(params))

    def _loss(self, params, batch, rng):
        out = self.model.apply({"params": params}, batch["tokens"])
        if isinstance(out, tuple):
            # SSMModel → (logits, states); BertModel → (hidden, mlm_logits)
            logits = out[-1] if self.loss_kind == "mlm" else out[0]
        else:
            logits = out
        if self.loss_kind == "mlm":
            from nemo_tpu.models.llm.bert import mlm_loss

            mask = batch.get("loss_mask")
            if mask is None:
                mask = jnp.ones(batch["labels"].shape, jnp.float32)
            return mlm_loss(logits, batch["labels"], mask)
        loss, _ = masked_token_loss(logits, batch["labels"],
                                    batch.get("loss_mask"))
        return loss

    def train_step(self, state, batch, rng=None):
        if self._jit is None:
            opt = self.optimizer

            def step(state, batch, rng):
                loss, grads = jax.value_and_grad(self._loss)(
                    state.params, batch, rng)
                updates, new_opt = opt.update(grads, state.opt_state,
                                              state.params)
                params = optax.apply_updates(state.params, updates)
                return (TrainState(step=state.step + 1, params=params,
                                   opt_state=new_opt),
                        {"loss": loss,
                         "grad_norm": optax.global_norm(grads)})

            with jax.set_mesh(self.mesh):
                self._jit = jax.jit(step, donate_argnums=(0,))
        if rng is None:
            rng = jax.random.PRNGKey(int(state.step))
        from jax.sharding import NamedSharding, PartitionSpec as P

        with jax.set_mesh(self.mesh):
            batch = jax.device_put(batch, NamedSharding(
                self.mesh, P(("dp", "fsdp"))))
            return self._jit(state, batch, rng)
