"""Encoder-specific parallelism for T5 (enc-dec models).

Reference parity: `encoder_tensor_model_parallel_size` and
`encoder_pipeline_model_parallel_size` (MegatronStrategy ctor,
`nemo/lightning/pytorch/strategies/megatron_strategy.py:251-252`) — the
reference lets the (usually smaller) encoder run at a different TP degree
and places it on dedicated pipeline stages.

TPU-native design (not a port of the MCore process-group split):
- **Encoder TP** is a GSPMD sharding choice: decoder kernels shard heads/
  ffn over the `tp` axis; encoder kernels shard over `tp` when
  `encoder_tp == tp` or stay replicated when `encoder_tp == 1` (the two
  settings the reference recipes actually use). No separate process
  groups — one mesh, two sharding rules.
- **Encoder PP**: instead of statically splitting pp ranks between
  encoder and decoder (which idles encoder stages during the decoder
  phase), BOTH stacks pipeline over the SAME `pp` axis in sequence:
  encoder microbatch pipeline, then decoder pipeline consuming the
  encoder output (replicated). Same peak memory per stage, zero idle
  stages, and the schedule is two `lax.scan`+`ppermute` loops inside one
  `shard_map` — the GPipe machinery of `parallel/pipeline.py` applied
  per stack.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nemo_tpu.models.llm.t5 import (
    T5Attention, T5Block, T5Config, T5RMSNorm, _rel_bucket, t5_loss,
)
from nemo_tpu.models.llm.train import TrainState
from nemo_tpu.parallel.mesh import MeshConfig, make_mesh


class T5RelBias(nn.Module):
    """Standalone relative-position bias table (hoisted out of the layer
    stack so the layers can be scanned/stacked)."""

    cfg: T5Config
    bidirectional: bool = True

    @nn.compact
    def __call__(self, Tq: int, Tk: int):
        cfg = self.cfg
        rel = jnp.arange(Tk)[None, :] - jnp.arange(Tq)[:, None]
        buckets = _rel_bucket(rel, self.bidirectional,
                              cfg.relative_attention_num_buckets,
                              cfg.relative_attention_max_distance)
        table = self.param("rel_bias", nn.initializers.normal(0.02),
                           (cfg.relative_attention_num_buckets,
                            cfg.num_attention_heads))
        return jnp.transpose(table[buckets], (2, 0, 1))[None]  # [1,H,Tq,Tk]


class _ScanBlock(nn.Module):
    cfg: T5Config
    is_decoder: bool = False
    train: bool = False

    @nn.compact
    def __call__(self, x, enc_out, self_mask, cross_mask, pos_bias):
        y, _ = T5Block(self.cfg, is_decoder=self.is_decoder, first=False)(
            x, enc_out, self_mask, cross_mask, pos_bias, train=self.train)
        return y, None


class T5ScanModel(nn.Module):
    """T5 with stacked (scanned) layer params — the pipeline/TP-shardable
    form. Math-identical to `T5Model` (rel bias shared across the stack,
    which in `T5Model` is computed by layer 0 and reused)."""

    cfg: T5Config

    @nn.compact
    def __call__(self, enc_tokens, dec_tokens, enc_mask=None, dec_mask=None,
                 *, train=False):
        cfg = self.cfg
        B, Se = enc_tokens.shape
        Sd = dec_tokens.shape[1]
        if enc_mask is None:
            enc_mask = jnp.ones((B, Se), bool)
        if dec_mask is None:
            dec_mask = jnp.ones((B, Sd), bool)

        emb = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="shared_emb")
        pos_e = T5RelBias(cfg, bidirectional=True, name="rel_bias_enc")(Se, Se)
        pos_d = T5RelBias(cfg, bidirectional=False, name="rel_bias_dec")(Sd, Sd)

        scan = lambda name, dec: nn.scan(
            _ScanBlock, variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(nn.broadcast,) * 4, length=cfg.num_layers,
            metadata_params={nn.PARTITION_NAME: "layers"},
        )(cfg, is_decoder=dec, train=train, name=name)

        x = nn.Dropout(cfg.dropout, deterministic=not train)(emb(enc_tokens))
        x, _ = scan("enc_layers", False)(
            x, None, enc_mask[:, None, None, :], None, pos_e)
        enc_out = T5RMSNorm(cfg.layernorm_epsilon, name="enc_final_ln")(x)

        y = nn.Dropout(cfg.dropout, deterministic=not train)(emb(dec_tokens))
        causal = jnp.tril(jnp.ones((Sd, Sd), bool))
        dself = causal[None, None] & dec_mask[:, None, None, :]
        y, _ = scan("dec_layers", True)(
            y, enc_out, dself, enc_mask[:, None, None, :], pos_d)
        y = T5RMSNorm(cfg.layernorm_epsilon, name="dec_final_ln")(y)
        logits = (y * (cfg.hidden_size ** -0.5)) @ emb.embedding.T
        return logits.astype(jnp.float32)


def _t5_param_shardings(params, mesh: Mesh, tp_axis: str = "tp",
                        encoder_tp: Optional[int] = None):
    """Path-rule shardings: attention q/k/v + mlp wi* kernels shard the
    output dim over tp; o/wo shard the input dim; embedding shards vocab.
    Encoder kernels stay replicated when encoder_tp == 1 (the reference's
    encoder_tensor_model_parallel_size=1 case)."""
    tp = mesh.shape.get(tp_axis, 1)
    enc_tp = tp if encoder_tp is None else encoder_tp
    if enc_tp not in (1, tp):
        raise ValueError(f"encoder_tp must be 1 or tp={tp}, got {enc_tp}")

    def rule(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        in_enc = any(k == "enc_layers" for k in keys)
        use_tp = tp > 1 and (enc_tp == tp or not in_enc)
        is_stacked = "enc_layers" in keys or "dec_layers" in keys
        lead = ("layers",) if is_stacked else ()

        def spec(*dims):
            return NamedSharding(mesh, P(*((None,) * len(lead) + dims)))

        if keys[-1] == "embedding":  # [V, D]
            return NamedSharding(mesh, P(tp_axis if tp > 1 else None, None))
        if keys[-1] == "kernel" and use_tp:
            parent = keys[-2]
            if parent in ("q", "k", "v", "wi", "wi0", "wi1"):
                return spec(None, tp_axis)  # [D, inner] col-parallel
            if parent in ("o", "wo"):
                return spec(tp_axis, None)  # [inner, D] row-parallel
        return spec(*((None,) * (leaf.ndim - len(lead))))

    return jax.tree_util.tree_map_with_path(rule, params)


@dataclasses.dataclass
class T5TrainModule:
    """GSPMD T5 training over a (dp, tp) mesh with encoder-specific TP.

    encoder_tp=1 replicates encoder weights (reference etp=1); encoder_tp
    =tp (default) shards both stacks identically."""

    cfg: T5Config
    mesh_cfg: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    encoder_tp: Optional[int] = None
    optimizer: Optional[optax.GradientTransformation] = None
    mesh: Optional[Mesh] = None

    def __post_init__(self):
        if self.mesh is None:
            self.mesh = make_mesh(self.mesh_cfg)
        self.model = T5ScanModel(self.cfg)
        if self.optimizer is None:
            self.optimizer = optax.chain(
                optax.clip_by_global_norm(1.0), optax.adamw(1e-3))
        self._jit = None

    def _tokens(self):
        S = self.cfg.seq_length
        return (jnp.zeros((1, S), jnp.int32), jnp.zeros((1, S), jnp.int32))

    def param_shardings(self):
        et, dt = self._tokens()
        abstract = jax.eval_shape(
            lambda r: self.model.init(r, et, dt)["params"],
            jax.random.PRNGKey(0))
        return _t5_param_shardings(abstract, self.mesh,
                                   encoder_tp=self.encoder_tp)

    def state_shardings(self):
        psh = self.param_shardings()
        rep = NamedSharding(self.mesh, P())
        abstract_p = jax.eval_shape(
            lambda r: self.model.init(r, *self._tokens())["params"],
            jax.random.PRNGKey(0))
        # opt state mirrors param shardings where shapes match, else replicated
        abstract_opt = jax.eval_shape(self.optimizer.init, abstract_p)
        shape_to_sh = {}
        for l, s in zip(jax.tree.leaves(abstract_p), jax.tree.leaves(psh)):
            shape_to_sh.setdefault((l.shape, l.dtype), s)
        opt_sh = jax.tree.map(
            lambda l: shape_to_sh.get((l.shape, l.dtype), rep), abstract_opt)
        return TrainState(step=rep, params=psh, opt_state=opt_sh)

    def init_state(self, seed: int = 0) -> TrainState:
        sh = self.state_shardings()
        et, dt = self._tokens()

        def init_fn(rng):
            params = self.model.init(rng, et, dt)["params"]
            return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                              opt_state=self.optimizer.init(params))

        with jax.set_mesh(self.mesh):
            return jax.jit(init_fn, out_shardings=sh)(jax.random.PRNGKey(seed))

    def train_step(self, state, batch, rng=None):
        if self._jit is None:
            sh = self.state_shardings()
            opt = self.optimizer
            model = self.model

            def step(state, batch, rng):
                def loss_fn(p):
                    logits = model.apply(
                        {"params": p}, batch["enc_tokens"],
                        batch["dec_tokens"], batch.get("enc_mask"),
                        batch.get("dec_mask"), train=True,
                        rngs={"dropout": rng})
                    return t5_loss(logits, batch["labels"],
                                   batch["loss_mask"])

                loss, grads = jax.value_and_grad(loss_fn)(state.params)
                updates, new_opt = opt.update(grads, state.opt_state,
                                              state.params)
                new_p = optax.apply_updates(state.params, updates)
                return (TrainState(step=state.step + 1, params=new_p,
                                   opt_state=new_opt),
                        {"loss": loss, "grad_norm": optax.global_norm(grads)})

            with jax.set_mesh(self.mesh):
                self._jit = jax.jit(step, in_shardings=(sh, None, None),
                                    out_shardings=(sh, None),
                                    donate_argnums=(0,))
        if rng is None:
            rng = jax.random.PRNGKey(0)
        with jax.set_mesh(self.mesh):
            spec = P(("dp", "fsdp"))
            batch = jax.device_put(batch, jax.tree.map(
                lambda x: NamedSharding(self.mesh, spec), batch))
            return self._jit(state, batch, rng)


@dataclasses.dataclass
class T5PipelinedModule:
    """Encoder-PP for T5: both stacks pipeline over the `pp` mesh axis in
    sequence (encoder microbatch pipeline → decoder pipeline consuming the
    replicated encoder output). Batches carry a leading microbatch axis:
    enc_tokens [n_micro, B_mb, S]."""

    cfg: T5Config
    mesh_cfg: MeshConfig = dataclasses.field(default_factory=lambda: MeshConfig(pp=2))
    optimizer: Optional[optax.GradientTransformation] = None
    mesh: Optional[Mesh] = None

    def __post_init__(self):
        if self.mesh is None:
            self.mesh = make_mesh(self.mesh_cfg)
        self.pp = self.mesh.shape["pp"]
        if self.cfg.num_layers % self.pp:
            raise ValueError(
                f"num_layers {self.cfg.num_layers} % pp {self.pp} != 0")
        if self.cfg.dropout:
            raise ValueError("T5 gpipe phase supports dropout=0 "
                             "(finetune eval path); set cfg.dropout=0")
        self.model = T5ScanModel(self.cfg)
        if self.optimizer is None:
            self.optimizer = optax.chain(
                optax.clip_by_global_norm(1.0), optax.adamw(1e-3))
        self._jit = None

    def state_shardings(self):
        et = jnp.zeros((1, self.cfg.seq_length), jnp.int32)
        abstract = jax.eval_shape(
            lambda r: self.model.init(r, et, et)["params"],
            jax.random.PRNGKey(0))
        rep = NamedSharding(self.mesh, P())

        def rule(path, leaf):
            keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
            if "enc_layers" in keys or "dec_layers" in keys:
                return NamedSharding(
                    self.mesh, P(*(("pp",) + (None,) * (leaf.ndim - 1))))
            return rep

        psh = jax.tree_util.tree_map_with_path(rule, abstract)
        abstract_opt = jax.eval_shape(self.optimizer.init, abstract)
        shape_sh = {}
        for l, s in zip(jax.tree.leaves(abstract), jax.tree.leaves(psh)):
            shape_sh.setdefault((l.shape, l.dtype), s)
        opt_sh = jax.tree.map(
            lambda l: shape_sh.get((l.shape, l.dtype), rep), abstract_opt)
        return TrainState(step=rep, params=psh, opt_state=opt_sh)

    def init_state(self, seed: int = 0) -> TrainState:
        sh = self.state_shardings()
        et = jnp.zeros((1, self.cfg.seq_length), jnp.int32)

        def init_fn(rng):
            params = self.model.init(rng, et, et)["params"]
            return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                              opt_state=self.optimizer.init(params))

        with jax.set_mesh(self.mesh):
            return jax.jit(init_fn, out_shardings=sh)(jax.random.PRNGKey(seed))

    def _stack_pipeline(self, is_decoder: bool):
        """Returns pipe(stack_params, mbs, enc_out, self_mask, cross_mask,
        pos_bias) → outputs [n_micro, ...]: a GPipe phase over pp."""
        cfg, pp = self.cfg, self.pp
        block = T5Block(cfg, is_decoder=is_decoder, first=False)

        def stage_fn(p_local, x, enc_out, self_mask, cross_mask, pos_bias):
            def body(carry, p_layer):
                # scanned slabs nest under the _ScanBlock child module name
                y, _ = block.apply({"params": p_layer["T5Block_0"]}, carry,
                                   enc_out, self_mask, cross_mask, pos_bias)
                return y, None

            x, _ = jax.lax.scan(body, x, p_local)
            return x

        stage_fn = jax.checkpoint(stage_fn, prevent_cse=False)

        def pipe(p_local, mbs, enc_out, self_mask, cross_mask, pos_bias):
            stage = jax.lax.axis_index("pp")
            n_micro = mbs.shape[0]
            T = n_micro + pp - 1
            out0 = jnp.zeros_like(mbs)

            def tick(carry, t):
                act, out = carry
                mb0 = jnp.clip(t, 0, n_micro - 1)
                feed = jax.lax.dynamic_index_in_dim(mbs, mb0, 0, False)
                # stage s processes microbatch t−s this tick: per-microbatch
                # side inputs (enc_out, masks) index by the STAGE's mb
                mb = jnp.clip(t - stage, 0, n_micro - 1)
                eo = (jax.lax.dynamic_index_in_dim(enc_out, mb, 0, False)
                      if is_decoder else None)
                sm = jax.lax.dynamic_index_in_dim(self_mask, mb, 0, False)
                cm = (jax.lax.dynamic_index_in_dim(cross_mask, mb, 0, False)
                      if is_decoder else None)
                x = jnp.where(stage == 0, feed, act)
                y = stage_fn(p_local, x, eo, sm, cm, pos_bias)
                nxt = jax.lax.ppermute(
                    y, "pp", [(i, (i + 1) % pp) for i in range(pp)])
                oi = t - (pp - 1)
                slot = jnp.maximum(oi, 0)
                cur = jax.lax.dynamic_index_in_dim(out, slot, 0, False)
                val = jnp.where((stage == pp - 1) & (oi >= 0), y, cur)
                out = jax.lax.dynamic_update_index_in_dim(out, val, slot, 0)
                return (nxt, out), None

            (_, out), _ = jax.lax.scan(
                tick, (jnp.zeros_like(mbs[0]), out0), jnp.arange(T))
            return jax.lax.psum(jnp.where(stage == pp - 1, out, 0.0), "pp")

        enc_specs = (P("pp"), P(), P(), P(), P(), P())
        return jax.shard_map(pipe, mesh=self.mesh, in_specs=enc_specs,
                             out_specs=P(), axis_names={"pp"},
                             check_vma=False)

    def _loss(self, params, batch):
        cfg = self.cfg
        enc_tokens = batch["enc_tokens"]  # [n_micro, B, Se]
        dec_tokens = batch["dec_tokens"]
        n_micro, B, Se = enc_tokens.shape
        Sd = dec_tokens.shape[2]
        enc_mask = batch.get("enc_mask")
        if enc_mask is None:
            enc_mask = jnp.ones((n_micro, B, Se), bool)
        emb = params["shared_emb"]["embedding"]

        pos_e = _rel_bias_from(params["rel_bias_enc"], cfg, Se, Se, True)
        pos_d = _rel_bias_from(params["rel_bias_dec"], cfg, Sd, Sd, False)

        x = jnp.take(emb, enc_tokens, axis=0)
        self_m = enc_mask[:, :, None, None, :]
        enc_hidden = self._stack_pipeline(False)(
            params["enc_layers"], x, jnp.zeros((n_micro, B, 1, 1), x.dtype),
            self_m, jnp.zeros((n_micro, B, 1, 1, 1), bool), pos_e)
        enc_out = _rmsnorm(params["enc_final_ln"], enc_hidden,
                           cfg.layernorm_epsilon)

        y = jnp.take(emb, dec_tokens, axis=0)
        causal = jnp.tril(jnp.ones((Sd, Sd), bool))
        dself = jnp.broadcast_to(causal[None, None, None],
                                 (n_micro, B, 1, Sd, Sd))
        cross = enc_mask[:, :, None, None, :]
        dec_hidden = self._stack_pipeline(True)(
            params["dec_layers"], y, enc_out, dself, cross, pos_d)
        out = _rmsnorm(params["dec_final_ln"], dec_hidden,
                       cfg.layernorm_epsilon)
        logits = (out * (cfg.hidden_size ** -0.5)) @ emb.T
        labels = batch["labels"].reshape(n_micro * B, Sd)
        mask = batch["loss_mask"].reshape(n_micro * B, Sd)
        return t5_loss(logits.reshape(n_micro * B, Sd, -1).astype(jnp.float32),
                       labels, mask)

    def train_step(self, state, batch, rng=None):
        if self._jit is None:
            sh = self.state_shardings()
            opt = self.optimizer

            def step(state, batch):
                loss, grads = jax.value_and_grad(self._loss)(
                    state.params, batch)
                updates, new_opt = opt.update(grads, state.opt_state,
                                              state.params)
                new_p = optax.apply_updates(state.params, updates)
                return (TrainState(step=state.step + 1, params=new_p,
                                   opt_state=new_opt),
                        {"loss": loss, "grad_norm": optax.global_norm(grads)})

            with jax.set_mesh(self.mesh):
                self._jit = jax.jit(step, in_shardings=(sh, None),
                                    out_shardings=(sh, None),
                                    donate_argnums=(0,))
        with jax.set_mesh(self.mesh):
            spec = P(None, ("dp", "fsdp"))
            batch = jax.device_put(batch, jax.tree.map(
                lambda x: NamedSharding(self.mesh, spec), batch))
            return self._jit(state, batch)


def _rmsnorm(p, x, eps):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps) * p["scale"]).astype(x.dtype)


def _rel_bias_from(p, cfg: T5Config, Tq, Tk, bidirectional):
    rel = jnp.arange(Tk)[None, :] - jnp.arange(Tq)[:, None]
    buckets = _rel_bucket(rel, bidirectional,
                          cfg.relative_attention_num_buckets,
                          cfg.relative_attention_max_distance)
    return jnp.transpose(p["rel_bias"][buckets], (2, 0, 1))[None]
