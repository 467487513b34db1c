"""Pipeline parallelism: 1F1B and GPipe schedules over a 'pp' mesh axis.

Reference parity: MegatronParallel's pipeline schedules
(`nemo/lightning/megatron_parallel.py:1411-1436` — 1F1B / interleaved
forward-backward over PP process groups with p2p sends).

TPU-native design (this is NOT a port of the NCCL p2p machinery):
- the layer stack's leading 'layers' axis is sharded over 'pp', so each
  stage holds a contiguous slab of layers — no per-stage modules;
- the schedule is ONE `lax.scan` over ticks inside a partial-manual
  `shard_map(axis_names={'pp'})`: every tick runs the stage body on its
  current activation and hands it to the next stage with `lax.ppermute`
  (the ICI p2p analog). Remaining mesh axes (dp/fsdp/tp/cp) stay in
  GSPMD auto mode, so pipeline composes with tensor/data sharding;

Two schedules:
- **"1f1b" (default)**: a manual forward/backward interleave. Each tick
  every stage runs one forward (microbatch t−s) AND one backward
  (microbatch t−2(pp−1)+s, recompute-from-saved-input + `jax.vjp`),
  so at most 2·pp microbatch inputs are in flight per stage — peak
  activation memory is O(pp), independent of n_micro (the property that
  makes pp × large-model fit; reference 1F1B schedule). Weight grads
  accumulate across ticks; dropout rngs are threaded per
  (microbatch, stage, layer) and replayed identically in the backward
  recompute. The embedding table and LM head are **vocab-sharded over
  the pp axis** (no stage holds the full vocab projection — the memory
  the reference moves to stage boundaries): token embedding is a
  local-shard gather + psum, and the loss is a vocab-parallel fused CE
  computed collectively across stages (each stage does 1/pp of the head
  FLOPs), with the CE/softmax backward written analytically.
- **"gpipe"**: all forwards then `jax.grad` back through the scan
  (per-tick remat). Simpler, same bubble, but saves one activation per
  tick → O(n_micro) memory, and supports no dropout.
- **"interleaved"** (VPP, `vpp>1`): each device holds `vpp`
  non-contiguous layer chunks (device r holds virtual stages r, r+pp,
  r+2·pp, … — reference `virtual_pipeline_model_parallel_size`,
  `megatron_strategy.py:244`). Microbatches are grouped by pp
  (`microbatch_group_size_per_vp_stage` default): the forward of
  (chunk k, microbatch m=g·pp+j) runs on device r at tick
  t = r + k·pp + g·pp·vpp + j, so every activation hand-off is ONE
  forward ring hop per tick and the warm-up bubble shrinks from
  (pp−1) stage-times to (pp−1) CHUNK-times — the vpp× bubble
  reduction that defines VPP. Backward mirrors it (one chunk-vjp per
  device per tick, cotangents ride the reverse ring), the vocab-
  parallel head/CE runs inside the backward tick of the last virtual
  chunk, and dropout rngs are keyed by (microbatch, virtual stage,
  layer). Layer params are stored DEVICE-MAJOR (device r's vpp chunks
  contiguous) so the pp shard of the stacked [L, ...] axis needs no
  gather; `interleaved_storage_perm()` maps execution→storage order.
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
    schedule: str = "1f1b"  # "1f1b" | "gpipe" | "interleaved"
    vpp: int = 1  # virtual pipeline chunks per device (schedule="interleaved")

    def __post_init__(self):
        if self.mesh is None:
            self.mesh = make_mesh(self.mesh_cfg)
        self.pp = self.mesh.shape["pp"]
        if self.cfg.num_layers % self.pp:
            raise ValueError(f"num_layers {self.cfg.num_layers} % pp {self.pp} != 0")
        if not self.cfg.scan_layers:
            raise ValueError("pipeline needs scan_layers=True (stacked layer params)")
        if self.schedule == "gpipe":
            if self.cfg.hidden_dropout or self.cfg.attention_dropout:
                raise ValueError(
                    "gpipe schedule supports dropout=0 only; use schedule='1f1b'")
            self.rules = default_axis_rules()
        elif self.schedule == "interleaved":
            if self.vpp < 1:
                raise ValueError("interleaved needs vpp >= 1")
            if self.cfg.num_layers % (self.pp * self.vpp):
                raise ValueError(
                    f"num_layers {self.cfg.num_layers} % (pp·vpp "
                    f"{self.pp}·{self.vpp}) != 0")
            if self.cfg.vocab_size % self.pp:
                raise ValueError(
                    f"interleaved vocab-parallel head needs vocab_size "
                    f"{self.cfg.vocab_size} % pp {self.pp} == 0")
            if self.cfg.position_embedding_type == "learned_absolute":
                raise ValueError("interleaved supports rope/none position embeddings")
            self.rules = tuple(
                (name, None) if name == "vocab" else (name, ax)
                for name, ax in default_axis_rules())
        elif self.schedule == "1f1b":
            if self.cfg.vocab_size % self.pp:
                raise ValueError(
                    f"1f1b vocab-parallel head needs vocab_size "
                    f"{self.cfg.vocab_size} % pp {self.pp} == 0")
            if self.cfg.position_embedding_type == "learned_absolute":
                raise ValueError("1f1b supports rope/none position embeddings")
            # vocab is sharded over pp (manually, at the stage boundaries) —
            # drop the vocab→tp rule so the two don't compose on one dim
            self.rules = tuple(
                (name, None) if name == "vocab" else (name, ax)
                for name, ax in default_axis_rules())
        else:
            raise ValueError(f"unknown schedule {self.schedule!r}")
        self.model = GPTModel(self.cfg)
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

        # stamp 'pp' onto the leading layers axis of every stacked leaf;
        # under 1f1b also vocab-shard the embedding/LM-head over pp
        stamp_vocab = self.schedule in ("1f1b", "interleaved")

        def fix(path, sh):
            keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
            if not isinstance(sh, NamedSharding):
                return sh
            if "layers" in keys:
                spec = list(sh.spec) or [None]
                spec[0] = "pp"
                return NamedSharding(self.mesh, P(*spec))
            if stamp_vocab and "embedding" in keys:
                spec = list(sh.spec) or [None, None]
                spec[0] = "pp"  # [V, D]: vocab rows over stages
                return NamedSharding(self.mesh, P(*spec))
            if stamp_vocab and "lm_head" in keys:
                spec = list(sh.spec) or [None, None]
                spec[1] = "pp"  # kernel [D, V]: vocab cols over stages
                return NamedSharding(self.mesh, P(*spec))
            return sh

        return jax.tree_util.tree_map_with_path(fix, shardings)

    def interleaved_storage_perm(self) -> np.ndarray:
        """perm such that layers_storage = layers_execution[perm]: device-
        major order (device r's vpp chunks contiguous) so the pp shard of
        the stacked layers axis is a contiguous block. Inverse (for
        checkpoint export / parity tests): argsort(perm)."""
        P, V = self.pp, self.vpp
        Lc = self.cfg.num_layers // (P * V)
        perm = np.empty(self.cfg.num_layers, np.int32)
        s = 0
        for r in range(P):
            for k in range(V):
                for l in range(Lc):
                    perm[s] = k * P * Lc + r * Lc + l
                    s += 1
        return perm

    def init_state(self, seed: int = 0) -> TrainState:
        shardings = self.state_shardings()
        tokens = jnp.zeros((1, self.cfg.seq_length), jnp.int32)
        perm = (jnp.asarray(self.interleaved_storage_perm())
                if self.schedule == "interleaved" else None)

        def init_fn(rng):
            params = nn.meta.unbox(self.model.init(rng, tokens)["params"])
            if perm is not None:
                params["layers"] = jax.tree.map(
                    lambda a: jnp.take(a, perm, axis=0), params["layers"])
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

    # -- 1F1B schedule --------------------------------------------------------
    def _pipe_1f1b_fn(self):
        """Returns pipe(params, tokens, labels, mask, rng) → (loss, grads):
        the manual 1F1B forward/backward (see module docstring)."""
        cfg, pp, mesh = self.cfg, self.pp, self.mesh
        L_local = cfg.num_layers // pp
        Vloc = cfg.vocab_size // pp
        tied = cfg.share_embeddings_and_output_weights
        moe = cfg.num_moe_experts > 0
        cdtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        mult = float(cfg.embedding_multiplier or 1.0)
        layer = TransformerLayer(cfg, is_training=True)
        from nemo_tpu.models.llm.train import _moe_aux_total

        def stage_fwd(p_local, x, positions, key):
            """One stage's layer slab; returns (y, moe_aux_sum)."""
            def body(carry, xs):
                p_layer, li = xs
                k = jax.random.fold_in(key, li)
                if moe:
                    (y, _), mut = layer.apply(
                        {"params": p_layer}, carry, positions,
                        rngs={"dropout": k}, mutable=["losses"])
                    aux = _moe_aux_total(mut.get("losses", {}))
                else:
                    y, _ = layer.apply({"params": p_layer}, carry, positions,
                                       rngs={"dropout": k})
                    aux = jnp.zeros((), jnp.float32)
                return y, aux

            y, auxs = jax.lax.scan(body, x, (p_local, jnp.arange(L_local)))
            return y, jnp.sum(auxs)

        embed_partial = _make_embed_partial(Vloc, mult)
        head_fwd_bwd = _make_head_fwd_bwd(cfg, Vloc)

        def pipe(p_local, emb_local, w_head_local, norm_p,
                 tokens, labels, mask, positions, rng, inv_n):
            stage = jax.lax.axis_index("pp")
            n_micro, B, S = tokens.shape
            D = emb_local.shape[1]
            T = 2 * (pp - 1) + n_micro
            buf = 2 * pp
            fwd_perm = [(i, (i + 1) % pp) for i in range(pp)]
            bwd_perm = [(i, (i - 1) % pp) for i in range(pp)]
            idx_in = lambda a, i: jax.lax.dynamic_index_in_dim(a, i, 0, False)

            zeros_act = jnp.zeros((B, S, D), cdtype)
            carry0 = (
                zeros_act,                                   # act_in
                zeros_act,                                   # grad_in
                jnp.zeros((buf, B, S, D), cdtype),           # xbuf
                jax.tree.map(jnp.zeros_like, p_local),       # gacc
                jnp.zeros_like(emb_local),                   # g_emb
                jnp.zeros_like(w_head_local),                # g_head
                jax.tree.map(jnp.zeros_like, norm_p),        # g_norm
                jnp.zeros((), jnp.float32),                  # Σ nll
                jnp.zeros((), jnp.float32),                  # Σ moe aux
            )

            def tick(c, t):
                act_in, grad_in, xbuf, gacc, g_emb, g_head, g_norm, nll, aux = c
                m_f = t - stage
                do_f = (m_f >= 0) & (m_f < n_micro)
                m_f_c = jnp.clip(m_f, 0, n_micro - 1)
                # -- embedding feed for stage 0 (its mb index is t): a
                # collective lookup over the pp-sharded vocab rows
                m_e = jnp.clip(t, 0, n_micro - 1)
                part = embed_partial(emb_local, idx_in(tokens, m_e), stage)
                feed = jax.lax.psum(part.astype(jnp.float32), "pp").astype(cdtype)
                x = jnp.where(stage == 0, feed, act_in)
                # save the stage input for the backward recompute (gated:
                # bubble ticks must not clobber a live slot)
                slot_f = m_f_c % buf
                cur = idx_in(xbuf, slot_f)
                xbuf = jax.lax.dynamic_update_index_in_dim(
                    xbuf, jnp.where(do_f, x, cur), slot_f, 0)
                # -- forward
                key_f = jax.random.fold_in(jax.random.fold_in(rng, m_f_c), stage)
                y, aux_f = stage_fwd(p_local, x, positions, key_f)
                aux = aux + jnp.where(do_f, aux_f, 0.0)
                y_recv = jax.lax.ppermute(y, "pp", fwd_perm)
                # -- head + CE for the mb retiring at the last stage
                m_h = t - (pp - 1)
                do_h = (m_h >= 0) & (m_h < n_micro)
                m_h_c = jnp.clip(m_h, 0, n_micro - 1)
                h = jax.lax.psum(
                    jnp.where(stage == pp - 1, y, 0).astype(jnp.float32),
                    "pp").astype(y.dtype)
                loss_t, d_h, d_w, d_norm = head_fwd_bwd(
                    w_head_local, norm_p, h, idx_in(labels, m_h_c),
                    idx_in(mask, m_h_c), inv_n)
                nll = nll + jnp.where(do_h, loss_t, 0.0)
                gate_h = jnp.where(do_h, 1.0, 0.0)
                g_head = g_head + d_w * gate_h
                g_norm = jax.tree.map(
                    lambda a, b: a + b * gate_h, g_norm, d_norm)
                # -- backward: recompute from the saved input + vjp
                m_b = t - 2 * (pp - 1) + stage
                do_b = (m_b >= 0) & (m_b < n_micro)
                m_b_c = jnp.clip(m_b, 0, n_micro - 1)
                x_saved = idx_in(xbuf, m_b_c % buf)
                key_b = jax.random.fold_in(jax.random.fold_in(rng, m_b_c), stage)
                g_in = jnp.where(stage == pp - 1, d_h.astype(cdtype), grad_in)
                _, pb = jax.vjp(
                    lambda p, xx: stage_fwd(p, xx, positions, key_b),
                    p_local, x_saved)
                gp, gx = pb((g_in, jnp.asarray(1.0 / n_micro, jnp.float32)))
                gate_b = jnp.where(do_b, 1.0, 0.0)
                gacc = jax.tree.map(lambda a, b: a + b * gate_b, gacc, gp)
                gx_recv = jax.lax.ppermute(gx * gate_b, "pp", bwd_perm)
                # -- embedding backward: stage 0's input cotangent this tick
                # is for mb t − 2(pp−1); scatter-add into the vocab shards
                m_b0 = t - 2 * (pp - 1)
                do_b0 = (m_b0 >= 0) & (m_b0 < n_micro)
                m_b0_c = jnp.clip(m_b0, 0, n_micro - 1)
                ct = jax.lax.psum(
                    jnp.where(stage == 0, gx, 0).astype(jnp.float32), "pp")
                tok_b = idx_in(tokens, m_b0_c)
                ib = tok_b - stage * Vloc
                okb = (ib >= 0) & (ib < Vloc) & do_b0
                upd = jnp.where(okb[..., None], ct * mult, 0.0)
                g_emb = g_emb.at[jnp.clip(ib, 0, Vloc - 1).reshape(-1)].add(
                    upd.reshape(-1, D).astype(g_emb.dtype))
                return (y_recv, gx_recv, xbuf, gacc, g_emb, g_head, g_norm,
                        nll, aux), None

            c, _ = jax.lax.scan(tick, carry0, jnp.arange(T))
            _, _, _, gacc, g_emb, g_head, g_norm, nll, aux = c
            aux_total = jax.lax.psum(aux, "pp") / n_micro
            loss = nll * inv_n + aux_total
            return loss, gacc, g_emb, g_head, g_norm

        p_spec = P("pp")
        pipe_sm = jax.shard_map(
            pipe,
            mesh=mesh,
            in_specs=(p_spec, P("pp", None), P("pp", None), P(),
                      P(), P(), P(), P(), P(), P()),
            out_specs=(P(), p_spec, P("pp", None), P("pp", None), P()),
            axis_names={"pp"},
            check_vma=False,
        )

        def run(params, tokens, labels, mask, positions, rng):
            if tied:
                w_head = params["embedding"]
            else:
                w_head = params["lm_head"]["kernel"].T
            mask32 = mask.astype(jnp.float32)
            inv_n = 1.0 / jnp.maximum(jnp.sum(mask32), 1.0)
            loss, g_layers, g_emb, g_head, g_norm = pipe_sm(
                params["layers"], params["embedding"], w_head,
                params["final_norm"], tokens, labels, mask32, positions,
                rng, inv_n)
            grads = jax.tree.map(jnp.zeros_like, params)
            grads["layers"] = g_layers
            grads["final_norm"] = g_norm
            if tied:
                grads["embedding"] = g_emb + g_head
            else:
                grads["embedding"] = g_emb
                grads["lm_head"] = {"kernel": g_head.T}
            return loss, grads

        return run

    # -- interleaved (VPP) schedule -------------------------------------------
    def _pipe_interleaved_fn(self):
        """Returns pipe(params, tokens, labels, mask, positions, rng) →
        (loss, grads): the interleaved virtual-pipeline 1F1B (see module
        docstring). Index algebra, with P=pp, V=vpp, C=P·V, device r:
        forward of (chunk k, mb m=g·P+j) at tick t = r + k·P + g·C + j;
        backward at t = C + (P−1−r) + (V−1−k)·P + g·C + j. Both flows are
        one ring hop per tick; the head/CE runs inside the backward tick
        of the last virtual chunk on its recomputed output."""
        cfg, pp, V, mesh = self.cfg, self.pp, self.vpp, self.mesh
        C = pp * V
        Lc = cfg.num_layers // C
        Vloc = cfg.vocab_size // pp
        BUF = 3 * pp  # ≥ live (chunk, mb) span (< 3·pp microbatches)
        tied = cfg.share_embeddings_and_output_weights
        moe = cfg.num_moe_experts > 0
        cdtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        mult = float(cfg.embedding_multiplier or 1.0)
        layer = TransformerLayer(cfg, is_training=True)
        from nemo_tpu.models.llm.train import _moe_aux_total

        embed_partial = _make_embed_partial(Vloc, mult)
        head_fwd_bwd = _make_head_fwd_bwd(cfg, Vloc)

        def chunk_fwd(p_chunk, x, positions, key):
            """One virtual chunk's [Lc] layer slab → (y, moe_aux_sum)."""
            def body(carry, xs):
                p_layer, li = xs
                k = jax.random.fold_in(key, li)
                if moe:
                    (y, _), mut = layer.apply(
                        {"params": p_layer}, carry, positions,
                        rngs={"dropout": k}, mutable=["losses"])
                    aux = _moe_aux_total(mut.get("losses", {}))
                else:
                    y, _ = layer.apply({"params": p_layer}, carry, positions,
                                       rngs={"dropout": k})
                    aux = jnp.zeros((), jnp.float32)
                return y, aux

            y, auxs = jax.lax.scan(body, x, (p_chunk, jnp.arange(Lc)))
            return y, jnp.sum(auxs)

        chunk_fwd = jax.checkpoint(chunk_fwd, prevent_cse=False,
                                   static_argnums=())

        def pipe(p_local, emb_local, w_head_local, norm_p,
                 tokens, labels, mask, positions, rng, inv_n):
            stage = jax.lax.axis_index("pp")
            n_micro, B, S = tokens.shape
            D = emb_local.shape[1]
            # last event: backward of (device 0, chunk 0, m=n_micro−1)
            T = (C + (pp - 1) + (V - 1) * pp
                 + ((n_micro - 1) // pp) * C + (n_micro - 1) % pp + 1)
            fwd_perm = [(i, (i + 1) % pp) for i in range(pp)]
            bwd_perm = [(i, (i - 1) % pp) for i in range(pp)]
            idx_in = lambda a, i: jax.lax.dynamic_index_in_dim(a, i, 0, False)

            # per-device params: storage order is device-major → local
            # [V·Lc, ...]; reshape to [V, Lc, ...] chunk slabs
            p_ch = jax.tree.map(
                lambda a: a.reshape((V, Lc) + a.shape[1:]), p_local)

            zeros_act = jnp.zeros((B, S, D), cdtype)
            carry0 = (
                zeros_act,                                   # act_in
                zeros_act,                                   # grad_in
                jnp.zeros((V, BUF, B, S, D), cdtype),        # xbuf
                jax.tree.map(jnp.zeros_like, p_ch),          # gacc
                jnp.zeros_like(emb_local),                   # g_emb
                jnp.zeros_like(w_head_local),                # g_head
                jax.tree.map(jnp.zeros_like, norm_p),        # g_norm
                jnp.zeros((), jnp.float32),                  # Σ nll
                jnp.zeros((), jnp.float32),                  # Σ moe aux
            )

            def decomp_fwd(tau):
                g = tau // C
                rem = tau % C
                k = rem // pp
                m = g * pp + rem % pp
                return k, m

            def decomp_bwd(sigma):
                g = sigma // C
                rem = sigma % C
                k = V - 1 - rem // pp
                m = g * pp + rem % pp
                return k, m

            def tick(c, t):
                act_in, grad_in, xbuf, gacc, g_emb, g_head, g_norm, nll, aux = c
                # ---- forward unit of this device
                tau = t - stage
                k_f, m_f = decomp_fwd(tau)
                do_f = (tau >= 0) & (m_f >= 0) & (m_f < n_micro)
                k_f_c = jnp.clip(k_f, 0, V - 1)
                m_f_c = jnp.clip(m_f, 0, n_micro - 1)
                # embedding feed: device 0's forward unit uses τ = t
                k0_f, m0_f = decomp_fwd(t)
                m0_f_c = jnp.clip(m0_f, 0, n_micro - 1)
                part = embed_partial(emb_local, idx_in(tokens, m0_f_c), stage)
                feed = jax.lax.psum(part.astype(jnp.float32), "pp").astype(cdtype)
                x = jnp.where((stage == 0) & (k_f_c == 0), feed, act_in)
                # save the chunk input for the backward recompute
                slot_f = m_f_c % BUF
                cur = xbuf[k_f_c, slot_f]
                xbuf = xbuf.at[k_f_c, slot_f].set(jnp.where(do_f, x, cur))
                pf = jax.tree.map(lambda a: idx_in(a, k_f_c), p_ch)
                v_f = k_f_c * pp + stage  # global virtual stage
                key_f = jax.random.fold_in(jax.random.fold_in(rng, m_f_c), v_f)
                y, aux_f = chunk_fwd(pf, x, positions, key_f)
                aux = aux + jnp.where(do_f, aux_f, 0.0)
                y_send = jax.lax.ppermute(y, "pp", fwd_perm)
                # ---- backward unit of this device
                sigma = t - C - (pp - 1 - stage)
                k_b, m_b = decomp_bwd(sigma)
                do_b = (sigma >= 0) & (m_b >= 0) & (m_b < n_micro)
                k_b_c = jnp.clip(k_b, 0, V - 1)
                m_b_c = jnp.clip(m_b, 0, n_micro - 1)
                x_saved = xbuf[k_b_c, m_b_c % BUF]
                pb_params = jax.tree.map(lambda a: idx_in(a, k_b_c), p_ch)
                v_b = k_b_c * pp + stage
                key_b = jax.random.fold_in(jax.random.fold_in(rng, m_b_c), v_b)
                (y_b, _), pb = jax.vjp(
                    lambda p, xx: chunk_fwd(p, xx, positions, key_b),
                    pb_params, x_saved)
                # head + CE inside the backward tick of the LAST virtual
                # chunk (device pp−1, k=V−1); its indices from τ = t − C
                sigL = t - C
                kL, mL = decomp_bwd(sigL)
                do_h = (sigL >= 0) & (kL == V - 1) & (mL >= 0) & (mL < n_micro)
                mL_c = jnp.clip(mL, 0, n_micro - 1)
                h = jax.lax.psum(
                    jnp.where(stage == pp - 1, y_b, 0).astype(jnp.float32),
                    "pp").astype(y_b.dtype)
                loss_t, d_h, d_w, d_norm = head_fwd_bwd(
                    w_head_local, norm_p, h, idx_in(labels, mL_c),
                    idx_in(mask, mL_c), inv_n)
                nll = nll + jnp.where(do_h, loss_t, 0.0)
                gate_h = jnp.where(do_h, 1.0, 0.0)
                g_head = g_head + d_w * gate_h
                g_norm = jax.tree.map(
                    lambda a, b: a + b * gate_h, g_norm, d_norm)
                g_in = jnp.where((stage == pp - 1) & (k_b_c == V - 1),
                                 d_h.astype(cdtype), grad_in)
                gp, gx = pb((g_in, jnp.asarray(1.0 / n_micro, jnp.float32)))
                gate_b = jnp.where(do_b, 1.0, 0.0)
                gacc = jax.tree.map(
                    lambda acc, g: jax.lax.dynamic_update_index_in_dim(
                        acc, idx_in(acc, k_b_c) + g * gate_b, k_b_c, 0),
                    gacc, gp)
                gx_send = jax.lax.ppermute(gx * gate_b, "pp", bwd_perm)
                # ---- embedding backward: device 0's unit is (chunk 0, m)
                sig0 = t - C - (pp - 1)
                k0_b, m0_b = decomp_bwd(sig0)
                do_e = (sig0 >= 0) & (k0_b == 0) & (m0_b >= 0) & (m0_b < n_micro)
                m0_b_c = jnp.clip(m0_b, 0, n_micro - 1)
                ct = jax.lax.psum(
                    jnp.where(stage == 0, gx, 0).astype(jnp.float32), "pp")
                tok_b = idx_in(tokens, m0_b_c)
                ib = tok_b - stage * Vloc
                okb = (ib >= 0) & (ib < Vloc) & do_e
                upd = jnp.where(okb[..., None], ct * mult, 0.0)
                g_emb = g_emb.at[jnp.clip(ib, 0, Vloc - 1).reshape(-1)].add(
                    upd.reshape(-1, D).astype(g_emb.dtype))
                return (y_send, gx_send, xbuf, gacc, g_emb, g_head, g_norm,
                        nll, aux), None

            c, _ = jax.lax.scan(tick, carry0, jnp.arange(T))
            _, _, _, gacc, g_emb, g_head, g_norm, nll, aux = c
            aux_total = jax.lax.psum(aux, "pp") / n_micro
            loss = nll * inv_n + aux_total
            # back to storage-order [V·Lc] for the pp-sharded out_spec
            g_layers = jax.tree.map(
                lambda a: a.reshape((V * Lc,) + a.shape[2:]), gacc)
            return loss, g_layers, g_emb, g_head, g_norm

        p_spec = P("pp")
        pipe_sm = jax.shard_map(
            pipe,
            mesh=mesh,
            in_specs=(p_spec, P("pp", None), P("pp", None), P(),
                      P(), P(), P(), P(), P(), P()),
            out_specs=(P(), p_spec, P("pp", None), P("pp", None), P()),
            axis_names={"pp"},
            check_vma=False,
        )

        def run(params, tokens, labels, mask, positions, rng):
            if tied:
                w_head = params["embedding"]
            else:
                w_head = params["lm_head"]["kernel"].T
            mask32 = mask.astype(jnp.float32)
            inv_n = 1.0 / jnp.maximum(jnp.sum(mask32), 1.0)
            loss, g_layers, g_emb, g_head, g_norm = pipe_sm(
                params["layers"], params["embedding"], w_head,
                params["final_norm"], tokens, labels, mask32, positions,
                rng, inv_n)
            grads = jax.tree.map(jnp.zeros_like, params)
            grads["layers"] = g_layers
            grads["final_norm"] = g_norm
            if tied:
                grads["embedding"] = g_emb + g_head
            else:
                grads["embedding"] = g_emb
                grads["lm_head"] = {"kernel": g_head.T}
            return loss, grads

        return run

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

            if self.schedule in ("1f1b", "interleaved"):
                pipe_run = (self._pipe_1f1b_fn() if self.schedule == "1f1b"
                            else self._pipe_interleaved_fn())
                cfg = self.cfg

                def step(state, batch, rng):
                    tokens = batch["tokens"]
                    mask = batch.get("loss_mask")
                    if mask is None:
                        mask = jnp.ones(tokens.shape, jnp.float32)
                    S = tokens.shape[-1]
                    positions = jnp.arange(S)[None, :].repeat(tokens.shape[1], 0)
                    loss, grads = pipe_run(
                        state.params, tokens, batch["labels"], mask,
                        positions, rng)
                    updates, new_opt = optimizer.update(
                        grads, state.opt_state, state.params)
                    new_params = optax.apply_updates(state.params, updates)
                    metrics = {"loss": loss,
                               "grad_norm": optax.global_norm(grads)}
                    return TrainState(step=state.step + 1, params=new_params,
                                      opt_state=new_opt), metrics

                with jax.set_mesh(self.mesh):
                    rep = NamedSharding(self.mesh, P())
                    self._jit_cache = jax.jit(
                        step, in_shardings=(shardings, None, rep),
                        out_shardings=(shardings, None), donate_argnums=(0,))
                return self._jit_cache

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
            if self.schedule in ("1f1b", "interleaved"):
                if rng is None:
                    rng = jax.random.PRNGKey(0)
                return step(state, batch, rng)
            return step(state, batch)


def _make_embed_partial(Vloc: int, mult: float):
    def embed_partial(emb_local, tokens, stage):
        """This stage's vocab-shard contribution to the token embedding
        (psum over pp completes the lookup)."""
        idx = tokens - stage * Vloc
        ok = (idx >= 0) & (idx < Vloc)
        part = jnp.take(emb_local, jnp.clip(idx, 0, Vloc - 1), axis=0)
        return jnp.where(ok[..., None], part, 0.0) * mult

    return embed_partial


def _make_head_fwd_bwd(cfg: GPTConfig, Vloc: int):
    def head_fwd_bwd(w_local, norm_p, h, labels, mask, inv_n):
        """Vocab-parallel (over pp) final-norm + LM head + masked CE,
        forward AND analytic backward in one place. h [B,S,D] is
        replicated across pp; w_local [Vloc, D] is this stage's vocab
        shard. Returns (Σ nll, dL/dh, dL/dw_local, dL/dnorm) where the
        d-seeds are pre-scaled by inv_n (grads of the MEAN loss)."""
        hn = _apply_final_norm(cfg, norm_p, h)
        hn32 = hn.astype(jnp.float32)
        w32 = w_local.astype(jnp.float32)
        logits = jnp.einsum("bsd,vd->bsv", hn32, w32)
        if cfg.logit_softcapping:
            cap = cfg.logit_softcapping
            tl = jnp.tanh(logits / cap)
            logits_c = cap * tl
        else:
            logits_c = logits
        m = jax.lax.stop_gradient(
            jax.lax.pmax(jnp.max(logits_c, -1), "pp"))
        ex = jnp.exp(logits_c - m[..., None])
        se = jax.lax.psum(jnp.sum(ex, -1), "pp")
        lse = jnp.log(se) + m
        stage = jax.lax.axis_index("pp")
        li = labels - stage * Vloc
        ok = (li >= 0) & (li < Vloc)
        lic = jnp.clip(li, 0, Vloc - 1)
        ll_loc = jnp.take_along_axis(logits_c, lic[..., None], -1)[..., 0]
        ll = jax.lax.psum(jnp.where(ok, ll_loc, 0.0), "pp")
        mask32 = mask.astype(jnp.float32)
        loss_sum = jnp.sum((lse - ll) * mask32)
        # ---- analytic backward (cotangent of mean loss = 1)
        p = ex / se[..., None]
        onehot = ok[..., None] & (jnp.arange(Vloc)[None, None, :] == lic[..., None])
        d_logits = (p - onehot.astype(p.dtype)) * (mask32 * inv_n)[..., None]
        if cfg.logit_softcapping:
            d_logits = d_logits * (1.0 - tl * tl)
        d_hn = jax.lax.psum(
            jnp.einsum("bsv,vd->bsd", d_logits, w32), "pp")
        d_w = jnp.einsum("bsv,bsd->vd", d_logits, hn32).astype(w_local.dtype)
        _, norm_pb = jax.vjp(
            lambda np_, hh: _apply_final_norm(cfg, np_, hh), norm_p, h)
        d_norm, d_h = norm_pb(d_hn.astype(hn.dtype))
        return loss_sum, d_h, d_w, d_norm

    return head_fwd_bwd


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
