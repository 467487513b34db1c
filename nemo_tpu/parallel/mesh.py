"""Device mesh + sharding rules: the TPU replacement for process groups.

Reference parity: MegatronStrategy's ParallelismConfig
(`nemo/lightning/pytorch/strategies/megatron_strategy.py:104-134` — TP/PP/
CP/SP/EP/DP sizes → NCCL process groups). On TPU there are no process
groups: one `jax.sharding.Mesh` with named axes replaces them (SURVEY.md
§2.10/§5.8), and XLA emits ICI/DCN collectives from sharding annotations.

Axes:
  dp    — pure data parallel (params replicated)
  fsdp  — data parallel with fully-sharded params/optimizer (ZeRO-3/
          distributed-optimizer equivalent)
  cp    — context/sequence parallel (ring attention axis)
  tp    — tensor parallel (heads/mlp/vocab sharding; Megatron TP+SP)
  ep    — expert parallel (MoE experts axis; reuses tp slot by grouping)

Logical-axis rules map parameter/activation logical names to mesh axes, in
flax.linen.spmd style.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Parallelism sizes. Product must equal the device count (dp is inferred
    when left at -1).

    Multi-slice (DCN) scaling: `dcn_dp`/`dcn_pp` declare how many TPU
    slices the job spans and which axis crosses the slice boundary —
    the reference's multi-node NCCL DP/PP (SURVEY §5.8: "DCN via
    multi-slice mesh axes"). `dp`/`pp` etc. remain the WITHIN-slice (ICI)
    sizes; the built mesh exposes combined axes (dp_total = dcn_dp·dp)
    laid out slice-major, so gradient all-reduces split into a fast ICI
    phase and one DCN phase while tp/fsdp/cp collectives never leave a
    slice."""

    dp: int = -1
    fsdp: int = 1
    cp: int = 1
    ep: int = 1
    tp: int = 1
    pp: int = 1  # pipeline stages (parallel/pipeline.py shard_map schedule)
    dcn_dp: int = 1  # data-parallel replicas across slices (DCN)
    dcn_pp: int = 1  # pipeline stages across slices (DCN)

    def resolved(self, n_devices: int) -> "MeshConfig":
        dcn = self.dcn_dp * self.dcn_pp
        known = self.fsdp * self.cp * self.ep * self.tp * self.pp * dcn
        dp = self.dp
        if dp == -1:
            if n_devices % known:
                raise ValueError(
                    f"{n_devices} devices not divisible by "
                    f"fsdp*cp*ep*tp*pp*dcn={known}"
                )
            dp = n_devices // known
        if dp * known != n_devices:
            raise ValueError(
                f"mesh {dp}x{self.fsdp}x{self.cp}x{self.ep}x{self.tp}"
                f"x{self.pp} (dcn {self.dcn_dp}x{self.dcn_pp}) != "
                f"{n_devices} devices"
            )
        return dataclasses.replace(self, dp=dp)


AXIS_NAMES = ("pp", "dp", "fsdp", "cp", "ep", "tp")


def make_mesh(cfg: MeshConfig, devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    cfg = cfg.resolved(len(devices))
    if cfg.dcn_dp * cfg.dcn_pp > 1:
        # Slice-major hybrid layout: devices grouped by slice (real TPUs
        # carry slice_index; virtual/CPU fall back to contiguous blocks of
        # equal size), then the slice grid lands as the OUTER stride of the
        # pp/dp axes. Inner-dim collectives (tp/fsdp/cp/ep, within-slice
        # dp/pp) stay on ICI; only the outermost pp/dp hops cross DCN —
        # the jax.experimental.mesh_utils.create_hybrid_device_mesh layout,
        # constructed directly so it also works on virtual device sets.
        if all(hasattr(d, "slice_index") for d in devices):
            devices = sorted(devices, key=lambda d: (d.slice_index, d.id))
        devs = np.array(devices).reshape(
            cfg.dcn_pp, cfg.dcn_dp,
            cfg.pp, cfg.dp, cfg.fsdp, cfg.cp, cfg.ep, cfg.tp)
        arr = devs.transpose(0, 2, 1, 3, 4, 5, 6, 7).reshape(
            cfg.dcn_pp * cfg.pp, cfg.dcn_dp * cfg.dp,
            cfg.fsdp, cfg.cp, cfg.ep, cfg.tp)
        return Mesh(arr, AXIS_NAMES)
    arr = np.array(devices).reshape(cfg.pp, cfg.dp, cfg.fsdp, cfg.cp, cfg.ep, cfg.tp)
    return Mesh(arr, AXIS_NAMES)


def default_axis_rules(sequence_parallel: bool = True):
    """Logical-axis → mesh-axis rules (flax.linen.spmd format).

    TP maps heads/mlp/vocab (Megatron column/row parallel equivalents);
    FSDP shards the embed dim of every weight; activations shard batch over
    (dp, fsdp) and sequence over cp. `act_seq_sp` is the RESIDUAL-stream
    sequence axis (between blocks / at norms): with sequence_parallel it
    also shards over tp — the Megatron-SP analog (`sequence_parallel`,
    megatron_strategy.py:247) — and XLA inserts the all-gather before the
    qkv/fc1 GEMMs and the reduce-scatter after o_proj/fc2. `act_seq` (used
    on attention-internal tensors, which shard heads over tp) stays on cp
    only. `qkv` maps to None on purpose: its sibling dims (heads/kv_heads)
    already take tp, and flax forbids reusing a mesh axis within one array.
    """
    return (
        ("batch", ("dp", "fsdp")),
        ("act_seq", "cp"),
        ("act_seq_sp", ("cp", "tp") if sequence_parallel else ("cp",)),
        ("act_embed", None),
        ("embed", "fsdp"),
        ("vocab", "tp"),
        ("heads", "tp"),
        ("kv_heads", "tp"),
        ("mlp", "tp"),
        ("qkv", None),
        ("layers", None),
        ("expert", "ep"),
    )


def shard_batch(batch, mesh: Mesh):
    """Place a host batch onto the mesh, sharded over (dp, fsdp) on dim 0."""
    spec = P(("dp", "fsdp"))
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(*([("dp", "fsdp")] + [None] * (x.ndim - 1))))),
        batch,
    )


def param_shardings(mesh: Mesh, abstract_params, rules=None):
    """Abstract params with logical-axis metadata → NamedShardings."""
    import flax.linen as nn

    rules = rules or default_axis_rules()
    return nn.logical_to_mesh_sharding(
        nn.get_partition_spec(abstract_params), mesh, rules
    )
