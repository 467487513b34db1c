"""Fused Pallas kernel for conformer 'striding' subsampling (×4).

The reference ConvSubsampling (subsampling.py:62) is two stride-2 3×3 convs
with ReLU. On TPU the first conv's output ([B, T/2, F/2, C] ≈ 2.5 GB bf16
for 8×30 s batches) dominates HBM traffic; XLA cannot fuse conv→relu→conv.
This kernel keeps conv1's output entirely in VMEM.

Mosaic has no strided vector loads, so ALL stride-2 indexing is removed by
pre-splitting the input into 4×4 row/col parity streams outside the kernel
(a cheap reshape of the small [B,T,F] input). Inside the kernel:
- conv1 (1 input channel) = 9 shift-multiply-accumulate terms per output
  parity, computed directly in (row-parity × col-parity) split layout;
- conv2 = im2col concat over the 4 parity tensors → ONE MXU GEMM
  [bt·F4, 9C] × [9C, C];
- + bias + ReLU fused; only the final [B, T/4, F4·C] block hits HBM.

Numerics match nn.Conv(k=3, s=2, p=1) chains exactly (tested). STATUS:
experimental — currently at parity with the XLA conv pair on v5e (the 9
skinny accumulated GEMMs stall the MXU; fusing them needs Mosaic concat
support on offset slices). Not wired into ConvSubsampling by default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x4_hbm, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, xs_ref, sem,
            *, bt2: int, F4: int, Fq: int, C: int, T2: int, F2v: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    rows = bt2 + 2
    dma = pltpu.make_async_copy(
        x4_hbm.at[b, pl.ds(i * bt2, rows)], xs_ref, sem
    )
    dma.start()
    dma.wait()
    # xs_ref: [rows, 16, Fq] — stream s = 4*row_par + col_par at dim 1

    # conv1 in parity-split layout:
    # out1[pr][pc][a, g, c] = relu(b1 + Σ_{di,df}
    #     x[row_stream (2pr+di)%4, a+(2pr+di)//4, col_stream (2pc+df)%4,
    #       g+(2pc+df)//4] · w1[di, df, c])
    n_a = bt2 + 1  # conv1 parity rows needed (covers conv2's +1 halo)
    n_g = F4 + 2   # conv1 parity cols (g_loc = g + 1: covers conv2's ±1 halo)
    out1 = {}
    for pr in range(2):
        for pc in range(2):
            acc = jnp.zeros((n_a, n_g, C), jnp.float32)
            for di in range(3):
                for df in range(3):
                    u, v = 2 * pr + di, 2 * pc + df
                    xs = xs_ref[
                        pl.ds(u // 4, n_a), 4 * (u % 4) + (v % 4),
                        pl.ds(v // 4, n_g),
                    ]
                    acc = acc + xs.astype(jnp.float32)[..., None] * w1_ref[di, df].astype(jnp.float32)[None, None, :]
            acc = jnp.maximum(acc + b1_ref[:][None, None, :], 0.0)
            # zero conv1 cells outside the valid output range (they form
            # conv2's zero padding): rows t1 = 2(bt2·i+a)+pr−1 ∈ [0, T2);
            # cols f1 = 2·g_loc+pc−2 ∈ [0, F2) with F2 = 2·F4 (F even) or
            # F2 = 2·F4−1; use the true F2 = (F−1)//2+1 via closure
            t1 = (2 * bt2 * i - 1 + pr
                  + 2 * jax.lax.broadcasted_iota(jnp.int32, (n_a, 1, 1), 0))
            f1 = (pc - 2
                  + 2 * jax.lax.broadcasted_iota(jnp.int32, (1, n_g, 1), 1))
            valid = (t1 >= 0) & (t1 < T2) & (f1 >= 0) & (f1 < F2v)
            out1[(pr, pc)] = jnp.where(valid, acc, 0.0)

    # conv2: out2[r', g'] needs conv1 (t1 = 2r'+di−1 ↔ (pr,a), f1 = 2g'+df−1
    # ↔ (pc, g_loc)); row table di→(pr,a_off), col table df→(pc,g_off in g_loc)
    row_tab = {0: (0, 0), 1: (1, 0), 2: (0, 1)}
    col_tab = {0: (1, 0), 1: (0, 1), 2: (1, 1)}
    out2 = jnp.zeros((bt2 * F4, C), jnp.float32)
    for di in range(3):
        for df in range(3):
            pr, a_off = row_tab[di]
            pc, g_off = col_tab[df]
            sl = out1[(pr, pc)][a_off : a_off + bt2, g_off : g_off + F4, :]
            out2 = out2 + jax.lax.dot_general(
                sl.reshape(bt2 * F4, C).astype(jnp.bfloat16),
                w2_ref[di, df].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
    out2 = jnp.maximum(out2 + b2_ref[:][None, :], 0.0)
    o_ref[0] = out2.reshape(bt2, F4 * C).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_t",))
def fused_subsampling_x4(
    x: jnp.ndarray,  # [B, T, F]
    w1: jnp.ndarray,  # [3, 3, 1, C]
    b1: jnp.ndarray,  # [C]
    w2: jnp.ndarray,  # [3, 3, C, C]
    b2: jnp.ndarray,  # [C]
    block_t: int = 32,
) -> jnp.ndarray:
    """→ [B, T4, F4·C] (flattened like ConvSubsampling's reshape)."""
    B, T, F = x.shape
    C = w1.shape[-1]
    T2 = (T - 1) // 2 + 1
    T4 = (T2 - 1) // 2 + 1
    F2 = (F - 1) // 2 + 1
    F4 = (F2 - 1) // 2 + 1
    bt2 = min(block_t, T4)
    n_blocks = -(-T4 // bt2)
    Tp4 = n_blocks * bt2

    # pad: rows 3 left (conv1 pad 1 ∘ conv2 pad 1 at stride 2), cols 5 left
    # (1 conv1 pad + 4 so the g_loc=g+1 halo column stays in-stream);
    # sizes rounded so the mod-4 parity reshape is exact with block halo
    rows_needed = 4 * (Tp4 + 2)
    Fq = max(((F4 + 3 + 127) // 128) * 128, 128)  # lane-aligned for DMA
    cols_needed = 4 * Fq
    xp = jnp.pad(x, ((0, 0), (3, rows_needed - 3 - T), (5, cols_needed - 5 - F)))
    # [B, R4, 4, Q4, 4] → [B, R4, 16, Q4] with stream = 4·row_par + col_par
    x4 = xp.reshape(B, rows_needed // 4, 4, Fq, 4)
    x4 = jnp.transpose(x4, (0, 1, 2, 4, 3)).reshape(B, rows_needed // 4, 16, Fq)

    kernel = functools.partial(_kernel, bt2=bt2, F4=F4, Fq=Fq, C=C, T2=T2, F2v=F2)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Tp4, F4 * C), x.dtype),
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # HBM; DMA'd with halo
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bt2, F4 * C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bt2 + 2, 16, Fq), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(x4, w1[:, :, 0, :], b1, w2, b2)
    return out[:, :T4]
