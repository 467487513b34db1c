"""Mamba2 (SSD) mixer + hybrid attention/mamba/MLP stack, TPU-native.

Reference parity: `nemo/collections/llm/gpt/model/ssm.py` (SSMConfig,
NemotronH/mamba2 hybrid families backed by megatron's mamba_block) and
HF `modeling_mamba2.py` semantics (in_proj [z|xBC|dt] layout, causal
depthwise conv, softplus dt, gated RMSNorm, D skip).

TPU-first design: the selective-state-space recurrence runs in the
*chunked SSD* formulation — intra-chunk work is batched matmuls
(C·Bᵀ ⊙ decay) that ride the MXU, and the inter-chunk state handoff is a
`lax.scan` over chunk boundaries (seq_len/chunk_size steps). No per-token
scan, no torch-style python loops; everything is static-shaped for XLA.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nemo_tpu.models.llm.config import GPTConfig


@dataclasses.dataclass(frozen=True)
class SSMConfig:
    """Mamba2 / hybrid model config (reference: ssm.py SSMConfig +
    HF Mamba2Config field names)."""

    num_layers: int = 2
    hidden_size: int = 64
    vocab_size: int = 128
    seq_length: int = 128
    # mamba mixer
    num_heads: int = 8
    head_dim: int = 8  # d_inner = num_heads * head_dim
    n_groups: int = 2
    state_size: int = 16
    conv_kernel: int = 4
    chunk_size: int = 64
    layernorm_epsilon: float = 1e-5
    time_step_limit: Tuple[float, float] = (0.0, float("inf"))
    use_conv_bias: bool = True
    share_embeddings_and_output_weights: bool = True
    # hybrid layout: one char per layer — 'M' mamba, '*' attention, '-' MLP.
    # None → all-'M' (pure mamba2). Reference: NemotronH hybrid_override_pattern.
    hybrid_override_pattern: Optional[str] = None
    # attention/MLP blocks ('*','-') are configured by this sub-config
    attn: Optional[GPTConfig] = None
    init_method_std: float = 0.02
    compute_dtype: str = "float32"

    @property
    def d_inner(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def conv_dim(self) -> int:
        return self.d_inner + 2 * self.n_groups * self.state_size

    def pattern(self) -> str:
        return self.hybrid_override_pattern or "M" * self.num_layers


def _segsum(a: jnp.ndarray) -> jnp.ndarray:
    """Lower-triangular pairwise cumulative sums: out[..., t, s] =
    sum(a[..., s+1:t+1]), -inf above the diagonal."""
    T = a.shape[-1]
    cum = jnp.cumsum(a, axis=-1)
    d = cum[..., :, None] - cum[..., None, :]
    mask = jnp.tril(jnp.ones((T, T), bool))
    return jnp.where(mask, d, -jnp.inf)


def ssd_chunked(x, dt, A, B, C, D, chunk: int, prev_state=None):
    """Chunked SSD (Mamba-2): recurrence h_t = exp(dt_t·A) h_{t-1} + dt_t·B_t⊗x_t,
    y_t = C_t·h_t + D·x_t.

    x: [b,T,h,p]; dt: [b,T,h] (post-softplus); A: [h] (negative);
    B,C: [b,T,h,n] (already head-broadcast); D: [h].
    Returns (y [b,T,h,p], final_state [b,h,p,n]).
    T must be a multiple of `chunk` (pad upstream)."""
    b, T, h, p = x.shape
    n = B.shape[-1]
    c = T // chunk
    xd = x * dt[..., None]  # discretized input
    dA = dt * A  # [b,T,h]

    def r(t, last=()):  # [b,T,...] → [b,c,chunk,...]
        return t.reshape((b, c, chunk) + t.shape[2:])

    xd, dAc, Bc, Cc = r(xd), r(dA), r(B), r(C)
    Acum = jnp.cumsum(dAc, axis=2)  # [b,c,q,h]

    # intra-chunk (diagonal blocks): masked "attention" matmuls
    L = jnp.exp(_segsum(jnp.moveaxis(dAc, -1, 2)))  # [b,c,h,q,q]
    G = jnp.einsum("bcqhn,bcshn->bchqs", Cc, Bc)
    M = G * L
    Y_diag = jnp.einsum("bchqs,bcshp->bcqhp", M, xd)

    # per-chunk input→state contribution
    decay_states = jnp.exp(Acum[:, :, -1:, :] - Acum)  # [b,c,q,h]
    S = jnp.einsum("bcqhn,bcqh,bcqhp->bchpn", Bc, decay_states, xd)

    # inter-chunk recurrence over chunk boundaries (lax.scan, c steps)
    A_tot = jnp.exp(Acum[:, :, -1, :])  # [b,c,h]
    if prev_state is None:
        prev_state = jnp.zeros((b, h, p, n), S.dtype)

    def step(hstate, inp):
        a_c, s_c = inp  # [b,h], [b,h,p,n]
        new = hstate * a_c[..., None, None] + s_c
        return new, hstate  # emit the state at the *start* of the chunk

    final, h0 = jax.lax.scan(step, prev_state,
                             (jnp.moveaxis(A_tot, 1, 0), jnp.moveaxis(S, 1, 0)))
    h0 = jnp.moveaxis(h0, 0, 1)  # [b,c,h,p,n]

    # state → output within each chunk
    Y_off = jnp.einsum("bcqhn,bchpn,bcqh->bcqhp", Cc, h0, jnp.exp(Acum))
    y = (Y_diag + Y_off).reshape(b, T, h, p) + x * D[None, None, :, None]
    return y, final


class Mamba2Mixer(nn.Module):
    """HF-parity Mamba2 mixer; one fused in_proj → [z | x,B,C | dt],
    causal depthwise conv+silu on [x,B,C], chunked SSD, gated RMSNorm.

    Decode (reference: the mamba inference wrapper's recurrent mode):
    pass `state=(conv_buf [b,K-1,conv_dim], h [b,H,p,n])` — T==1 runs the
    O(1) single-step recurrence h_t = exp(dt·A)·h_{t-1} + (dt·x_t)⊗B_t,
    T>1 (prefill) runs the chunked SSD and hands back the final state.
    `mask` [b,T] zeroes dt/x at left-pad rows so padded prompts leave the
    state untouched. With `state`, returns (y, new_state)."""

    cfg: SSMConfig

    @nn.compact
    def __call__(self, u, state=None, mask=None):
        cfg = self.cfg
        bsz, T, Dm = u.shape
        di, g, n, H, p = cfg.d_inner, cfg.n_groups, cfg.state_size, cfg.num_heads, cfg.head_dim
        proj = nn.DenseGeneral(
            features=2 * di + 2 * g * n + H, use_bias=False, dtype=u.dtype,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.normal(cfg.init_method_std), ("embed", "mlp")),
            name="in_proj")(u)
        z, xBC_raw, dt = jnp.split(proj, [di, di + cfg.conv_dim], axis=-1)
        if mask is not None:
            xBC_raw = xBC_raw * mask[..., None].astype(xBC_raw.dtype)

        # causal depthwise conv over time (conv state = last K-1 raw inputs)
        K = cfg.conv_kernel
        w = self.param("conv_kernel",
                       nn.with_logical_partitioning(
                           nn.initializers.lecun_normal(), (None, "mlp")),
                       (K, cfg.conv_dim), jnp.float32)
        cb = None
        if cfg.use_conv_bias:
            cb = self.param("conv_bias",
                            nn.with_logical_partitioning(nn.initializers.zeros, ("mlp",)),
                            (cfg.conv_dim,), jnp.float32)
        step = state is not None and T == 1
        if step:
            conv_buf, h_prev = state
            win = jnp.concatenate(
                [conv_buf.astype(xBC_raw.dtype), xBC_raw], axis=1)  # [b,K,c]
            conv = jnp.einsum("bkc,kc->bc", win.astype(jnp.float32), w)[:, None]
            new_conv_buf = win[:, 1:]
        else:
            xBC_pad = jnp.pad(xBC_raw, ((0, 0), (K - 1, 0), (0, 0)))
            if state is not None:
                new_conv_buf = xBC_pad[:, T:, :]  # last K-1 raw inputs
            conv = jax.lax.conv_general_dilated(
                xBC_pad.astype(jnp.float32), w[:, None, :],
                window_strides=(1,), padding="VALID",
                dimension_numbers=("NWC", "WIO", "NWC"),
                feature_group_count=cfg.conv_dim)
        if cb is not None:
            conv = conv + cb
        xBC = nn.silu(conv).astype(u.dtype)

        x, B, C = jnp.split(xBC, [di, di + g * n], axis=-1)
        x = x.reshape(bsz, T, H, p).astype(jnp.float32)
        B = B.reshape(bsz, T, g, n).astype(jnp.float32)
        C = C.reshape(bsz, T, g, n).astype(jnp.float32)
        B = jnp.repeat(B, H // g, axis=2)
        C = jnp.repeat(C, H // g, axis=2)

        dt_bias = self.param("dt_bias",
                             nn.with_logical_partitioning(nn.initializers.zeros, (None,)),
                             (H,), jnp.float32)
        A_log = self.param("A_log",
                           nn.with_logical_partitioning(
                               lambda key, shape, dtype: jnp.log(
                                   jnp.arange(1, shape[0] + 1, dtype=jnp.float32)),
                               (None,)),
                           (H,), jnp.float32)
        Dskip = self.param("D",
                           nn.with_logical_partitioning(nn.initializers.ones, (None,)),
                           (H,), jnp.float32)
        dt = jax.nn.softplus(dt.astype(jnp.float32) + dt_bias)
        lo, hi = cfg.time_step_limit
        if lo > 0.0 or np.isfinite(hi):
            dt = jnp.clip(dt, lo, hi)
        if mask is not None:
            # pad rows: no decay, no input
            dt = dt * mask[..., None].astype(jnp.float32)
        A = -jnp.exp(A_log)

        if step:
            # h_t = exp(dt·A) h_{t-1} + (dt·x)⊗B ; y = C·h_t + D·x
            dt1 = dt[:, 0]  # [b,H]
            dA = jnp.exp(dt1 * A)  # [b,H]
            xd = x[:, 0] * dt1[..., None]  # [b,H,p]
            h_new = (h_prev * dA[..., None, None]
                     + xd[..., None] * B[:, 0, :, None, :])  # [b,H,p,n]
            y = jnp.einsum("bhn,bhpn->bhp", C[:, 0], h_new)
            y = (y + x[:, 0] * Dskip[None, :, None]).reshape(bsz, 1, di)
            new_state = (new_conv_buf, h_new)
        else:
            # pad T to a chunk multiple (dt=0 tail: no decay, no state input)
            Q = cfg.chunk_size
            pad = (-T) % Q
            if pad:
                x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
                dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
                B = jnp.pad(B, ((0, 0), (0, pad), (0, 0), (0, 0)))
                C = jnp.pad(C, ((0, 0), (0, pad), (0, 0), (0, 0)))
            prev = state[1] if state is not None else None
            y, final = ssd_chunked(x, dt, A, B, C, Dskip, Q, prev_state=prev)
            y = y[:, :T].reshape(bsz, T, di)
            if state is not None:
                new_state = (new_conv_buf, final)

        # gated RMSNorm: norm(y * silu(z)) * scale
        scale = self.param("norm_scale",
                           nn.with_logical_partitioning(nn.initializers.ones, ("mlp",)),
                           (di,), jnp.float32)
        y = y * nn.silu(z.astype(jnp.float32))
        var = jnp.mean(jnp.square(y), axis=-1, keepdims=True)
        y = (y * jax.lax.rsqrt(var + 1e-5) * scale).astype(u.dtype)

        out = nn.DenseGeneral(
            features=Dm, use_bias=False, dtype=u.dtype,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.normal(cfg.init_method_std), ("mlp", "embed")),
            name="out_proj")(y)
        if state is not None:
            return out, new_state
        return out


class _RMS(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale",
                           nn.with_logical_partitioning(nn.initializers.ones, ("act_embed",)),
                           (x.shape[-1],), jnp.float32)
        x32 = x.astype(jnp.float32)
        y = x32 * jax.lax.rsqrt(jnp.mean(jnp.square(x32), -1, keepdims=True) + self.eps)
        return (y * scale).astype(x.dtype)


class SSMModel(nn.Module):
    """Pure-mamba2 or hybrid (pattern) causal LM.

    'M' layers: pre-norm Mamba2Mixer residual. '*': pre-norm GPT attention.
    '-': pre-norm GPT MLP. Attention/MLP blocks read cfg.attn (a GPTConfig).

    Stateful generation (the mamba serving win — O(1) memory and FLOPs
    per decoded token instead of re-running the prefix): pass
    `states=init_ssm_states(cfg, B, total)`; 'M' entries carry
    (conv_buf, h), '*' entries carry a KV cache written at decode_index
    (kv_valid masks attendable slots), '-' entries are None. Returns
    (logits, new_states). `mask` [B,S] marks real prompt tokens during a
    left-padded prefill."""

    cfg: SSMConfig

    @nn.compact
    def __call__(self, tokens, positions=None, *, train=False, states=None,
                 decode_index=None, kv_valid=None, mask=None):
        from nemo_tpu.models.llm.gpt import MLP, Attention

        cfg = self.cfg
        dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[cfg.compute_dtype]
        Bsz, S = tokens.shape
        if positions is None:
            positions = jnp.arange(S)[None, :].repeat(Bsz, 0)
        embed = self.param(
            "embedding",
            nn.with_logical_partitioning(
                nn.initializers.normal(cfg.init_method_std), ("vocab", "embed")),
            (cfg.vocab_size, cfg.hidden_size), jnp.float32)
        x = jnp.take(embed, tokens, axis=0).astype(dtype)
        pat = cfg.pattern()
        assert len(pat) == cfg.num_layers, "pattern length must equal num_layers"
        acfg = cfg.attn
        new_states = [] if states is not None else None
        for i, ch in enumerate(pat):
            h = _RMS(cfg.layernorm_epsilon, name=f"norm{i}")(x)
            if ch == "M":
                mixer = Mamba2Mixer(cfg, name=f"mixer{i}")
                if states is not None:
                    out, st = mixer(h, state=states[i], mask=mask)
                    new_states.append(st)
                else:
                    out = mixer(h)
                x = x + out
            elif ch == "*":
                out, kv = Attention(acfg, name=f"attention{i}")(
                    h, positions,
                    kv_cache=None if states is None else states[i],
                    decode_index=decode_index, kv_valid=kv_valid,
                    train=train)
                if states is not None:
                    new_states.append(kv)
                x = x + out
            elif ch == "-":
                x = x + MLP(acfg, name=f"mlp{i}")(h, train=train)
                if states is not None:
                    new_states.append(None)
            else:
                raise ValueError(f"unknown pattern char {ch!r}")
        x = _RMS(cfg.layernorm_epsilon, name="norm_f")(x)
        if cfg.share_embeddings_and_output_weights:
            logits = jnp.einsum("bsd,vd->bsv", x, embed.astype(dtype))
        else:
            logits = nn.DenseGeneral(
                features=cfg.vocab_size, use_bias=False, dtype=dtype,
                kernel_init=nn.with_logical_partitioning(
                    nn.initializers.normal(cfg.init_method_std), ("embed", "vocab")),
                name="lm_head")(x)
        logits = logits.astype(jnp.float32)
        if states is not None:
            return logits, tuple(new_states)
        return logits


# --------------------------------------------------------------------------
# presets (reference: ssm.py + nemotron-h configs)
# --------------------------------------------------------------------------


def _mamba2(layers, hidden, heads, **kw) -> SSMConfig:
    d = dict(num_layers=layers, hidden_size=hidden, vocab_size=50288,
             seq_length=4096, num_heads=heads, head_dim=64, n_groups=1,
             state_size=128, chunk_size=256)
    d.update(kw)
    return SSMConfig(**d)


def mamba2_130m(**kw) -> SSMConfig:
    """(reference: recipes/mamba2_130m.py / ssm.py BaseMambaConfig130M)"""
    return _mamba2(24, 768, 24, **kw)


def mamba2_370m(**kw) -> SSMConfig:
    return _mamba2(48, 1024, 32, **kw)


def mamba2_780m(**kw) -> SSMConfig:
    return _mamba2(48, 1536, 48, **kw)


def mamba2_1_3b(**kw) -> SSMConfig:
    return _mamba2(48, 2048, 64, **kw)


def mamba2_2_7b(**kw) -> SSMConfig:
    return _mamba2(64, 2560, 80, **kw)


def mamba2_8b(**kw) -> SSMConfig:
    """(reference: NVIDIAMambaConfig8B — pure-mamba nemotron tokenizer/width)"""
    return _mamba2(56, 4096, 128, vocab_size=256000, n_groups=8, **kw)


# literal reference pattern (gpt/model/ssm.py NemotronHConfig4B/8B:994,1009
# — 52 blocks, attention every ~9th position, MLP interleave)
_NEMOTRON_H_52 = "M-M-M-M*-M-M-M-M-M*-M-M-M-M-M*-M-M-M-M-M*-M-M-M-M-M-"


def nemotron_h_8b(**kw) -> SSMConfig:
    """52-layer hybrid: the reference NemotronHConfig8B layout
    (gpt/model/ssm.py:1006 — hidden 4096, mamba_state_dim 128,
    ffn 21504, 32 attention heads / 8 KV groups)."""
    d = dict(num_layers=len(_NEMOTRON_H_52), hidden_size=4096,
             vocab_size=131072, seq_length=8192, num_heads=128, head_dim=64,
             n_groups=8, state_size=128, chunk_size=256,
             hybrid_override_pattern=_NEMOTRON_H_52,
             attn=GPTConfig(hidden_size=4096, num_attention_heads=32,
                            num_query_groups=8, ffn_hidden_size=21504,
                            gated_linear_unit=False, activation="squared_relu",
                            position_embedding_type="none"))
    d.update(kw)
    return SSMConfig(**d)


# --------------------------------------------------------------------------
# stateful generation (O(1)/token decode — the SSM serving advantage;
# reference: megatron mamba inference wrapper used by llm.generate)
# --------------------------------------------------------------------------


def _nemotron_h(pat: str, hidden: int, heads: int, attn_heads: int,
                kv_groups: int, ffn: int, state_size: int = 128,
                kv_channels=None, **kw) -> SSMConfig:
    d = dict(num_layers=len(pat), hidden_size=hidden, vocab_size=131072,
             seq_length=8192, num_heads=heads, head_dim=64, n_groups=8,
             state_size=state_size, chunk_size=256,
             hybrid_override_pattern=pat,
             attn=GPTConfig(hidden_size=hidden, num_attention_heads=attn_heads,
                            num_query_groups=kv_groups, ffn_hidden_size=ffn,
                            kv_channels=kv_channels,
                            gated_linear_unit=False, activation="squared_relu",
                            position_embedding_type="none"))
    d.update(kw)
    return SSMConfig(**d)


def nemotron_h_4b(**kw) -> SSMConfig:
    """(reference: gpt/model/ssm.py NemotronHConfig4B:991 — the same
    52-block pattern as the 8B, hidden 3072, mamba_num_heads 112,
    attention kv_channels 128, mamba_state_dim 128, ffn 12288)"""
    return _nemotron_h(_NEMOTRON_H_52, 3072, 112, 32, 8, 12288,
                       state_size=128, kv_channels=128, **kw)


# literal reference patterns (gpt/model/ssm.py:1021,1035) — NOT periodic
# repeats: the 47B has 8 attention blocks in an irregular arrangement
# (incl. the 'MM' doublet near the end), the 56B has 10 evenly spread
_NEMOTRON_H_47B = (
    "M-M-M-M-M-M-M-M-M*-M-M-M-M-M-M-M-M-M-M*-M-M-M-M-M*-M-M-M-M-M*-M-M-M-"
    "M-M-M-M---MM---M-M*-M-M-M-M-M-"
)
_NEMOTRON_H_56B = (
    "M-M-M-M*-M-M-M-M-M*-M-M-M-M-M*-M-M-M-M-M*-M-M-M-M-M*-M-M-M-M-M*-M-M-M-M-"
    "M*-M-M-M-M-M*-M-M-M-M-M*-M-M-M-M-M*-M-M-M-M-M-"
)


def nemotron_h_47b(**kw) -> SSMConfig:
    """(reference: NemotronHConfig47B:1018 — 98 blocks, hidden 8192,
    mamba_state_dim 256, ffn 30720, 64 attention heads)"""
    return _nemotron_h(_NEMOTRON_H_47B, 8192, 256, 64, 8, 30720,
                       state_size=256, **kw)


def nemotron_h_56b(**kw) -> SSMConfig:
    """(reference: NemotronHConfig56B:1032 — 118 blocks, hidden 8192,
    mamba_state_dim 256, ffn 32768, 64 attention heads)"""
    return _nemotron_h(_NEMOTRON_H_56B, 8192, 256, 64, 8, 32768,
                       state_size=256, **kw)


def mamba2_hybrid_8b(**kw) -> SSMConfig:
    """(reference ssm.py:951 NVIDIAMambaHybridConfig8B — 56 blocks in the
    literal irregular pattern, hidden 4096, ffn 16384, 32/8 attention
    heads, nemotron 256k vocab)"""
    pat = "M-M-M--M-M*-M-M-M-M--M*-M-M-M-M-M*--M-M-M-M-M*-M--M-M-M-"
    d = dict(num_layers=len(pat), hidden_size=4096, vocab_size=256000,
             seq_length=4096, num_heads=128, head_dim=64, n_groups=8,
             state_size=128, chunk_size=256, hybrid_override_pattern=pat,
             attn=GPTConfig(hidden_size=4096, num_attention_heads=32,
                            num_query_groups=8, ffn_hidden_size=16384,
                            gated_linear_unit=False,
                            activation="squared_relu",
                            position_embedding_type="none"))
    d.update(kw)
    return SSMConfig(**d)


def nemotron_nano_9b_v2(**kw) -> SSMConfig:
    """(reference ssm.py:1047 NemotronNano9Bv2 — 56 blocks, hidden 4480,
    mamba_num_heads 128 × head_dim 80, kv_channels 128, ffn 15680)"""
    pat = "M-M-M-MM-M-M-M*-M-M-M*-M-M-M-M*-M-M-M-M*-M-MM-M-M-M-M-M-"
    return _nemotron_h(pat, 4480, 128, 40, 8, 15680, state_size=128,
                       kv_channels=128, head_dim=80, **kw)


def nemotron_nano_12b_v2(**kw) -> SSMConfig:
    """(reference ssm.py:1062 NemotronNano12Bv2 — 62 blocks, hidden 5120,
    mamba_num_heads 128 × head_dim 80, kv_channels 128, ffn 20480)"""
    pat = ("M-M-M-M*-M-M-M-M*-M-M-M-M*-M-M-M-M*-M-M-M-M*-M-M-M-M*-"
           "M-M-M-M-")
    return _nemotron_h(pat, 5120, 128, 40, 8, 20480, state_size=128,
                       kv_channels=128, head_dim=80, **kw)


def init_ssm_states(cfg: SSMConfig, batch: int, total_len: int,
                    dtype=jnp.float32):
    """Per-layer decode states: 'M' → (conv_buf [B,K-1,conv_dim],
    h [B,H,p,n] fp32); '*' → KV cache pair [B,total,G,D]; '-' → None."""
    acfg = cfg.attn
    states = []
    for ch in cfg.pattern():
        if ch == "M":
            states.append((
                jnp.zeros((batch, cfg.conv_kernel - 1, cfg.conv_dim), dtype),
                jnp.zeros((batch, cfg.num_heads, cfg.head_dim,
                           cfg.state_size), jnp.float32)))
        elif ch == "*":
            G, D = acfg.n_kv_heads, acfg.head_dim
            states.append((
                jnp.zeros((batch, total_len, G, D), dtype),
                jnp.zeros((batch, total_len, G, D), dtype)))
        else:
            states.append(None)
    return tuple(states)


class SSMGenerationEngine:
    """Batched prefill + jitted recurrent decode loop for SSM/hybrid LMs.

    Same surface as GenerationEngine (left-padded prompts, one compiled
    program per (B, S_pad, max_new)), but per-step cost is O(state), not
    O(prefix): mamba layers advance their recurrence, hybrid attention
    layers read a KV cache."""

    def __init__(self, cfg: SSMConfig, params):
        self.cfg = cfg
        self.model = SSMModel(cfg)
        self.params = params
        self._jit = {}

    def _build(self, B: int, S: int, max_new: int, eos: int):
        cfg, model = self.cfg, self.model
        total = S + max_new

        def run(params, tokens, plen):
            pad = S - plen
            slots = jnp.arange(S)[None, :]
            positions = jnp.maximum(slots - pad[:, None], 0)
            valid = slots >= pad[:, None]
            kv_valid = jnp.zeros((B, total), bool).at[:, :S].set(valid)
            states = init_ssm_states(cfg, B, total)
            logits, states = model.apply(
                {"params": params}, tokens, positions, states=states,
                decode_index=0, kv_valid=kv_valid, mask=valid)
            last = logits[:, -1]

            def step(carry, i):
                states, prev_logits, done, kv_valid = carry
                tok = jnp.argmax(prev_logits, -1).astype(jnp.int32)
                tok = jnp.where(done, 0, tok)
                slot = S + i
                kv_valid = kv_valid.at[:, slot].set(~done)
                pos = (slot - pad)[:, None]
                logits, states = model.apply(
                    {"params": params}, tok[:, None], pos, states=states,
                    decode_index=slot, kv_valid=kv_valid)
                new_done = done | (tok == eos)
                out_tok = jnp.where(done, -1, tok)
                return (states, logits[:, 0], new_done, kv_valid), out_tok

            init = (states, last, jnp.zeros(B, bool), kv_valid)
            _, out = jax.lax.scan(step, init, jnp.arange(max_new))
            return jnp.transpose(out)

        return jax.jit(run)

    def generate_tokens(self, prompt_ids, max_new_tokens: int = 32,
                        eos_id: int = -1):
        B = len(prompt_ids)
        S = max(8, int(2 ** np.ceil(np.log2(max(len(p) for p in prompt_ids)))))
        key = (B, S, max_new_tokens, int(eos_id))
        if key not in self._jit:
            self._jit[key] = self._build(B, S, max_new_tokens, int(eos_id))
        tokens = np.zeros((B, S), np.int32)
        plen = np.zeros(B, np.int32)
        for b, p in enumerate(prompt_ids):
            tokens[b, S - len(p):] = p
            plen[b] = len(p)
        out = np.asarray(self._jit[key](
            self.params, jnp.asarray(tokens), jnp.asarray(plen)))
        results = []
        for b in range(B):
            ids = [int(t) for t in out[b] if t >= 0]
            if eos_id >= 0 and eos_id in ids:
                ids = ids[: ids.index(eos_id)]
            results.append(ids)
        return results


class SSMContinuousBatchingEngine:
    """Continuous batching on a fixed slot pool for SSM/hybrid LMs —
    the ContinuousBatchingEngine surface (prefill_slot / decode_step /
    free_slot) so LLMServer can serve mamba2/nemotron-H checkpoints.

    Per-slot state instead of per-slot KV: 'M' layers keep
    (conv_buf, h) with the slot as axis 0; hybrid '*' layers keep a KV
    pool written at per-slot depths. One jitted decode program advances
    every active slot; prefill runs chunked with a left-padded first
    chunk (mask keeps pad rows out of the recurrence)."""

    def __init__(self, cfg: SSMConfig, params, *, max_slots: int = 4,
                 max_len: int = 512, prefill_buckets=(32, 64, 128),
                 cache_dtype=jnp.float32, **_ignored):
        self.cfg = cfg
        self.model = SSMModel(cfg)
        self.params = params
        self.max_slots = max_slots
        self.max_len = max_len
        fitting = [b for b in prefill_buckets if b < max_len]
        if not fitting:
            # auto-clamp (LLMServer passes its own max_len with the default
            # buckets): largest power-of-2 below max_len keeps decode room
            fitting = [max(8, 1 << (max_len - 1).bit_length() - 1)]
        self.bucket = max(fitting)
        if self.bucket >= max_len:
            raise ValueError(
                f"prefill bucket ({self.bucket}) must be < max_len "
                f"({max_len}) to leave decode room")
        self.states = init_ssm_states(cfg, max_slots, max_len, cache_dtype)
        self.cur_len = np.zeros(max_slots, np.int64)
        self.pad = np.zeros(max_slots, np.int64)
        self._prefill_jit = None
        self._decode_jit = None
        model, pattern = self.model, cfg.pattern()

        def slot_slice(states, slot):
            return jax.tree.map(
                lambda c: jax.lax.dynamic_slice_in_dim(c, slot, 1, axis=0),
                states)

        def slot_put(states, sub, slot):
            return jax.tree.map(
                lambda c, u: jax.lax.dynamic_update_slice_in_dim(
                    c, u.astype(c.dtype), slot, axis=0),
                states, sub)

        def prefill(params, states, slot, tokens, start, pad, rng,
                    temperature, top_k, top_p):
            """tokens [1, Sb]: chunk of the prompt, LEFT-padded overall so
            every chunk ends on a real token; chunk 0 carries the `pad`
            zeros (masked out of the recurrence). Samples from the chunk's
            last row (callers keep only the final chunk's sample)."""
            Sb = tokens.shape[1]
            sub = slot_slice(states, slot)
            positions = jnp.maximum(start + jnp.arange(Sb)[None, :] - pad, 0)
            mask = (start + jnp.arange(Sb)[None, :]) >= pad
            kv_valid = ((jnp.arange(self.max_len) >= pad)
                        & (jnp.arange(self.max_len) < start + Sb))[None, :]
            logits, sub = model.apply(
                {"params": params}, tokens, positions, states=sub,
                decode_index=start, kv_valid=kv_valid, mask=mask)
            states = slot_put(states, sub, slot)
            from nemo_tpu.models.llm.generate import _temp_sample

            tok = _temp_sample(logits[0, -1][None], rng,
                               temperature, top_k, top_p)[0]
            return states, tok

        def decode(params, states, tok, cur_len, pad, rng,
                   temperature, top_k, top_p):
            positions = (cur_len - pad)[:, None].astype(jnp.int32)
            kv_valid = ((jnp.arange(self.max_len)[None, :] >= pad[:, None])
                        & (jnp.arange(self.max_len)[None, :] <= cur_len[:, None]))
            logits, states = model.apply(
                {"params": params}, tok[:, None], positions, states=states,
                decode_index=cur_len.astype(jnp.int32), kv_valid=kv_valid)
            from nemo_tpu.models.llm.generate import _temp_sample

            nxt = _temp_sample(logits[:, 0], rng, temperature, top_k, top_p)
            return states, nxt

        self._prefill_fn = prefill
        self._decode_fn = decode

    def register_prefix(self, prefix_ids):
        raise ValueError("prefix caching requires a KV-cache model; "
                         "SSM states are not prefix-sliceable")

    def prefill_slot(self, slot: int, prompt_ids, temperature: float = 0.0,
                     seed: int = 0, top_k: int = 0, top_p: float = 0.0) -> int:
        ids = list(prompt_ids)
        if len(ids) >= self.max_len:
            ids = ids[-(self.max_len - 1):]
        Bk = self.bucket
        n = max(1, -(-len(ids) // Bk))
        if n * Bk >= self.max_len:  # keep decode room
            n = max(1, (self.max_len - 1) // Bk)
            ids = ids[-(n * Bk):]
        padded = n * Bk
        pad = padded - len(ids)
        toks = np.zeros((1, padded), np.int32)
        toks[0, pad:] = ids
        if self._prefill_jit is None:
            self._prefill_jit = jax.jit(self._prefill_fn)
        tok = None
        for c in range(n):
            chunk = toks[:, c * Bk:(c + 1) * Bk]
            self.states, tok = self._prefill_jit(
                self.params, self.states, jnp.asarray(slot),
                jnp.asarray(chunk), jnp.asarray(c * Bk), jnp.asarray(pad),
                jax.random.PRNGKey(seed),
                jnp.asarray(temperature, jnp.float32),
                jnp.asarray(top_k, jnp.int32), jnp.asarray(top_p, jnp.float32))
        self.cur_len[slot] = padded
        self.pad[slot] = pad
        return int(tok)

    def decode_step(self, feed_tokens, active, temperature=0.0,
                    seed: int = 0, top_k=0, top_p=0.0):
        if self._decode_jit is None:
            self._decode_jit = jax.jit(self._decode_fn)
        self.states, nxt = self._decode_jit(
            self.params, self.states, jnp.asarray(feed_tokens, jnp.int32),
            jnp.asarray(self.cur_len), jnp.asarray(self.pad),
            jax.random.PRNGKey(seed),
            jnp.asarray(temperature, jnp.float32),
            jnp.asarray(top_k, jnp.int32), jnp.asarray(top_p, jnp.float32))
        self.cur_len = np.where(active, self.cur_len + 1, self.cur_len)
        return np.asarray(nxt)

    def free_slot(self, slot: int):
        # zero the slot's recurrent states so a new request starts clean
        def zero_slot(c):
            return jax.lax.dynamic_update_slice_in_dim(
                c, jnp.zeros((1,) + c.shape[1:], c.dtype), slot, axis=0)

        self.states = jax.tree.map(zero_slot, self.states)
        self.cur_len[slot] = 0
        self.pad[slot] = 0
