"""GPT transformer stack, TPU-native (flax + GSPMD logical sharding).

Reference parity: MCore GPTModel as configured by GPTConfig
(`nemo/collections/llm/gpt/model/base.py:284,319` — embedding → N×
[pre-norm attn(GQA+RoPE) → pre-norm MLP(SwiGLU)] → final norm →
(tied) LM head), plus family variations (GQA, qk-layernorm, gemma scaling,
sliding window, MoE).

TPU-first design:
- Tensor/sequence/data/fsdp parallelism are GSPMD shardings: every param
  carries logical axes (nn.with_logical_partitioning) mapped to the mesh by
  nemo_tpu.parallel.default_axis_rules — no Column/RowParallelLinear classes,
  XLA inserts the collectives (SURVEY.md §2.9/§2.10).
- Layers are stacked with nn.scan (single compiled layer body, params with a
  leading 'layers' axis) + per-layer remat — compile time and HBM win.
- bf16 compute / fp32 params + fp32 softmax and norm islands.
- Attention is a fused-friendly einsum chain; the Pallas flash kernel plugs
  in behind `attention_fn` (ops/attention.py) for long sequences.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
import numpy as np

from nemo_tpu.models.llm.config import GPTConfig
from nemo_tpu.ops.quant import dense_layer

with_constraint = nn.with_logical_constraint


def _dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}[name]


def _init(std: float, axes):
    return nn.with_logical_partitioning(nn.initializers.normal(std), axes)


class RMSNorm(nn.Module):
    cfg: GPTConfig
    dim: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        dim = self.dim or x.shape[-1]
        scale = self.param(
            "scale",
            nn.with_logical_partitioning(nn.initializers.zeros if self.cfg.layernorm_zero_centered_gamma else nn.initializers.ones, ("act_embed",)),
            (dim,),
        )
        x32 = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        y = x32 * jax.lax.rsqrt(var + self.cfg.layernorm_epsilon)
        g = scale.astype(jnp.float32)
        if self.cfg.layernorm_zero_centered_gamma:
            g = 1.0 + g
        return (y * g).astype(x.dtype)


class LayerNormFP32(nn.Module):
    """fp32 LayerNorm; zero_centered_gamma=True gives Megatron LayerNorm1p
    ((1+g) scale — nemotron family, apex persist_layer_norm equivalent)."""

    cfg: GPTConfig

    @nn.compact
    def __call__(self, x):
        zc = self.cfg.layernorm_zero_centered_gamma
        dim = x.shape[-1]
        scale = self.param(
            "scale",
            nn.with_logical_partitioning(
                nn.initializers.zeros if zc else nn.initializers.ones, ("act_embed",)),
            (dim,), jnp.float32)
        bias = self.param(
            "bias",
            nn.with_logical_partitioning(nn.initializers.zeros, ("act_embed",)),
            (dim,), jnp.float32)
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
        y = (x32 - mu) * jax.lax.rsqrt(var + self.cfg.layernorm_epsilon)
        g = (1.0 + scale) if zc else scale
        return (y * g + bias).astype(x.dtype)


def make_norm(cfg: GPTConfig, name: str):
    if cfg.normalization == "RMSNorm":
        return RMSNorm(cfg, name=name)
    return LayerNormFP32(cfg, name=name)


# --------------------------------------------------------------------------
# RoPE
# --------------------------------------------------------------------------


# ---- per-layer heterogeneity (cyclic patterns over layer index) ----------
# reference: gemma3 interleaved_attn_pattern, gpt_oss window_attn_skip_freq,
# llama4 nope_layer_interval / moe_layer_freq. layer_idx=None means the
# homogeneous (scan) path, where no pattern may be active.


def layer_window(cfg: GPTConfig, i: Optional[int]) -> Optional[int]:
    if cfg.window_pattern is not None:
        assert i is not None, "window_pattern needs per-layer indices"
        return cfg.window_pattern[i % len(cfg.window_pattern)]
    return cfg.window_size


def layer_uses_rope(cfg: GPTConfig, i: Optional[int]) -> bool:
    if cfg.nope_layer_interval and i is not None:
        return (i + 1) % cfg.nope_layer_interval != 0
    return True


def layer_chunk(cfg: GPTConfig, i: Optional[int]) -> Optional[int]:
    # llama4: chunked attention applies to the rope (local) layers only;
    # NoPE layers stay global
    if cfg.attention_chunk_size and layer_uses_rope(cfg, i):
        return cfg.attention_chunk_size
    return None


def layer_is_moe(cfg: GPTConfig, i: Optional[int]) -> bool:
    if cfg.num_moe_experts <= 0:
        return False
    if i is None:
        return True
    if i < cfg.moe_first_k_dense:
        return False
    if cfg.moe_layer_freq is not None:
        return bool(cfg.moe_layer_freq[i % len(cfg.moe_layer_freq)])
    return True


def hetero_period(cfg: GPTConfig) -> int:
    """Cycle length of the per-layer pattern (1 = homogeneous stack)."""
    p = 1
    if cfg.window_pattern:
        p = int(np.lcm(p, len(cfg.window_pattern)))
    if cfg.moe_layer_freq:
        p = int(np.lcm(p, len(cfg.moe_layer_freq)))
    if cfg.nope_layer_interval:
        p = int(np.lcm(p, cfg.nope_layer_interval))
    return p


def unroll_params(cfg: GPTConfig, params):
    """Convert a scan-stacked param tree (one 'layers' subtree with [L, ...]
    leaves) to the unrolled layout ('layer0'..'layerN-1' subtrees) so a
    checkpoint trained with scan_layers=True can serve with
    scan_layers=False (the decode fast path). Homogeneous stacks only
    (hetero_period == 1); returns params unchanged if not applicable."""
    if "layers" not in params or hetero_period(cfg) != 1:
        return params
    out = {k: v for k, v in params.items() if k != "layers"}
    stacked = params["layers"]
    for i in range(cfg.num_layers):
        out[f"layer{i}"] = jax.tree.map(lambda x: x[i], stacked)
    return out


def uses_scan_layers(cfg: GPTConfig) -> bool:
    """Whether the stack compiles as one nn.scan'd layer body (vs unrolled).

    Callers that drive decode (generate.py) branch on this to pick the KV
    cache layout: stacked [L, ...] for the scan path, per-layer tuples for
    the unrolled path (avoids per-step pool slicing/stacking)."""
    period = hetero_period(cfg)
    return bool(cfg.scan_layers) and cfg.moe_first_k_dense == 0 and (
        period == 1 or cfg.num_layers % period == 0)


def rope_frequencies(cfg: GPTConfig, local: bool = False) -> np.ndarray:
    """Inverse frequencies [head_dim/2], with llama3 wavelength-dependent,
    linear (gemma3), or yarn (gpt-oss) scaling (reference: llama rope
    scaling in gpt/model/llama.py, gemma3.py rope_scaling linear,
    gpt_oss.py rotary_scaling_factor yarn). local=True → windowed-layer
    base (gemma3 10k) with no scaling."""
    dim = int(cfg.head_dim * cfg.rotary_percent)
    base = cfg.rotary_base
    if local and cfg.rope_local_base is not None:
        base = cfg.rope_local_base
    inv = 1.0 / (base ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    if local and cfg.rope_local_base is not None:
        return inv.astype(np.float32)
    if cfg.rope_scaling == "linear":
        inv = inv / cfg.rope_scaling_factor
    elif cfg.rope_scaling == "yarn":
        # NTK-by-parts (HF yarn): interpolate inv/factor ↔ inv with a ramp
        # over the frequency index between the beta_fast/beta_slow rotations
        factor = cfg.rope_scaling_factor
        orig = cfg.old_context_len
        beta_fast, beta_slow = 32.0, 1.0

        def find_dim(num_rot):
            return (dim * np.log(orig / (num_rot * 2 * np.pi))) / (
                2 * np.log(base))

        low = max(np.floor(find_dim(beta_fast)), 0)
        high = min(np.ceil(find_dim(beta_slow)), dim // 2 - 1)
        ramp = np.clip(
            (np.arange(dim // 2, dtype=np.float64) - low)
            / max(high - low, 1e-3), 0, 1)
        extrap_mask = 1.0 - ramp  # high-freq dims keep extrapolation
        inv = (inv / factor) * (1.0 - extrap_mask) + inv * extrap_mask
    elif cfg.rope_scaling == "llama3":
        factor = cfg.rope_scaling_factor
        low_freq_factor, high_freq_factor = 1.0, 4.0
        old_len = cfg.old_context_len
        wavelen = 2 * np.pi / inv
        low_wl = old_len / low_freq_factor
        high_wl = old_len / high_freq_factor
        scaled = inv / factor
        smooth = (old_len / wavelen - low_freq_factor) / (high_freq_factor - low_freq_factor)
        mid = (1 - smooth) * scaled + smooth * inv
        inv = np.where(wavelen > low_wl, scaled, np.where(wavelen < high_wl, inv, mid))
    return inv.astype(np.float32)


def apply_mrope(x: jnp.ndarray, positions: jnp.ndarray,
                inv_freq: jnp.ndarray, sections) -> jnp.ndarray:
    """Multimodal RoPE (qwen2-VL): positions [B,S,3] = (temporal, height,
    width) ids; frequency index f uses position axis given by `sections`
    (e.g. (16,24,24) over head_dim/2=64). Text tokens carry identical ids
    on all three axes, so M-RoPE == RoPE on pure text — tested."""
    sect_idx = np.repeat(np.arange(len(sections)), sections)
    assert sect_idx.shape[0] == inv_freq.shape[-1], (
        f"mrope sections {sections} must sum to rotary dim/2 "
        f"{inv_freq.shape[-1]}")
    pos_f = positions[..., jnp.asarray(sect_idx)]  # [B,S,D/2]
    ang = pos_f.astype(jnp.float32) * inv_freq
    sin = jnp.sin(ang)[:, :, None, :]
    cos = jnp.cos(ang)[:, :, None, :]
    rot_dim = 2 * inv_freq.shape[-1]
    xr, xp = x[..., :rot_dim], x[..., rot_dim:]
    x1, x2 = jnp.split(xr.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return jnp.concatenate([out.astype(x.dtype), xp], axis=-1)


def yarn_mscale(cfg: GPTConfig) -> float:
    """YaRN attention concentration: scores scale by mscale² (HF applies
    attention_factor to cos/sin; scaling q·k is equivalent at
    rotary_percent=1)."""
    if cfg.rope_scaling == "yarn" and cfg.rope_scaling_factor > 1:
        return 0.1 * float(np.log(cfg.rope_scaling_factor)) + 1.0
    return 1.0


def apply_rope(x: jnp.ndarray, positions: jnp.ndarray, inv_freq: jnp.ndarray,
               interleaved: bool = False) -> jnp.ndarray:
    """x: [B, S, H, D]; positions: [B, S] or [S]. Rotates first
    2*len(inv_freq) channels (rotary_percent support); half-split
    (HF/Megatron 'neox') convention by default, or interleaved (0,1)(2,3)
    pairs (chatglm/llama4 rotary_interleaved)."""
    if positions.ndim == 1:
        positions = positions[None, :]
    ang = positions[..., None].astype(jnp.float32) * inv_freq  # [B, S, D/2]
    sin = jnp.sin(ang)[:, :, None, :]
    cos = jnp.cos(ang)[:, :, None, :]
    rot_dim = 2 * inv_freq.shape[-1]
    xr, xp = x[..., :rot_dim], x[..., rot_dim:]
    if interleaved:
        xf = xr.astype(jnp.float32).reshape(*xr.shape[:-1], rot_dim // 2, 2)
        x1, x2 = xf[..., 0], xf[..., 1]
        out = jnp.stack(
            [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
        ).reshape(xr.shape)
    else:
        x1, x2 = jnp.split(xr.astype(jnp.float32), 2, axis=-1)
        out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return jnp.concatenate([out.astype(x.dtype), xp], axis=-1)


def _cache_T(c) -> int:
    """Time-axis length of one per-layer cache side (bf16 array [B,T,G,D]
    or int8 pair {'q': int8 [B,T,G,D], 's': f32 [B,T,G,1]})."""
    return (c["q"] if isinstance(c, dict) else c).shape[1]


def _quantize_kv(x):
    """[B,S,G,D] → (int8 q, f32 per-(token,head) scale [B,S,G,1])."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), -1, keepdims=True)
    s = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.round(jnp.clip(x.astype(jnp.float32) / s, -127, 127)).astype(jnp.int8)
    return q, s


def _dequantize_kv(c, dtype):
    if isinstance(c, dict):
        return (c["q"].astype(jnp.float32) * c["s"]).astype(dtype)
    return c


def _cache_write(c, val, decode_index):
    """Scatter `val` into cache array `c` along the time axis at
    decode_index — a scalar (all slots at the same depth: batch generate /
    chunked prefill) or a per-slot [B] vector (continuous batching, Sq=1)."""
    idx = jnp.asarray(decode_index)
    if idx.ndim == 1:
        B = val.shape[0]
        return c.at[jnp.arange(B), idx].set(val[:, 0].astype(c.dtype))
    return jax.lax.dynamic_update_slice_in_dim(
        c, val.astype(c.dtype), decode_index, axis=1)


def _update_kv_cache(ck, cv, k, v, decode_index):
    """Write new K/V into the cache at decode_index and return the full
    (dequantized) cache contents to attend over. int8 cache sides
    ({'q','s'} pairs — the vLLM kv_cache_dtype=int8 analog; half the bf16
    KV bytes read per decode step) quantize per (token, head) on write."""
    if isinstance(ck, dict):
        kq, ks = _quantize_kv(k)
        vq, vs = _quantize_kv(v)
        ck = {"q": _cache_write(ck["q"], kq, decode_index),
              "s": _cache_write(ck["s"], ks, decode_index)}
        cv = {"q": _cache_write(cv["q"], vq, decode_index),
              "s": _cache_write(cv["s"], vs, decode_index)}
        return (_dequantize_kv(ck, k.dtype), _dequantize_kv(cv, v.dtype),
                (ck, cv), decode_index)
    ck = _cache_write(ck, k, decode_index)
    cv = _cache_write(cv, v, decode_index)
    return ck, cv, (ck, cv), decode_index


# --------------------------------------------------------------------------
# Attention
# --------------------------------------------------------------------------


def causal_attention(
    q: jnp.ndarray,  # [B, S, H, D]
    k: jnp.ndarray,  # [B, S, G, D]
    v: jnp.ndarray,  # [B, S, G, D]
    *,
    scale: float,
    window: Optional[int] = None,
    softmax_fp32: bool = True,
    kv_offset=0,
    kv_valid: Optional[jnp.ndarray] = None,  # [B, Skv] True = attendable
    segment_ids: Optional[jnp.ndarray] = None,  # [B, S] packed-seq ids (0=pad)
    chunk: Optional[int] = None,  # llama4 chunked attention (same-chunk mask)
    sink: Optional[jnp.ndarray] = None,  # [G, rep] gpt-oss sink logits
    logit_cap: Optional[float] = None,  # gemma2 attn_logit_softcapping
    causal: bool = True,  # False → bidirectional (embedding/reranker models)
    bidir_ids: Optional[jnp.ndarray] = None,  # [B, S] gemma3-VL image spans
) -> jnp.ndarray:
    """Grouped-query causal attention as einsums (XLA fuses; Pallas flash
    kernel replaces this for long S). kv_offset shifts query positions for
    decode (q at slot kv_offset..kv_offset+Sq-1 attends to k slots ≤ that) —
    scalar, or per-batch [B] for continuous batching where every slot sits
    at its own depth; kv_valid additionally masks out slots (left-padded
    prompts in batched generation)."""
    B, Sq, H, D = q.shape
    G = k.shape[2]
    rep = H // G
    qg = q.reshape(B, Sq, G, rep, D)
    scores = jnp.einsum("bsgrd,btgd->bgrst", qg, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if logit_cap:
        # gemma2 attention-logit softcapping (HF attn_logit_softcapping:
        # cap·tanh(s/cap) BEFORE masking/softmax)
        scores = logit_cap * jnp.tanh(scores / logit_cap)
    Skv = k.shape[1]
    kv_off = jnp.asarray(kv_offset)
    if kv_off.ndim == 1:  # per-slot offsets [B]
        qpos = jnp.arange(Sq)[None, :] + kv_off[:, None]  # [B, Sq]
    else:
        qpos = jnp.broadcast_to(jnp.arange(Sq) + kv_off, (B, Sq))
    kpos = jnp.arange(Skv)
    if causal:
        mask = kpos[None, None, :] <= qpos[:, :, None]  # [B, Sq, Skv]
    else:
        # bidirectional (NV-Embed-style encoders); kv_valid/segments still
        # bound what a query may see
        mask = jnp.ones((B, Sq, Skv), bool)
    if window is not None:
        mask = mask & (kpos[None, None, :] > qpos[:, :, None] - window)
    if chunk is not None:
        mask = mask & (kpos[None, None, :] // chunk == qpos[:, :, None] // chunk)
    if bidir_ids is not None:
        # gemma3-VL: tokens sharing a nonzero span id attend BIDIRECTIONALLY
        # (image tokens see their whole image), OR'd over the causal/window
        # mask exactly like HF Gemma3's token_type_ids mask — it overrides
        # the sliding window on local layers too. With a KV cache written
        # from slot 0 (VLM prefill), kv slot i < Sq holds query slot i's
        # token and later slots are future text — pad the kv-side ids with
        # zeros (text) so the same mask works when Skv > Sq.
        kv_bidir = bidir_ids
        if Skv != bidir_ids.shape[1]:
            kv_bidir = jnp.zeros((B, Skv), bidir_ids.dtype).at[
                :, : bidir_ids.shape[1]].set(bidir_ids)
        same = (bidir_ids[:, :, None] == kv_bidir[:, None, :]) \
            & (bidir_ids[:, :, None] > 0)
        mask = mask | same
    if kv_valid is not None:
        mask = mask & kv_valid[:, None, :]
    if segment_ids is not None:
        mask = mask & (segment_ids[:, :, None] == segment_ids[:, None, :])
        mask = mask & (segment_ids[:, :, None] > 0)
    scores = jnp.where(mask[:, None, None], scores, -1e30)
    if not softmax_fp32:
        scores = scores.astype(q.dtype)
    if sink is not None:
        # gpt-oss attention sinks (HF `sinks` / MCore softmax_offset): a
        # learnable per-head logit joins the softmax competition but emits
        # no value — implemented as an extra column dropped after softmax.
        col = jnp.broadcast_to(
            sink[None, :, :, None, None].astype(scores.dtype),
            (*scores.shape[:-1], 1))
        probs = jax.nn.softmax(
            jnp.concatenate([scores, col], axis=-1), axis=-1)[..., :-1]
    else:
        probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bgrst,btgd->bsgrd", probs.astype(v.dtype), v)
    return out.reshape(B, Sq, H, v.shape[-1])


def _decode_attention(q, ck, cv, k_new, v_new, *, cl, scale, window,
                      softmax_fp32):
    """Hazard-free single-token decode attention (continuous batching).

    Attends over the PRE-UPDATE cache plus an explicit current-token term,
    so the KV cache write can happen AFTER the read: inside a lax.scan the
    cache carry then updates in place (one-token scatter), where the
    read-after-write ordering of `_update_kv_cache` forced XLA to
    double-buffer a full cache side per layer per token (~12% of a 1B
    decode step in the chip trace).

    q [B,1,H,D]; ck/cv [B,T,G,D] (bf16 or int8 {'q','s'}); k_new/v_new
    [B,1,G,D] ALREADY round-tripped through the cache dtype (numerics
    identical to attending over the written cache); cl [B] per-slot write
    positions. History mask: kpos < cl (slot cl holds stale data; the
    current token joins as the extra column)."""
    B, _, H, D = q.shape
    k_hist = _dequantize_kv(ck, q.dtype)  # XLA fuses dequant into the einsum
    v_hist = _dequantize_kv(cv, q.dtype)
    G = k_hist.shape[2]
    rep = H // G
    qg = q.reshape(B, 1, G, rep, D)
    s_hist = jnp.einsum("bsgrd,btgd->bgrst", qg, k_hist,
                        preferred_element_type=jnp.float32) * scale
    s_new = jnp.einsum("bsgrd,bsgd->bgrs", qg, k_new,
                       preferred_element_type=jnp.float32)[..., None] * scale
    T = k_hist.shape[1]
    kpos = jnp.arange(T)
    mask = kpos[None, :] < cl[:, None]  # [B, T]
    if window is not None:
        mask = mask & (kpos[None, :] > cl[:, None] - window)
    s_hist = jnp.where(mask[:, None, None, None, :], s_hist, -1e30)
    s_all = jnp.concatenate([s_hist, s_new], axis=-1)
    if not softmax_fp32:
        s_all = s_all.astype(q.dtype)
    probs = jax.nn.softmax(s_all, axis=-1)
    p_hist = probs[..., :T].astype(v_hist.dtype)
    p_new = probs[..., T:].astype(v_new.dtype)  # [B,G,rep,1,1]
    out = jnp.einsum("bgrst,btgd->bsgrd", p_hist, v_hist)
    out = out + p_new[..., 0].transpose(0, 3, 1, 2)[..., None] \
        * v_new[:, :, :, None, :]
    return out.reshape(B, 1, H, v_hist.shape[-1])


class Attention(nn.Module):
    cfg: GPTConfig
    layer_idx: Optional[int] = None  # pattern position for hetero stacks

    @nn.compact
    def __call__(self, x, positions, kv_cache=None, decode_index=None, kv_valid=None,
                 segment_ids=None, bidir_ids=None, *, train=False):
        cfg = self.cfg
        H, G, D = cfg.num_attention_heads, cfg.n_kv_heads, cfg.head_dim
        window = layer_window(cfg, self.layer_idx)
        use_rope = layer_uses_rope(cfg, self.layer_idx)
        chunk = layer_chunk(cfg, self.layer_idx)
        dtype = x.dtype
        dense = partial(
            dense_layer,
            cfg.quantization,
            use_bias=cfg.add_qkv_bias or cfg.add_bias_linear,
            dtype=dtype,
            param_dtype=_dtype(cfg.params_dtype),
        )
        q = dense(features=(H, D), kernel_init=_init(cfg.init_method_std, ("embed", "heads", "qkv")), name="q_proj")(x)
        k = dense(features=(G, D), kernel_init=_init(cfg.init_method_std, ("embed", "kv_heads", "qkv")), name="k_proj")(x)
        v = dense(features=(G, D), kernel_init=_init(cfg.init_method_std, ("embed", "kv_heads", "qkv")), name="v_proj")(x)

        if cfg.qk_layernorm:
            q = RMSNorm(cfg, dim=D, name="q_norm")(q)
            k = RMSNorm(cfg, dim=D, name="k_norm")(k)

        if cfg.position_embedding_type == "rope" and use_rope:
            inv = jnp.asarray(rope_frequencies(cfg, local=window is not None))
            if cfg.mrope_sections is not None and positions.ndim == 3:
                q = apply_mrope(q, positions, inv, cfg.mrope_sections)
                k = apply_mrope(k, positions, inv, cfg.mrope_sections)
            else:
                q = apply_rope(q, positions, inv, cfg.rotary_interleaved)
                k = apply_rope(k, positions, inv, cfg.rotary_interleaved)
            if cfg.qk_l2_norm:
                # llama4: parameter-free L2 norm after rope on rope layers
                def l2n(t):
                    n = jax.lax.rsqrt(jnp.sum(
                        jnp.square(t.astype(jnp.float32)), -1, keepdims=True
                    ) + 1e-6)
                    return (t.astype(jnp.float32) * n).astype(t.dtype)

                q, k = l2n(q), l2n(k)

        q = with_constraint(q, ("batch", "act_seq", "heads", None))
        k = with_constraint(k, ("batch", "act_seq", "kv_heads", None))
        v = with_constraint(v, ("batch", "act_seq", "kv_heads", None))

        scale = cfg.attention_multiplier or (1.0 / np.sqrt(D))
        scale = scale * yarn_mscale(cfg) ** 2

        # Continuous-batching decode hot path (Sq=1, per-slot write index):
        # attend BEFORE writing the cache (history + explicit current-token
        # term) so the scan-carried cache updates in place — see
        # _decode_attention. Gated to the plain-attention feature set.
        dec_idx = jnp.asarray(decode_index) if decode_index is not None \
            else None
        if (kv_cache is not None and _cache_T(kv_cache[0]) > 0
                and q.shape[1] == 1 and dec_idx is not None
                and dec_idx.ndim == 1 and kv_valid is None
                and chunk is None and bidir_ids is None
                and not cfg.attention_sinks
                and not cfg.attn_logit_softcapping and cfg.causal):
            ck, cv = kv_cache
            if isinstance(ck, dict):
                kq, ks = _quantize_kv(k)
                vq, vs = _quantize_kv(v)
                # round-trip the current token through the cache dtype so
                # numerics match attending over the written cache exactly
                k_cur = (kq.astype(jnp.float32) * ks).astype(k.dtype)
                v_cur = (vq.astype(jnp.float32) * vs).astype(v.dtype)
            else:
                k_cur = k.astype(ck.dtype).astype(k.dtype)
                v_cur = v.astype(cv.dtype).astype(v.dtype)
            out = _decode_attention(
                q, ck, cv, k_cur, v_cur, cl=dec_idx, scale=float(scale),
                window=window, softmax_fp32=cfg.attention_softmax_in_fp32)
            if isinstance(ck, dict):
                ck = {"q": _cache_write(ck["q"], kq, dec_idx),
                      "s": _cache_write(ck["s"], ks, dec_idx)}
                cv = {"q": _cache_write(cv["q"], vq, dec_idx),
                      "s": _cache_write(cv["s"], vs, dec_idx)}
            else:
                ck = _cache_write(ck, k, dec_idx)
                cv = _cache_write(cv, v, dec_idx)
            out = dense_layer(
                cfg.quantization,
                features=cfg.hidden_size,
                axis=(-2, -1),
                use_bias=cfg.add_bias_linear,
                dtype=dtype,
                param_dtype=_dtype(cfg.params_dtype),
                kernel_init=_init(cfg.init_method_std, ("heads", "qkv", "embed")),
                name="o_proj",
            )(out)
            if cfg.attention_dropout:
                out = nn.Dropout(cfg.attention_dropout,
                                 deterministic=not train)(out)
            return out, (ck, cv)

        kv_offset = 0
        if kv_cache is not None and _cache_T(kv_cache[0]) > 0:
            ck, cv = kv_cache
            k, v, kv_cache, kv_offset = _update_kv_cache(ck, cv, k, v, decode_index)
        sink = None
        if cfg.attention_sinks:
            sink = self.param(
                "sink", nn.with_logical_partitioning(
                    nn.initializers.zeros, ("heads",)),
                (H,), jnp.float32).reshape(G, H // G)
        no_cache = kv_cache is None or _cache_T(kv_cache[0]) == 0
        S = q.shape[1]
        # the flash/ring kernels don't implement attention-logit softcapping
        # (and are causal-only — bidirectional encoders take the einsum path)
        plain = chunk is None and sink is None and bidir_ids is None \
            and not cfg.attn_logit_softcapping and cfg.causal
        use_ring = (
            cfg.cp_size > 1
            and no_cache
            and plain
            and kv_valid is None
            and segment_ids is None
            and (S // cfg.cp_size) % 128 == 0
        )
        if use_ring:
            from jax.sharding import PartitionSpec as P

            from nemo_tpu.ops.ring_attention import ring_flash_attention

            Tl = S // cfg.cp_size
            bq = 512 if Tl % 512 == 0 else (256 if Tl % 256 == 0 else 128)
            pos_vec = positions[0] if positions.ndim == 2 else positions

            def ring_body(qT, kT, vT, pos):
                return ring_flash_attention(
                    qT, kT, vT, pos, axis_name="cp", scale=float(scale),
                    causal=True, window=window, block_q=bq, block_kv=bq,
                )

            spec = P(("dp", "fsdp"), "tp", "cp", None)
            out = jax.shard_map(
                ring_body,
                in_specs=(spec, spec, spec, P("cp")),
                out_specs=spec,
                check_vma=False,  # pallas out_shape carries no vma info
            )(
                jnp.transpose(q, (0, 2, 1, 3)),
                jnp.transpose(k, (0, 2, 1, 3)),
                jnp.transpose(v, (0, 2, 1, 3)),
                pos_vec.astype(jnp.int32),
            )
            out = jnp.transpose(out, (0, 2, 1, 3))
        elif (
            cfg.attention_backend == "flash"
            and no_cache
            and plain
            and kv_valid is None
            and q.shape[1] % 128 == 0
        ):
            from nemo_tpu.ops.flash_attention import (
                flash_attention, flash_attention_packed)

            qT = jnp.transpose(q, (0, 2, 1, 3))  # [B,H,T,dh]
            kT = jnp.transpose(k, (0, 2, 1, 3))
            vT = jnp.transpose(v, (0, 2, 1, 3))
            bq = min(512, qT.shape[2])
            if segment_ids is None:
                out = flash_attention(
                    qT, kT, vT, float(scale), True, window, bq, bq, 0
                )
            else:
                # packed sequences ride the same kernel family with
                # per-row segment masking (pads = id 0 attend nothing)
                out = flash_attention_packed(
                    qT, kT, vT, segment_ids.astype(jnp.int32),
                    float(scale), True, window, bq, bq,
                )
            out = jnp.transpose(out, (0, 2, 1, 3))
        else:
            out = causal_attention(
                q, k, v, scale=scale, window=window,
                softmax_fp32=cfg.attention_softmax_in_fp32, kv_offset=kv_offset,
                kv_valid=kv_valid, segment_ids=segment_ids, chunk=chunk,
                sink=sink, logit_cap=cfg.attn_logit_softcapping,
                causal=cfg.causal, bidir_ids=bidir_ids,
            )
        out = dense_layer(
            cfg.quantization,
            features=cfg.hidden_size,
            axis=(-2, -1),
            use_bias=cfg.add_bias_linear,
            dtype=dtype,
            param_dtype=_dtype(cfg.params_dtype),
            kernel_init=_init(cfg.init_method_std, ("heads", "qkv", "embed")),
            name="o_proj",
        )(out)
        if cfg.attention_dropout:
            out = nn.Dropout(cfg.attention_dropout, deterministic=not train)(out)
        return out, kv_cache


class MLAAttention(nn.Module):
    """Multi-head Latent Attention (deepseek v2/v3; reference:
    `nemo/collections/llm/gpt/model/deepseek.py` MLA fields of
    DeepSeekV3Config, HF modeling_deepseek_v3 semantics).

    q: x → (optional rank-r down-proj + RMSNorm) → per-head [nope | rope].
    kv: x → one shared down-proj [kv_lora | shared k_rope]; the latent is
    RMSNorm'd then up-projected per-head to [k_nope | v]. RoPE is applied
    only to the rope slices (k_rope is head-shared — the MQA-like trick).

    Decode caches the LATENT (c_kv + roped k_pe, r+dr floats/token) and
    attends in latent space with W_uk absorbed into q and W_uv applied
    after the probability-weighted sum — mathematically exact, with the
    full MLA cache-size win (see init_kv_caches).

    v0 caches the full post-rope K/V (correct; the latent-cache memory
    optimization is a follow-up)."""

    cfg: GPTConfig

    @nn.compact
    def __call__(self, x, positions, kv_cache=None, decode_index=None, kv_valid=None,
                 segment_ids=None, bidir_ids=None, *, train=False):
        # bidir_ids accepted for call-signature parity with Attention and
        # ignored: no MLA model (deepseek) is multimodal-bidirectional.
        cfg = self.cfg
        H = cfg.num_attention_heads
        dn, dr, dv = cfg.qk_head_dim, cfg.qk_pos_emb_head_dim, cfg.v_head_dim
        dtype = x.dtype
        dense = partial(nn.DenseGeneral, use_bias=False, dtype=dtype,
                        param_dtype=_dtype(cfg.params_dtype))

        if cfg.q_lora_rank:
            qd = dense(features=cfg.q_lora_rank,
                       kernel_init=_init(cfg.init_method_std, ("embed", None)),
                       name="q_down")(x)
            qd = RMSNorm(cfg, dim=cfg.q_lora_rank, name="q_down_norm")(qd)
            q = dense(features=(H, dn + dr),
                      kernel_init=_init(cfg.init_method_std, (None, "heads", "qkv")),
                      name="q_up")(qd)
        else:
            q = dense(features=(H, dn + dr),
                      kernel_init=_init(cfg.init_method_std, ("embed", "heads", "qkv")),
                      name="q_proj")(x)
        q_nope, q_pe = q[..., :dn], q[..., dn:]

        kvd = dense(features=cfg.kv_lora_rank + dr,
                    kernel_init=_init(cfg.init_method_std, ("embed", None)),
                    name="kv_down")(x)
        c_kv, k_pe = kvd[..., : cfg.kv_lora_rank], kvd[..., cfg.kv_lora_rank:]
        c_kv = RMSNorm(cfg, dim=cfg.kv_lora_rank, name="kv_down_norm")(c_kv)
        kv_up = dense(features=(H, dn + dv),
                      kernel_init=_init(cfg.init_method_std, (None, "heads", "qkv")),
                      name="kv_up")
        kv = kv_up(c_kv)
        k_nope, v = kv[..., :dn], kv[..., dn:]

        # rope on the positional slices only (shared single-head k_pe)
        inv = 1.0 / (cfg.rotary_base ** (np.arange(0, dr, 2, dtype=np.float64) / dr))
        inv = jnp.asarray(inv.astype(np.float32))
        q_pe = apply_rope(q_pe, positions, inv)
        k_pe = apply_rope(k_pe[:, :, None, :], positions, inv)

        scale = cfg.attention_multiplier or (1.0 / np.sqrt(dn + dr))
        if kv_cache is not None and _cache_T(kv_cache[0]) > 0:
            # LATENT KV cache with weight absorption (MLA's point — the
            # reference runs this through HF/MCore deepseek attention;
            # docstring above). Cache = (c_kv [B,T,1,r], roped k_pe
            # [B,T,1,dr]) — r+dr floats/token instead of H·(dn+dr+dv).
            # Exact: q_nope·k_nope = (W_uk q_nope)·c, and out_h =
            # (Σ_t p_t c_t)·W_uv — so attend in latent space as MQA with
            # head dim r+dr, absorb W_uk into q and W_uv after the sum.
            ck, cv = kv_cache
            _, _, kv_cache, kv_offset = _update_kv_cache(
                ck, cv, c_kv[:, :, None, :], k_pe, decode_index)
            c_all = _dequantize_kv(kv_cache[0], c_kv.dtype)  # [B,T,1,r]
            pe_all = _dequantize_kv(kv_cache[1], c_kv.dtype)  # [B,T,1,dr]
            w_up = kv_up.variables["params"]["kernel"]  # [r, H, dn+dv]
            w_up = nn.meta.unbox(w_up).astype(dtype)
            q_lat = jnp.einsum("bshd,rhd->bshr", q_nope, w_up[..., :dn])
            q_cat = jnp.concatenate([q_lat, q_pe], axis=-1)  # [B,S,H,r+dr]
            k_cat = jnp.concatenate([c_all, pe_all], axis=-1)  # [B,T,1,r+dr]
            out_lat = causal_attention(
                q_cat, k_cat, c_all, scale=scale, window=cfg.window_size,
                softmax_fp32=cfg.attention_softmax_in_fp32,
                kv_offset=kv_offset, kv_valid=kv_valid,
                segment_ids=segment_ids,
            )  # [B,S,H,r]
            out = jnp.einsum("bshr,rhd->bshd", out_lat, w_up[..., dn:])
        else:
            k = jnp.concatenate(
                [k_nope, jnp.broadcast_to(k_pe, k_nope.shape[:-1] + (dr,))],
                axis=-1)
            q = jnp.concatenate([q_nope, q_pe], axis=-1)
            q = with_constraint(q, ("batch", "act_seq", "heads", None))
            k = with_constraint(k, ("batch", "act_seq", "heads", None))
            v = with_constraint(v, ("batch", "act_seq", "heads", None))
            out = causal_attention(
                q, k, v, scale=scale, window=cfg.window_size,
                softmax_fp32=cfg.attention_softmax_in_fp32,
                kv_valid=kv_valid, segment_ids=segment_ids,
            )
        out = nn.DenseGeneral(
            features=cfg.hidden_size, axis=(-2, -1), use_bias=False, dtype=dtype,
            param_dtype=_dtype(cfg.params_dtype),
            kernel_init=_init(cfg.init_method_std, ("heads", "qkv", "embed")),
            name="o_proj",
        )(out)
        if cfg.attention_dropout:
            out = nn.Dropout(cfg.attention_dropout, deterministic=not train)(out)
        return out, kv_cache


# --------------------------------------------------------------------------
# MLP / MoE
# --------------------------------------------------------------------------


def _act(name: str):
    return {
        "silu": nn.silu,
        "gelu": partial(nn.gelu, approximate=True),
        "squared_relu": lambda x: jnp.square(nn.relu(x)),
        # gpt-oss / CLIP: x·σ(1.702x) (megatron.core.activations.quick_gelu)
        "quick_gelu": lambda x: x * jax.nn.sigmoid(1.702 * x),
    }[name]


def _glu(cfg: GPTConfig, h: jnp.ndarray) -> jnp.ndarray:
    """Activation over the fc1 output: gated (SwiGLU-family) or plain, with
    gpt-oss value clamping (activation_func_clamp_value, gpt_oss.py:87)."""
    if cfg.gated_linear_unit:
        gate, up = jnp.split(h, 2, axis=-1)
        if cfg.activation_clamp:
            c = cfg.activation_clamp
            gate = jnp.clip(gate, None, c)
            up = jnp.clip(up, -c, c)
        if cfg.glu_linear_offset:
            up = up + cfg.glu_linear_offset
        return _act(cfg.activation)(gate) * up
    h = _act(cfg.activation)(h)
    if cfg.activation_clamp:
        h = jnp.clip(h, -cfg.activation_clamp, cfg.activation_clamp)
    return h


class MLP(nn.Module):
    cfg: GPTConfig
    ffn_size: Optional[int] = None

    @nn.compact
    def __call__(self, x, *, train=False):
        cfg = self.cfg
        ffn = self.ffn_size or cfg.ffn_hidden_size
        dtype = x.dtype
        mult = 2 if cfg.gated_linear_unit else 1
        h = dense_layer(
            cfg.quantization,
            features=mult * ffn,
            use_bias=cfg.add_bias_linear,
            dtype=dtype,
            param_dtype=_dtype(cfg.params_dtype),
            kernel_init=_init(cfg.init_method_std, ("embed", "mlp")),
            name="fc1",
        )(x)
        h = _glu(cfg, h)
        h = with_constraint(h, ("batch", "act_seq", "mlp"))
        out = dense_layer(
            cfg.quantization,
            features=cfg.hidden_size,
            use_bias=cfg.add_bias_linear,
            dtype=dtype,
            param_dtype=_dtype(cfg.params_dtype),
            kernel_init=_init(cfg.init_method_std, ("mlp", "embed")),
            name="fc2",
        )(h)
        if cfg.hidden_dropout:
            out = nn.Dropout(cfg.hidden_dropout, deterministic=not train)(out)
        return out


class MoEMLP(nn.Module):
    """Top-k routed experts (reference: MCore MoE with a2a token dispatcher,
    SURVEY.md §2.10 EP row).

    TPU-native dispatch ("topk", default): sort the (token, k) assignments by
    expert, compute within-expert ranks, scatter into a static [E, capacity]
    buffer (overflow dropped — MCore capacity_factor semantics), run the
    expert GEMMs batched over the expert axis, and scatter-add the weighted
    results back. The buffer's expert dim carries the 'expert' logical axis →
    'ep' mesh axis, so GSPMD inserts the all-to-alls (the NCCL a2a
    equivalent). Per-token FLOPs ∝ topk, not E.

    "dense" dispatch (every token × every expert, router-weighted combine)
    is kept for parity tests and tiny models."""

    cfg: GPTConfig

    @nn.compact
    def __call__(self, x, *, train=False):
        cfg = self.cfg
        E = cfg.num_moe_experts
        K = cfg.moe_router_topk
        ffn = cfg.moe_ffn_hidden_size or cfg.ffn_hidden_size
        dtype = x.dtype
        B, S, Dm = x.shape

        router = nn.DenseGeneral(
            features=E, use_bias=cfg.add_bias_linear, dtype=jnp.float32,
            param_dtype=jnp.float32,
            kernel_init=_init(cfg.init_method_std, ("embed", None)),
            name="router",
        )(x.astype(jnp.float32))  # [B,S,E]
        if cfg.moe_router_score_function == "sigmoid":
            # deepseek-v3 routing: sigmoid scores; selection uses scores +
            # e-score correction bias (aux-loss-free balancing) and optional
            # group-limited topk; combine weights use the *unbiased* scores,
            # normalized, × scaling factor (HF DeepseekV3TopkRouter).
            scores = jax.nn.sigmoid(router)
            sel = scores
            if cfg.moe_router_enable_expert_bias:
                expert_bias = self.param(
                    "expert_bias",
                    nn.with_logical_partitioning(nn.initializers.zeros, (None,)),
                    (E,), jnp.float32)
                sel = sel + jax.lax.stop_gradient(expert_bias)
            if cfg.moe_router_num_groups:
                ng, gk = cfg.moe_router_num_groups, cfg.moe_router_group_topk
                gs = sel.reshape(B, S, ng, E // ng)
                group_scores = jnp.sum(jax.lax.top_k(gs, 2)[0], axis=-1)  # [B,S,ng]
                _, gidx = jax.lax.top_k(group_scores, gk)
                gmask = jnp.any(
                    jax.nn.one_hot(gidx, ng, dtype=jnp.bool_), axis=-2)  # [B,S,ng]
                sel = jnp.where(
                    jnp.repeat(gmask, E // ng, axis=-1), sel, 0.0)
            _, top_i = jax.lax.top_k(sel, K)
            top_w = jnp.take_along_axis(scores, top_i, axis=-1)
            if cfg.moe_router_norm_topk_prob:
                top_w = top_w / (jnp.sum(top_w, -1, keepdims=True) + 1e-20)
            if cfg.moe_router_topk_scaling_factor:
                top_w = top_w * cfg.moe_router_topk_scaling_factor
        elif cfg.moe_router_pre_softmax:
            probs = jax.nn.softmax(router, axis=-1)
            top_w, top_i = jax.lax.top_k(probs, K)
        else:
            top_l, top_i = jax.lax.top_k(router, K)
            top_w = jax.nn.softmax(top_l, axis=-1)

        # Load-balancing signals, collected by GPTTrainModule.loss_fn via
        # `mutable=["losses"]` (reference: MCore router aux loss plumbed
        # through every MoE recipe, gpt/model/base.py moe_aux_loss_coeff;
        # deepseek aux-loss-free bias, gpt/model/deepseek.py).
        if train:
            one_hot = jax.nn.one_hot(top_i, E, dtype=jnp.float32)  # [B,S,K,E]
            # fraction of (token,k) assignments landing on each expert
            load = jnp.mean(jnp.sum(one_hot, axis=2), axis=(0, 1))  # [E]
            self.sow("losses", "expert_load", load)
            if cfg.moe_aux_loss_coeff:
                # Switch-style aux loss: E · Σ_e f_e · P_e where f_e is the
                # dispatched fraction (weighted by routing prob) and P_e the
                # mean router probability.
                me = jnp.mean(jnp.einsum("bske,bsk->bse", one_hot, top_w), axis=(0, 1))
                ce = jnp.mean(jax.nn.softmax(router, axis=-1), axis=(0, 1))
                aux = jnp.sum(me * ce) * E * cfg.moe_aux_loss_coeff
                self.sow("losses", "moe_aux", aux)

        mult = 2 if cfg.gated_linear_unit else 1
        ptq = cfg.quantization == "int8_ptq"
        if ptq:
            # weight-resident int8 experts (serving PTQ — same scheme as
            # ops/quant.QuantDense: int8 weights in HBM, per-expert
            # per-output-channel scales, dynamic per-row activation quant)
            w1 = self.param(
                "w1_q", nn.with_logical_partitioning(
                    nn.initializers.zeros, ("expert", "embed", "mlp")),
                (E, Dm, mult * ffn), jnp.int8)
            w1_s = self.param("w1_scale", nn.initializers.ones,
                              (E, 1, mult * ffn), jnp.float32)
            w2 = self.param(
                "w2_q", nn.with_logical_partitioning(
                    nn.initializers.zeros, ("expert", "mlp", "embed")),
                (E, ffn, Dm), jnp.int8)
            w2_s = self.param("w2_scale", nn.initializers.ones,
                              (E, 1, Dm), jnp.float32)
        else:
            w1 = self.param(
                "w1", _init(cfg.init_method_std, ("expert", "embed", "mlp")),
                (E, Dm, mult * ffn), _dtype(cfg.params_dtype),
            )
            w2 = self.param(
                "w2", _init(cfg.init_method_std, ("expert", "mlp", "embed")),
                (E, ffn, Dm), _dtype(cfg.params_dtype),
            )
        b1 = b2 = None
        if cfg.add_bias_linear:  # gpt-oss: per-expert fc biases
            b1 = self.param(
                "b1", nn.with_logical_partitioning(
                    nn.initializers.zeros, ("expert", "mlp")),
                (E, mult * ffn), _dtype(cfg.params_dtype))
            b2 = self.param(
                "b2", nn.with_logical_partitioning(
                    nn.initializers.zeros, ("expert", "embed")),
                (E, Dm), _dtype(cfg.params_dtype))

        def qexpert_dot(h_ecd, wq, ws):
            """ecd,edf->ecf with int8-resident weights: dynamic per-row
            activation quant, int8×int8→int32 on the MXU int8 pipe."""
            amax = jnp.max(jnp.abs(h_ecd.astype(jnp.float32)), -1, keepdims=True)
            hs = jnp.maximum(amax, 1e-12) / 127.0
            hq = jnp.round(
                jnp.clip(h_ecd.astype(jnp.float32) / hs, -127, 127)
            ).astype(jnp.int8)
            acc = jnp.einsum("ecd,edf->ecf", hq, wq,
                             preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * hs * ws).astype(dtype)

        def expert_ffn(h_ecd):
            if ptq:
                h = qexpert_dot(h_ecd, w1, w1_s)
            else:
                h = jnp.einsum("ecd,edf->ecf", h_ecd, w1.astype(dtype))
            if b1 is not None:
                h = h + b1.astype(dtype)[:, None, :]
            h = _glu(cfg, h)
            h = with_constraint(h, ("expert", None, "mlp"))
            if ptq:
                out = qexpert_dot(h, w2, w2_s)
            else:
                out = jnp.einsum("ecf,efd->ecd", h, w2.astype(dtype))
            if b2 is not None:
                out = out + b2.astype(dtype)[:, None, :]
            return out

        if cfg.moe_dispatch == "dense":
            if ptq:  # parity/test path: materialize dequantized experts
                w1 = (w1.astype(jnp.float32) * w1_s).astype(dtype)
                w2 = (w2.astype(jnp.float32) * w2_s).astype(dtype)
            one_hot = jax.nn.one_hot(top_i, E, dtype=jnp.float32)
            combine = jnp.einsum("bske,bsk->bse", one_hot, top_w)  # [B,S,E]
            h = jnp.einsum("bsd,edf->bsef", x, w1.astype(dtype))
            if b1 is not None:
                h = h + b1.astype(dtype)[None, None]
            h = _glu(cfg, h)
            out = jnp.einsum("bsef,efd->bsed", h, w2.astype(dtype))
            if b2 is not None:
                out = out + b2.astype(dtype)[None, None]
            out = jnp.einsum("bsed,bse->bsd", out, combine.astype(dtype))
        else:
            N = B * S
            xf = x.reshape(N, Dm)
            # capacity per expert, padded to the f32 sublane tile
            C = int(np.ceil(N * K * cfg.moe_capacity_factor / E))
            C = max(8, -(-C // 8) * 8)
            ef = top_i.reshape(N * K)  # expert of each (token, k) pair
            wf = top_w.reshape(N * K).astype(dtype)
            tok = jnp.arange(N * K, dtype=jnp.int32) // K
            order = jnp.argsort(ef, stable=True)  # pairs grouped by expert
            e_sorted = ef[order]
            tok_sorted = tok[order]
            w_sorted = wf[order]
            # within-expert rank = index − first index of that expert
            start = jnp.searchsorted(e_sorted, jnp.arange(E), side="left")
            rank = jnp.arange(N * K, dtype=jnp.int32) - start[e_sorted]
            keep = rank < C
            # overflow pairs route to a trash slot (sliced off below)
            slot = jnp.where(keep, e_sorted * C + rank, E * C)
            buf = jnp.zeros((E * C + 1, Dm), dtype).at[slot].set(xf[tok_sorted])
            buf = with_constraint(
                buf[: E * C].reshape(E, C, Dm), ("expert", None, "act_embed")
            )
            y = expert_ffn(buf).reshape(E * C, Dm)
            contrib = jnp.where(
                keep[:, None], y[jnp.minimum(slot, E * C - 1)], 0
            ) * w_sorted[:, None]
            out = (
                jnp.zeros((N, Dm), dtype).at[tok_sorted].add(contrib)
            ).reshape(B, S, Dm)

        if cfg.moe_shared_expert_intermediate_size:
            out = out + MLP(cfg, ffn_size=cfg.moe_shared_expert_intermediate_size,
                            name="shared_expert")(x, train=train)
        return out


# --------------------------------------------------------------------------
# Transformer layer + model
# --------------------------------------------------------------------------


class TransformerLayer(nn.Module):
    cfg: GPTConfig
    is_training: bool = False
    layer_idx: Optional[int] = None  # set on the unrolled path (first-k-dense)

    @nn.compact
    def __call__(self, x, positions, kv_cache=None, decode_index=None, kv_valid=None,
                 segment_ids=None, bidir_ids=None):
        cfg = self.cfg
        train = self.is_training
        h = make_norm(cfg, "input_norm")(x)
        if cfg.kv_lora_rank:
            attn = MLAAttention(cfg, name="attention")
        else:
            attn = Attention(cfg, layer_idx=self.layer_idx, name="attention")
        attn_out, kv_cache = attn(
            h, positions, kv_cache=kv_cache, decode_index=decode_index,
            kv_valid=kv_valid, segment_ids=segment_ids, bidir_ids=bidir_ids,
            train=train
        )
        # remat="selective" saves exactly this [B,S,D] per layer: the
        # backward replay then skips qkv projections + the flash kernel
        # forward (the most expensive recompute) at 2·L·B·S·D bytes cost.
        attn_out = checkpoint_name(attn_out, "attn_out")
        if cfg.sandwich_norms:  # gemma2/3: norm the output pre-residual
            attn_out = make_norm(cfg, "attn_out_norm")(attn_out)
        x = x + attn_out
        h = make_norm(cfg, "post_attn_norm")(x)
        if layer_is_moe(cfg, self.layer_idx):
            mlp_out = MoEMLP(cfg, name="moe")(h, train=train)
        else:
            mlp_out = MLP(cfg, name="mlp")(h, train=train)
        if cfg.sandwich_norms:
            mlp_out = make_norm(cfg, "mlp_out_norm")(mlp_out)
        x = x + mlp_out
        x = with_constraint(x, ("batch", "act_seq_sp", "act_embed"))
        return x, kv_cache


class LayerGroup(nn.Module):
    """One pattern-period of a heterogeneous stack (gemma3 5-local+1-global,
    gpt-oss alternate SWA/full, llama4 moe/nope cycles): the cyclic pattern
    repeats every `period` layers, so the whole model is this group scanned
    num_layers/period times — keeping scan's fast compiles where a naive
    per-layer scan can't represent per-layer structure."""

    cfg: GPTConfig
    is_training: bool = False
    period: int = 1

    @nn.compact
    def __call__(self, x, positions, kv_caches, decode_index, kv_valid,
                 segment_ids, bidir_ids=None):
        new_c = []
        for j in range(self.period):
            cache_j = (kv_caches[0][j], kv_caches[1][j])
            x, cache_j = TransformerLayer(
                self.cfg, is_training=self.is_training, layer_idx=j,
                name=f"sub{j}")(
                x, positions, cache_j, decode_index, kv_valid, segment_ids,
                bidir_ids)
            new_c.append(cache_j)
        return x, (jnp.stack([c[0] for c in new_c]),
                   jnp.stack([c[1] for c in new_c]))


class GPTModel(nn.Module):
    """Full model. __call__ returns logits [B, S, V] (fp32)."""

    cfg: GPTConfig

    @nn.compact
    def embed_tokens(self, tokens):
        """Token → embedding lookup (same 'embedding' param as __call__);
        multimodal callers build spliced inputs_embeds from this."""
        embed = self.param(
            "embedding",
            _init(self.cfg.init_method_std, ("vocab", "embed")),
            (self.cfg.vocab_size, self.cfg.hidden_size),
            _dtype(self.cfg.params_dtype),
        )
        return jnp.take(embed, tokens, axis=0)

    @nn.compact
    def __call__(self, tokens, positions=None, *, kv_caches=None, decode_index=None,
                 kv_valid=None, segment_ids=None, bidir_ids=None, train=False,
                 output_hidden=False, inputs_embeds=None, mtp_targets=None):
        """output_hidden=True → return the final-norm hidden states [B,S,D]
        instead of logits (the fused-CE training path computes the LM head
        inside the loss to avoid materializing [B,S,V]).

        inputs_embeds [B,S,D] bypasses token embedding — the multimodal
        entry point (speechlm/vlm splice audio/vision embeddings in;
        reference: speechlm2 SALM / vlm NeVA input pipelines)."""
        cfg = self.cfg
        dtype = _dtype(cfg.compute_dtype)
        if inputs_embeds is not None:
            B, S = inputs_embeds.shape[:2]
        else:
            B, S = tokens.shape
        if positions is None:
            positions = jnp.arange(S)[None, :].repeat(B, 0)

        embed = self.param(
            "embedding",
            _init(cfg.init_method_std, ("vocab", "embed")),
            (cfg.vocab_size, cfg.hidden_size),
            _dtype(cfg.params_dtype),
        )
        if inputs_embeds is not None:
            x = inputs_embeds.astype(dtype)
        else:
            x = jnp.take(embed, tokens, axis=0).astype(dtype)
        if cfg.embedding_multiplier:
            x = x * jnp.asarray(cfg.embedding_multiplier, dtype)
        if cfg.position_embedding_type == "learned_absolute":
            pos_emb = self.param(
                "position_embedding",
                _init(cfg.init_method_std, (None, "embed")),
                (cfg.max_position_embeddings or cfg.seq_length, cfg.hidden_size),
                _dtype(cfg.params_dtype),
            )
            x = x + jnp.take(pos_emb, positions, axis=0).astype(dtype)
        x = with_constraint(x, ("batch", "act_seq_sp", "act_embed"))

        new_caches = None
        period = hetero_period(cfg)
        use_scan = uses_scan_layers(cfg)
        if use_scan:
            layer = TransformerLayer if period == 1 else LayerGroup
            if cfg.remat == "full":
                layer = nn.remat(layer, prevent_cse=False)
            elif cfg.remat == "dots":
                # keep GEMM outputs, recompute elementwise (XLA refuses to
                # rematerialize matmuls anyway; this trades a little HBM for
                # much less recompute than 'full')
                layer = nn.remat(
                    layer,
                    prevent_cse=False,
                    policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                )
            elif cfg.remat == "selective":
                # save only the per-layer attention output ([B,S,D] bf16):
                # backward replay skips qkv projections + the attention
                # kernel but recomputes the (cheap, HBM-bound) norms/MLP.
                # Measured ≈ "full" on v5e at 551M/2k-4k (56-57% MFU both);
                # wins as attention's share of layer FLOPs grows (long S).
                layer = nn.remat(
                    layer,
                    prevent_cse=False,
                    policy=jax.checkpoint_policies.save_only_these_names(
                        "attn_out"),
                )
            ScanLayers = nn.scan(
                layer,
                # intermediates: stacked per layer so debug capture
                # (utils/debug_hook.py) sees inside the scanned stack
                variable_axes={"params": 0, "losses": 0, "intermediates": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, 0, nn.broadcast, nn.broadcast,
                         nn.broadcast, nn.broadcast),
                length=cfg.num_layers // period,
                metadata_params={nn.PARTITION_NAME: "layers"},
            )
            if kv_caches is None:
                empty = init_kv_caches(cfg, B, 0, dtype)
                caches_in = (empty[0], empty[1])
            else:
                caches_in = kv_caches  # stacked [L, B, T, G, D] pair
            if period > 1:
                caches_in = jax.tree.map(
                    lambda c: c.reshape(
                        cfg.num_layers // period, period, *c.shape[1:]),
                    caches_in)
                mod = ScanLayers(cfg, is_training=train, period=period,
                                 name="layers")
            else:
                mod = ScanLayers(cfg, is_training=train, name="layers")
            x, new_caches = mod(
                x, positions, caches_in, decode_index, kv_valid, segment_ids,
                bidir_ids
            )
            if kv_caches is None:
                new_caches = None
            elif period > 1:
                new_caches = jax.tree.map(
                    lambda c: c.reshape(cfg.num_layers, *c.shape[2:]),
                    new_caches)
        else:
            # caches may arrive stacked ([L, ...] arrays) or as per-layer
            # tuples ((k_0..k_L-1), (v_0..v_L-1)). The tuple form is the
            # decode hot path: slicing layer i out of a stacked pool every
            # step costs a pool-sized HBM read, and re-stacking writes the
            # whole pool back — ~25% of a 1B decode step in the chip trace
            # (slice_bitcast_fusion + loop-carry copy). Callers that scan
            # decode steps unstack ONCE outside the scan and pass tuples.
            tupled = kv_caches is not None and isinstance(
                kv_caches[0], (list, tuple))
            new_caches = []
            for i in range(cfg.num_layers):
                cache_i = None
                if tupled:
                    cache_i = (kv_caches[0][i], kv_caches[1][i])
                elif kv_caches is not None:
                    cache_i = jax.tree.map(lambda c: c[i], kv_caches)
                x, cache_i = TransformerLayer(cfg, is_training=train, layer_idx=i, name=f"layer{i}")(
                    x, positions, cache_i, decode_index, kv_valid, segment_ids,
                    bidir_ids
                )
                new_caches.append(cache_i)
            if tupled:
                new_caches = (tuple(c[0] for c in new_caches),
                              tuple(c[1] for c in new_caches))
            elif kv_caches is not None:
                # tree-map stacking: int8 caches are {'q','s'} dicts per
                # side, not bare arrays (unrolled layers + quantized KV)
                k_list = [c[0] for c in new_caches]
                v_list = [c[1] for c in new_caches]
                new_caches = (
                    jax.tree.map(lambda *xs: jnp.stack(xs), *k_list),
                    jax.tree.map(lambda *xs: jnp.stack(xs), *v_list),
                )
            else:
                new_caches = None

        x = make_norm(cfg, "final_norm")(x)
        mtp_hidden = None
        if cfg.mtp_num_layers > 0 and mtp_targets is not None:
            # deepseek-V3 MTP block (reference gpt/model/base.py:225):
            # predict token t+2 from the trunk's h_t fused with the
            # embedding of the ALREADY-KNOWN next token x_{t+1}
            nxt = jnp.take(embed, mtp_targets, axis=0).astype(dtype)
            h_n = make_norm(cfg, "mtp_h_norm")(x).astype(dtype)
            e_n = make_norm(cfg, "mtp_e_norm")(nxt).astype(dtype)
            m = nn.DenseGeneral(
                features=cfg.hidden_size, use_bias=False, dtype=dtype,
                param_dtype=_dtype(cfg.params_dtype),
                kernel_init=_init(cfg.init_method_std, (None, "embed")),
                name="mtp_proj",
            )(jnp.concatenate([h_n, e_n], axis=-1))
            for i in range(cfg.mtp_num_layers):
                m, _ = TransformerLayer(
                    cfg, is_training=train, name=f"mtp_layer{i}")(
                    m, positions)
            mtp_hidden = make_norm(cfg, "mtp_final_norm")(m)
        if output_hidden:
            if mtp_hidden is not None:
                return x, mtp_hidden
            if kv_caches is not None:
                return x, new_caches
            return x

        if cfg.share_embeddings_and_output_weights:
            logits = jnp.einsum("bsd,vd->bsv", x, embed.astype(dtype))
        elif cfg.quantization == "int8_ptq":
            # int8-resident vocab projection (the head is a large share of
            # decode weight bytes at small models); other quantization
            # modes keep the head full-precision (training numerics)
            from nemo_tpu.ops.quant import QuantDense

            logits = QuantDense(
                features=cfg.vocab_size, mode="int8_ptq", dtype=dtype,
                name="lm_head",
            )(x)
        else:
            logits = nn.DenseGeneral(
                features=cfg.vocab_size,
                use_bias=False,
                dtype=dtype,
                param_dtype=_dtype(cfg.params_dtype),
                kernel_init=_init(cfg.init_method_std, ("embed", "vocab")),
                name="lm_head",
            )(x)
        if cfg.logit_softcapping:
            c = cfg.logit_softcapping
            logits = c * jnp.tanh(logits.astype(jnp.float32) / c)
        logits = with_constraint(logits.astype(jnp.float32), ("batch", "act_seq", "vocab"))
        if kv_caches is not None:
            return logits, new_caches
        return logits


def init_kv_caches(cfg: GPTConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
    """Stacked KV cache: ([L, B, T, G, Dk], [L, B, T, G, Dv]).

    dtype=jnp.int8 builds a QUANTIZED cache (vLLM kv_cache_dtype=int8
    analog): each side becomes {'q': int8 [L,B,T,G,D], 's': f32 per-
    (token,head) scale [L,B,T,G,1]} — half the bf16 KV bytes in HBM and
    per decode-step read; writes quantize, reads dequantize
    (see _update_kv_cache). Engines pass cache_dtype=jnp.int8."""
    if cfg.kv_lora_rank:
        # MLA latent cache: side 0 = c_kv latents, side 1 = shared roped
        # k_pe — (r + dr) floats/token vs H·(dn+dr+dv) for full K/V
        # (deepseek-v3: 576 vs 57344 — the MLA memory win, exact)
        G, Dk, Dv = 1, cfg.kv_lora_rank, cfg.qk_pos_emb_head_dim
    else:
        G, Dk, Dv = cfg.n_kv_heads, cfg.head_dim, cfg.head_dim
    if dtype == jnp.int8:
        def side(D):
            return {"q": jnp.zeros((cfg.num_layers, batch, max_len, G, D), jnp.int8),
                    "s": jnp.zeros((cfg.num_layers, batch, max_len, G, 1), jnp.float32)}
        return (side(Dk), side(Dv))
    return (
        jnp.zeros((cfg.num_layers, batch, max_len, G, Dk), dtype),
        jnp.zeros((cfg.num_layers, batch, max_len, G, Dv), dtype),
    )
