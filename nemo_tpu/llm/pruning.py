"""Structured pruning for GPT models (Minitron-style width/depth pruning).

Reference parity: `nemo/collections/llm/api.py:476` (`prune`, backed by
megatron model-optimizer structured pruning: drop MLP neurons / whole
layers by activation- or magnitude-importance, then re-train).

TPU-native shape: params are a pytree with scan-stacked layers
([L, ...] leading axis), so width pruning is a per-layer top-k gather on
the ffn axis and depth pruning is a slice on the leading layers axis —
both pure array ops, no graph surgery.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from nemo_tpu.models.llm.config import GPTConfig


def mlp_neuron_importance(params, gated: bool) -> jnp.ndarray:
    """Per-layer importance of each FFN neuron: |fc1 col| · |fc2 row|
    (magnitude proxy for the neuron's contribution; the reference's
    activation-based importance needs calibration data — this is the
    data-free variant). Returns [L, ffn]."""
    w1 = jnp.asarray(params["layers"]["mlp"]["fc1"]["kernel"], jnp.float32)  # [L, D, mult*F]
    w2 = jnp.asarray(params["layers"]["mlp"]["fc2"]["kernel"], jnp.float32)  # [L, F, D]
    F = w2.shape[1]
    if gated:
        gate, up = w1[..., :F], w1[..., F:]
        in_norm = jnp.linalg.norm(gate, axis=1) * jnp.linalg.norm(up, axis=1)  # [L, F]
    else:
        in_norm = jnp.linalg.norm(w1, axis=1)
    out_norm = jnp.linalg.norm(w2, axis=2)  # [L, F]
    return in_norm * out_norm


def prune_width(cfg: GPTConfig, params, new_ffn: int):
    """Keep the new_ffn most-important FFN neurons per layer.
    Returns (new_cfg, new_params)."""
    if new_ffn > cfg.ffn_hidden_size:
        raise ValueError("new_ffn must be <= current ffn_hidden_size")
    imp = mlp_neuron_importance(params, cfg.gated_linear_unit)  # [L, F]
    _, keep = jax.lax.top_k(imp, new_ffn)  # [L, new_ffn]
    keep = jnp.sort(keep, axis=-1)
    F = cfg.ffn_hidden_size

    params = jax.tree.map(lambda x: x, params)  # shallow copy tree
    mlp = dict(params["layers"]["mlp"])
    fc1 = dict(mlp["fc1"])
    fc2 = dict(mlp["fc2"])
    w1 = jnp.asarray(fc1["kernel"])
    w2 = jnp.asarray(fc2["kernel"])

    def take_cols(w_l, idx):  # [D, F'] gather on last axis
        return jnp.take(w_l, idx, axis=-1)

    if cfg.gated_linear_unit:
        gate = jax.vmap(take_cols)(w1[..., :F], keep)
        up = jax.vmap(take_cols)(w1[..., F:], keep)
        fc1["kernel"] = jnp.concatenate([gate, up], axis=-1)
    else:
        fc1["kernel"] = jax.vmap(take_cols)(w1, keep)
    if "bias" in fc1:
        b = jnp.asarray(fc1["bias"])
        if cfg.gated_linear_unit:
            bg = jax.vmap(lambda bl, i: jnp.take(bl, i))(b[..., :F], keep)
            bu = jax.vmap(lambda bl, i: jnp.take(bl, i))(b[..., F:], keep)
            fc1["bias"] = jnp.concatenate([bg, bu], axis=-1)
        else:
            fc1["bias"] = jax.vmap(lambda bl, i: jnp.take(bl, i))(b, keep)
    fc2["kernel"] = jax.vmap(lambda w_l, i: jnp.take(w_l, i, axis=0))(w2, keep)

    mlp["fc1"], mlp["fc2"] = fc1, fc2
    layers = dict(params["layers"])
    layers["mlp"] = mlp
    new_params = dict(params)
    new_params["layers"] = layers
    new_cfg = dataclasses.replace(cfg, ffn_hidden_size=new_ffn)
    return new_cfg, new_params


def layer_importance_cosine(cfg: GPTConfig, params, tokens) -> np.ndarray:
    """Block-importance: 1 − cos(h_in, h_out) per layer on a probe batch
    (Minitron/ShortGPT-style depth metric). Returns [L] — higher = more
    important. Requires scan_layers params."""
    from nemo_tpu.models.llm.gpt import GPTModel, TransformerLayer

    model = GPTModel(cfg)
    L = cfg.num_layers
    # run layer-by-layer on the host: embed, then apply each layer slice
    embed = jnp.asarray(params["embedding"])
    dtype = jnp.float32
    x = jnp.take(embed, tokens, axis=0).astype(dtype)
    if cfg.embedding_multiplier:
        x = x * cfg.embedding_multiplier
    positions = jnp.arange(tokens.shape[1])[None, :].repeat(tokens.shape[0], 0)
    layer = TransformerLayer(cfg, is_training=False)
    imps = []
    for i in range(L):
        p_i = jax.tree.map(lambda w: w[i], params["layers"])
        y, _ = layer.apply({"params": p_i}, x, positions)
        num = jnp.sum(x * y, axis=-1)
        den = jnp.linalg.norm(x, axis=-1) * jnp.linalg.norm(y, axis=-1) + 1e-9
        imps.append(1.0 - float(jnp.mean(num / den)))
        x = y
    return np.asarray(imps)


def prune_depth(cfg: GPTConfig, params, new_layers: int,
                keep: Optional[Sequence[int]] = None,
                probe_tokens=None):
    """Drop to new_layers layers. `keep` gives explicit indices; otherwise
    ranks layers by cosine block-importance on probe_tokens (or keeps the
    first/last + most-central if no probe given). Returns (new_cfg, new_params)."""
    L = cfg.num_layers
    if new_layers > L:
        raise ValueError("new_layers must be <= num_layers")
    if keep is None:
        if probe_tokens is not None:
            imp = layer_importance_cosine(cfg, params, probe_tokens)
            keep = np.sort(np.argsort(-imp)[:new_layers])
        else:
            # drop a contiguous middle block (ShortGPT finding: middle layers
            # are most redundant); always keep first and last
            drop = L - new_layers
            start = (L - drop) // 2
            keep = [i for i in range(L) if not (start <= i < start + drop)]
    keep = jnp.asarray(sorted(keep), jnp.int32)
    layers = jax.tree.map(lambda w: jnp.take(w, keep, axis=0), params["layers"])
    new_params = dict(params)
    new_params["layers"] = layers
    return dataclasses.replace(cfg, num_layers=new_layers), new_params
