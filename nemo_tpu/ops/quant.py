"""Quantized GEMMs for training and inference (fp8 / int8).

Reference parity: MegatronMixedPrecision fp8 plumbing
(`nemo/lightning/pytorch/plugins/mixed_precision.py:55-243` — DtypeConfig
fp8='hybrid', e4m3 forward / e5m2 backward via TransformerEngine) and the
PTQ path (`nemo/collections/llm/api.py:305` quantization).

TPU-native design — no TE, no per-tensor state objects:
- *Current scaling* (per-call amax), the modern TE recipe
  (``Float8CurrentScaling``): every quantized tensor gets scale =
  amax/dtype_max computed on the spot, so there is no delayed-scaling
  amax history to checkpoint and the whole thing stays functional
  (jit/scan/vmap-safe).
- fp8: e4m3 for activations/weights on the forward GEMM, e5m2 for the
  incoming gradient on the two backward GEMMs (dgrad/wgrad) — the
  "hybrid" recipe. XLA lowers fp8 dot_general to native MXU fp8 where
  the chip supports it and to an upcast dot elsewhere; numerics are the
  fp8 numerics either way.
- int8: symmetric per-tensor round-to-nearest on the forward GEMM
  (int8×int8→int32 rides the v5e MXU at 2× bf16 throughput); backward
  stays bf16 — int8 gradients are too lossy for training.

The straight-through parts are exact: the custom VJP differentiates the
*quantized* forward product w.r.t. the fp32 inputs (d/dx of q(x)·q(w) ≈
q(w), the standard STE), matching TE semantics.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

E4M3 = jnp.float8_e4m3fn
E5M2 = jnp.float8_e5m2


def _dtype_max(dtype) -> float:
    if dtype == jnp.int8:
        return 127.0
    return float(jnp.finfo(dtype).max)


def quantize(x: jnp.ndarray, dtype) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-tensor quantization with current (just-in-time) scaling.

    Returns (q, scale) with x ≈ q.astype(f32) * scale."""
    maxval = _dtype_max(dtype)
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(amax, 1e-12) / maxval
    y = x.astype(jnp.float32) / scale
    y = jnp.clip(y, -maxval, maxval)
    if dtype == jnp.int8:
        y = jnp.round(y)
    return y.astype(dtype), scale


def _qdot(qx, qw, sx, sw, out_dtype):
    """dot(qx, qw) over the last/first axes with dequant scales applied."""
    acc = jnp.int32 if qx.dtype == jnp.int8 else jnp.float32
    y = jax.lax.dot_general(
        qx, qw, (((qx.ndim - 1,), (0,)), ((), ())), preferred_element_type=acc
    )
    return (y.astype(jnp.float32) * (sx * sw)).astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def quant_matmul(x: jnp.ndarray, w: jnp.ndarray, mode: str = "fp8",
                 out_dtype: Any = jnp.bfloat16) -> jnp.ndarray:
    """[.., K] @ [K, N] with quantized operands.

    mode: "fp8" (e4m3 fwd, e5m2 bwd grads) | "fp8_e4m3" (e4m3 everywhere)
        | "int8" (int8 fwd, bf16 bwd).
    """
    fwd_q = jnp.int8 if mode == "int8" else E4M3
    qx, sx = quantize(x, fwd_q)
    qw, sw = quantize(w, fwd_q)
    return _qdot(qx, qw, sx, sw, out_dtype)


def _qm_fwd(x, w, mode, out_dtype):
    fwd_q = jnp.int8 if mode == "int8" else E4M3
    qx, sx = quantize(x, fwd_q)
    qw, sw = quantize(w, fwd_q)
    y = _qdot(qx, qw, sx, sw, out_dtype)
    # zero-size dtype carriers: residuals must be JAX types, and the bwd
    # must return cotangents in the primal dtypes
    return y, (qx, sx, qw, sw, jnp.zeros((0,), x.dtype), jnp.zeros((0,), w.dtype))


def _qm_bwd(mode, out_dtype, res, g):
    qx, sx, qw, sw, x_proto, w_proto = res
    x_dtype, w_dtype = x_proto.dtype, w_proto.dtype
    if mode == "int8":
        # bf16 backward against the dequantized operands (STE)
        gb = g.astype(jnp.bfloat16)
        wdq = (qw.astype(jnp.float32) * sw).astype(jnp.bfloat16)
        xdq = (qx.astype(jnp.float32) * sx).astype(jnp.bfloat16)
        dx = jax.lax.dot_general(
            gb, wdq, (((gb.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        x2 = xdq.reshape(-1, xdq.shape[-1])
        g2 = gb.reshape(-1, gb.shape[-1])
        dw = jax.lax.dot_general(
            x2, g2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return dx.astype(x_dtype), dw.astype(w_dtype)
    bwd_q = E4M3 if mode == "fp8_e4m3" else E5M2
    qg, sg = quantize(g, bwd_q)
    # dgrad: g [.., N] @ w.T [N, K]
    dx = jax.lax.dot_general(
        qg, qw, (((qg.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * (sg * sw)
    # wgrad: x.T [K, M] @ g [M, N]
    qx2 = qx.reshape(-1, qx.shape[-1])
    qg2 = qg.reshape(-1, qg.shape[-1])
    dw = jax.lax.dot_general(
        qx2, qg2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * (sx * sg)
    return dx.astype(x_dtype), dw.astype(w_dtype)


quant_matmul.defvjp(_qm_fwd, _qm_bwd)


class QuantDense(nn.Module):
    """Drop-in nn.DenseGeneral with a quantized GEMM core.

    Supports the DenseGeneral surface used by our models: `features` int or
    tuple, `axis` int or tuple of trailing axes, bias, logical-partitioned
    kernel init. The GEMM runs via quant_matmul (fp8/int8, current scaling);
    bias add and everything around it stay in `dtype`.

    mode="int8_ptq" is the WEIGHT-RESIDENT serving path (reference: the
    TRT-LLM qnemo quantized-engine flow, SURVEY §2.7): the kernel is STORED
    as an int8 param `qkernel` plus a per-output-channel fp32 `scale`, so
    decode reads ¼ the f32 / ½ the bf16 weight bytes from HBM and the GEMM
    runs int8×int8→int32 on the MXU's native int8 pipe (2× bf16 peak on
    v5e). Activations are quantized per-token on the fly (dynamic W8A8).
    A raw-initialized int8_ptq model is all-zeros — build params with
    `ptq_params_for_serving` from a trained bf16/f32 checkpoint.
    """

    features: Any  # int | tuple
    mode: str = "fp8"
    axis: Any = -1
    use_bias: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        features = self.features if isinstance(self.features, tuple) else (self.features,)
        axis = self.axis if isinstance(self.axis, tuple) else (self.axis,)
        axis = tuple(a % x.ndim for a in axis)
        contract = tuple(x.shape[a] for a in axis)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, features, self.param_dtype)
        batch_shape = tuple(x.shape[i] for i in range(x.ndim) if i not in axis)
        # move contracting axes last, flatten
        perm = [i for i in range(x.ndim) if i not in axis] + list(axis)
        xt = jnp.transpose(x, perm).reshape(batch_shape + (int(np.prod(contract)),))
        if self.mode == "int8_ptq":
            # scale keeps kernel ndim with contraction dims = 1 so the
            # converter can tell channel axes from reduced axes (and scan
            # layer-stacking prepends a real leading dim to both params)
            qkernel = self.param(
                "qkernel", nn.initializers.zeros, contract + features, jnp.int8)
            scale = self.param(
                "scale", nn.initializers.ones,
                (1,) * len(contract) + features, jnp.float32)
            k2 = qkernel.reshape(int(np.prod(contract)), int(np.prod(features)))
            # W8A16 dequant-on-read: XLA fuses the int8→bf16 convert into
            # the matmul's weight load, so HBM reads stay at int8 bytes
            # while the GEMM runs at full bf16 speed. Chip-measured at
            # serving shapes ([8,2048]x[2048,8192]): 871 GB/s of int8
            # bytes vs 167 GB/s for the int8xint8->int32 dot (XLA lowers
            # that without a fast path) and 215 GB/s for f32-accum — the
            # int8 serving win is bandwidth, not the MXU int8 pipe. Also
            # strictly more accurate than W8A8 (activations unquantized).
            acc = jax.lax.dot_general(
                xt.astype(self.dtype), k2.astype(self.dtype),
                (((xt.ndim - 1,), (0,)), ((), ())))
            y = (acc * scale.reshape(-1).astype(acc.dtype)).astype(self.dtype)
        else:
            kernel = self.param(
                "kernel", self.kernel_init, contract + features, self.param_dtype)
            k2 = kernel.reshape(int(np.prod(contract)), int(np.prod(features)))
            y = quant_matmul(xt, k2, self.mode, self.dtype)
        y = y.reshape(batch_shape + features)
        if self.use_bias:
            y = y + bias.astype(self.dtype)
        return y


def dense_layer(quantization: Optional[str], **kw):
    """Factory: nn.DenseGeneral, or QuantDense when quantization is set.

    Models route their large GEMMs through this so `cfg.quantization`
    in {"fp8","fp8_e4m3","int8"} flips the whole network."""
    if quantization:
        return QuantDense(mode=quantization, **kw)
    return nn.DenseGeneral(**kw)


# --------------------------------------------------------------------------
# PTQ: weight-only int8 for inference (reference: llm/api.py:305 `ptq`)
# --------------------------------------------------------------------------


def quantize_params_int8(params, min_size: int = 1 << 16):
    """Post-training weight-only int8: replace every float kernel >= min_size
    elements with (int8 q, per-output-channel fp32 scale). Returns a pytree of
    the same structure where quantized leaves become dicts
    {"q": int8, "scale": f32} — consumed by dequantize_params."""

    def _q(path, leaf):
        if not isinstance(leaf, jnp.ndarray) and not isinstance(leaf, np.ndarray):
            return leaf
        if leaf.ndim < 2 or leaf.size < min_size or not jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf
        x = jnp.asarray(leaf, jnp.float32)
        amax = jnp.max(jnp.abs(x), axis=tuple(range(x.ndim - 1)), keepdims=True)
        scale = jnp.maximum(amax, 1e-12) / 127.0
        q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
        return {"q": q, "scale": scale}

    return jax.tree_util.tree_map_with_path(_q, params)


def ptq_convert_params(src_params, abstract_ptq_params):
    """Map a trained f32/bf16 param tree onto an int8_ptq model's tree.

    `abstract_ptq_params` is `jax.eval_shape` of the quantization="int8_ptq"
    model's init (unboxed). Every `qkernel` leaf takes the per-channel
    int8 quantization of the source tree's sibling `kernel`; its `scale`
    sibling gets amax/127 reduced over exactly the axes the abstract scale
    holds as size-1 (so scan-stacked layer dims keep per-layer scales).
    All other leaves copy through (cast to the abstract dtype)."""
    from flax import traverse_util

    flat_src = traverse_util.flatten_dict(src_params)
    flat_abs = traverse_util.flatten_dict(abstract_ptq_params)

    def _pair(path):
        """(src_kernel_path, scale_path) for an int8 leaf, else None.
        Pairs: `qkernel`/`scale` (QuantDense) and `X_q`/`X_scale` (MoE)."""
        name = path[-1]
        if name == "qkernel":
            return path[:-1] + ("kernel",), path[:-1] + ("scale",)
        if name.endswith("_q") and (path[:-1] + (name[:-2] + "_scale",)) in flat_abs:
            return path[:-1] + (name[:-2],), path[:-1] + (name[:-2] + "_scale",)
        return None

    scale_paths = {p[1] for p in filter(None, map(_pair, flat_abs))}
    out = {}
    for path, spec in flat_abs.items():
        pair = _pair(path)
        if pair is not None:
            src_path, scale_path = pair
            k = jnp.asarray(flat_src[src_path], jnp.float32)
            s_spec = flat_abs[scale_path]
            red = tuple(i for i, d in enumerate(s_spec.shape) if d == 1)
            amax = jnp.max(jnp.abs(k), axis=red, keepdims=True)
            scale = jnp.maximum(amax, 1e-12) / 127.0
            out[path] = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
            out[scale_path] = scale.astype(jnp.float32)
        elif path in scale_paths:
            continue  # written alongside its int8 leaf
        else:
            out[path] = jnp.asarray(flat_src[path], spec.dtype)
    return traverse_util.unflatten_dict(out)


def ptq_params_for_serving(cfg, params):
    """(cfg, trained params) → (cfg_q, int8-resident params) for decode.

    Returns the `quantization="int8_ptq"` config plus the converted tree;
    feed both to GenerationEngine / ContinuousBatchingEngine. Weights sit
    in HBM as int8 (half the bf16 bytes — decode is weight-bandwidth
    bound) and GEMMs run on the MXU int8 pipe."""
    import dataclasses

    from nemo_tpu.models.llm.gpt import GPTModel

    cfg_q = dataclasses.replace(cfg, quantization="int8_ptq")
    model = GPTModel(cfg_q)
    tokens = jnp.zeros((1, min(cfg.seq_length, 8)), jnp.int32)
    abstract = jax.eval_shape(
        lambda r: nn.meta.unbox(model.init(r, tokens)["params"]),
        jax.random.PRNGKey(0))
    return cfg_q, ptq_convert_params(params, abstract)


def dequantize_params(params, dtype=jnp.bfloat16):
    """Inverse of quantize_params_int8 (materializes dtype weights)."""

    def _is_q(n):
        return isinstance(n, dict) and set(n.keys()) == {"q", "scale"}

    def _dq(n):
        if _is_q(n):
            return (n["q"].astype(jnp.float32) * n["scale"]).astype(dtype)
        return n

    return jax.tree_util.tree_map(_dq, params, is_leaf=_is_q)
