"""Minimal functional NN layer library.

Parameters are plain nested dicts of jnp arrays (pytrees) — no module
framework. Every layer is a pair of functions: `*_init(key, ...) -> params`
and the apply function. Weight layout conventions:

- linear kernels are stored [in, out] (jnp.dot-friendly; HF checkpoints store
  [out, in] and are transposed at load time, see checkpoint.py)
- convs use NCHW activations and OIHW kernels to match checkpoint layout;
  XLA on TPU relayouts internally.

Numerics notes (parity with the reference bf16 paths):
- rms_norm and layer_norm compute statistics in float32
  (reference modeling_qwen2_5_vl.py:135-140)
- softmax in attention is float32 (reference :784)
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def lecun_normal(key, shape, dtype=jnp.float32, std=0.02):
    return (jax.random.normal(key, shape) * std).astype(dtype)


# ----------------------------------------------------------------- linear

def linear_init(key, in_dim, out_dim, bias=True, dtype=jnp.float32, std=0.02):
    kw, kb = jax.random.split(key)
    p = {"w": lecun_normal(kw, (in_dim, out_dim), dtype, std)}
    if bias:
        p["b"] = jnp.zeros((out_dim,), dtype)
    return p


# static outlier-channel budget for w8a8 (LLM.int8-style decomposition with
# a FIXED channel count so shapes stay static under jit; Qwen2.5-family
# trunks carry extreme activation-outlier channels that per-token symmetric
# quant would otherwise clip into the scale)
W8A8_OUTLIER_CHANNELS = 64


def linear(p, x):
    # a8 applies only to multi-token (prefill/encode) calls: decode steps
    # (seq dim 1, statically known) stream int8 weights already and would
    # pay activation-quant error for zero bandwidth gain
    if "w_q" in p:
        if "a8" in p and x.ndim >= 2 and x.shape[-2] > 1:
            # w8a8: dynamic per-row (per-token) activation quantization; the
            # int8 x int8 -> int32 dot runs on the MXU's double-rate int8
            # path (v5e 394 TOPS vs 197 bf16 TFLOPS). The amax/round/clip
            # chain is VPU work XLA fuses into the surrounding elementwise
            # ops. int32 accumulation is exact: 127^2 * K stays < 2^31 for
            # every contraction in this model (max K 11008 -> 1.8e8).
            #
            # Outlier decomposition (LLM.int8, static-shape variant): the
            # top-k activation columns by absmax bypass quantization — their
            # weight rows are gathered and dequantized, and their (tiny)
            # [.., k] x [k, out] product runs in f32; the remaining columns
            # quantize against a scale that no longer sees the outliers.
            xf = x.astype(jnp.float32)
            in_dim = xf.shape[-1]
            k = min(W8A8_OUTLIER_CHANNELS, in_dim // 8)
            y_out = 0.0
            if k > 0:
                col_amax = jnp.max(jnp.abs(xf),
                                   axis=tuple(range(xf.ndim - 1)))
                _, oidx = jax.lax.top_k(col_amax, k)
                x_o = jnp.take(xf, oidx, axis=-1)              # [..., k]
                w_o = (jnp.take(p["w_q"], oidx, axis=0).astype(jnp.float32)
                       * p["scale"][None, :])                  # [k, out]
                y_out = jnp.dot(x_o, w_o)
                keep = jnp.ones((in_dim,), jnp.float32).at[oidx].set(0.0)
                xf = xf * keep
            sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                             1e-6) * (1.0 / 127.0)
            x_q = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                x_q, p["w_q"], (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = (acc.astype(jnp.float32) * sx
                 * p["scale"] + y_out).astype(x.dtype)
        else:
            # weight-only int8: XLA TPU supports mixed bf16 x int8 dots
            # natively, so weights stream from HBM at 1 byte each with no
            # converted copy
            y = jax.lax.dot_general(
                x, p["w_q"], (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=x.dtype)
            y = y * p["scale"].astype(x.dtype)
    elif "w_q4" in p:
        # weight-only int4 (two nibbles per HBM byte). On TPU a Pallas
        # kernel unpacks per-tile in VMEM (XLA would materialize the
        # unpacked weight to HBM on every use); elsewhere fall back to the
        # halves formulation in plain XLA.
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        if jax.default_backend() == "cpu":
            from vlm_fo1_tpu.quant import unpack_int4_halves

            khalf = p["w_q4"].shape[-2]
            lo, hi = unpack_int4_halves(p["w_q4"])
            acc = jax.lax.dot_general(
                x2[:, :khalf], lo.astype(x.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc += jax.lax.dot_general(
                x2[:, khalf:], hi.astype(x.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            y2 = (acc * p["scale"].astype(jnp.float32)).astype(x.dtype)
        else:
            from vlm_fo1_tpu.ops.int4_matmul import int4_matmul

            y2 = int4_matmul(x2, p["w_q4"], p["scale"])
        y = y2.reshape(*lead, y2.shape[-1])
    else:
        y = jnp.dot(x, p["w"])
    if "b" in p:
        y = y + p["b"]
    return y


# ------------------------------------------------------------------ norms

def rms_norm_init(dim, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype)}


def rms_norm(p, x, eps=1e-6):
    dt = x.dtype
    # promote, don't force: f64 stays f64 (the UPN f64 oracle), bf16 -> f32
    xf = x.astype(jnp.promote_types(dt, jnp.float32))
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return (p["scale"] * xf.astype(dt)).astype(dt)


def layer_norm_init(dim, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(p, x, eps=1e-5):
    dt = x.dtype
    xf = x.astype(jnp.promote_types(dt, jnp.float32))
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (xf.astype(dt) * p["scale"] + p["bias"]).astype(dt)


def group_norm_init(dim, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def group_norm(p, x, groups: int, eps=1e-5):
    """Channel-last GroupNorm over [..., H, W, C]."""
    dt = x.dtype
    *lead, h, w, c = x.shape
    xf = x.astype(jnp.promote_types(dt, jnp.float32)).reshape(
        *lead, h * w, groups, c // groups)
    mean = xf.mean(axis=(-3, -1), keepdims=True)
    var = xf.var(axis=(-3, -1), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(*lead, h, w, c)
    return (xf.astype(dt) * p["scale"] + p["bias"]).astype(dt)


# ------------------------------------------------------------------ convs

def conv2d_init(key, in_ch, out_ch, kernel_size, bias=True, groups=1,
                dtype=jnp.float32, std=0.02):
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size, kernel_size)
    kw, kb = jax.random.split(key)
    p = {"w": lecun_normal(kw, (out_ch, in_ch // groups, *kernel_size), dtype, std)}
    if bias:
        p["b"] = jnp.zeros((out_ch,), dtype)
    return p


def conv2d(p, x, stride=1, padding=0, groups=1):
    """NCHW conv with OIHW kernel."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=stride, padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
        preferred_element_type=jnp.promote_types(x.dtype, jnp.float32),
    ).astype(x.dtype)
    if "b" in p:
        y = y + p["b"][None, :, None, None].astype(y.dtype)
    return y


def embedding_init(key, vocab, dim, dtype=jnp.float32, std=0.02):
    return {"w": lecun_normal(key, (vocab, dim), dtype, std)}


def embedding(p, ids, dtype=None):
    # mode="clip": out-of-vocab ids clamp to the last row instead of jnp.take's
    # default NaN fill — keeps sentinel/oversized ids from poisoning the stream
    if "w_q" in p:
        # row-quantized table (quant.quantize_embedding): gather int8 rows
        # and their per-row scales, dequantize only what was looked up.
        # `dtype` sets the activation dtype (callers pass the model compute
        # dtype; bf16 is the serving default).
        dt = dtype or jnp.bfloat16
        rows = jnp.take(p["w_q"], ids, axis=0, mode="clip")
        scale = jnp.take(p["scale"], ids, axis=0, mode="clip")
        return rows.astype(dt) * scale[..., None].astype(dt)
    return jnp.take(p["w"], ids, axis=0, mode="clip")


# ------------------------------------------------------------- activations

ACT = {
    "silu": jax.nn.silu,
    "gelu": partial(jax.nn.gelu, approximate=False),
    "gelu_tanh": partial(jax.nn.gelu, approximate=True),
    "relu": jax.nn.relu,
    "quick_gelu": lambda x: x * jax.nn.sigmoid(1.702 * x),
}


# ------------------------------------------------------------- attention

def sdpa(q, k, v, mask=None, scale=None):
    """Scaled dot-product attention with fp32 softmax.

    q: [..., Sq, H, D], k/v: [..., Sk, H, D] (head axis second-to-last is the
    layout used across this codebase); mask broadcastable to
    [..., H, Sq, Sk] with True = attend.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    # promote (not force) the accumulator so f64 inputs (the full-scale
    # UPN f64 oracle) keep f64 accumulation; bf16/f32 accumulate in f32
    logits = jnp.einsum(
        "...qhd,...khd->...hqk", q, k,
        preferred_element_type=jnp.promote_types(q.dtype, jnp.float32),
    ) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    # store logits in the input dtype (f32 accumulation happens in the
    # matmul; bf16 storage matches the reference's bf16 torch.matmul
    # output) — the softmax fusion upcasts to f32 internally, so only
    # half-width logits/probs ever touch HBM on the bf16 path
    logits = logits.astype(q.dtype)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("...hqk,...khd->...qhd", probs, v)


def mlp_gelu_init(key, in_dim, hidden, depth=2, dtype=jnp.float32):
    """`mlpNx_gelu` projector stack (reference multimodal_projector/builder.py:64-71)."""
    keys = jax.random.split(key, depth)
    layers = [linear_init(keys[0], in_dim, hidden, dtype=dtype)]
    for i in range(1, depth):
        layers.append(linear_init(keys[i], hidden, hidden, dtype=dtype))
    return {"layers": layers}


def mlp_gelu(p, x):
    y = linear(p["layers"][0], x)
    for lp in p["layers"][1:]:
        y = linear(lp, jax.nn.gelu(y, approximate=False))
    return y


def count_params(params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))
