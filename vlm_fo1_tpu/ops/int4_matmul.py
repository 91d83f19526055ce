"""Pallas TPU kernel: matmul with nibble-packed int4 weights.

Why a kernel: XLA must MATERIALIZE dot operands, so an XLA-level int4
unpack writes the full int8 weight back to HBM on every use — measured 7x
slower than int8 at decode. Here the packed bytes stream HBM -> VMEM once
per tile and the two nibble halves are sign-extended in VMEM (two
arithmetic shifts on the VPU) right before the MXU dots; HBM traffic is the
packed weight only (half of int8).

Packing convention (quant._quantize_weight_int4): byte[k, n] holds
w[k, n] in the low nibble and w[k + K/2, n] in the high nibble, so
  y = x[:, :K/2] @ lo + x[:, K/2:] @ hi
with no interleave or concat — each half feeds its own MXU dot.

Replaces the role of the reference's bitsandbytes 4-bit CUDA kernels
(model/builder.py:28-36).

Positioning: int4 HALVES weight residency/HBM traffic vs int8 and this
kernel is ~3.5x faster than the XLA-materializing formulation, but on the
tunneled single chip the per-pallas_call launch overhead (~25us x 252
linears/token) still makes int4 decode ~2x slower than the native int8
mixed dot. Like bitsandbytes 4-bit on GPUs, load_4bit is the
memory-constrained deployment option; load_8bit is the speed-optimal one.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, scale_ref, o_ref, *, khalf: int):
    # Mosaic cannot legalize vector shifts on narrow ints (arith.shli on
    # i8), so unpack arithmetically in int32: hi = floor(p/16) (arithmetic
    # shift semantics for negatives too), lo = p - 16*hi sign-corrected.
    p32 = w_ref[:].astype(jnp.int32)                   # [K/2, TN]
    hi = jnp.floor_divide(p32, 16)
    lo = p32 - 16 * hi
    lo = lo - 16 * (lo >= 8).astype(jnp.int32)
    x = x_ref[:]                                       # [TM, K]
    acc = jax.lax.dot_general(
        x[:, :khalf], lo.astype(x.dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(
        x[:, khalf:], hi.astype(x.dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[:] = (acc * scale_ref[0][None, :].astype(jnp.float32)
                ).astype(o_ref.dtype)


def _round_up(v, m):
    return -(-v // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def int4_matmul(x: jnp.ndarray, packed: jnp.ndarray, scale: jnp.ndarray,
                interpret: bool = False) -> jnp.ndarray:
    """x [M, K] (bf16/f32) @ packed-int4 [K/2, N] * scale [N] -> [M, K->N].

    Output dtype follows x. M and N are padded to tile multiples
    internally; K must be even and is consumed whole per grid step.
    """
    m, k = x.shape
    khalf, n = packed.shape
    assert k == 2 * khalf, (x.shape, packed.shape)

    tm = 8 if m <= 8 else (128 if m >= 128 else _round_up(m, 8))
    tn = 128 if n % 128 == 0 else 128
    mp = _round_up(m, tm)
    np_ = _round_up(n, tn)
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    if np_ != n:
        packed = jnp.pad(packed, ((0, 0), (0, np_ - n)))
        scale = jnp.pad(scale, (0, np_ - n))
    scale2 = scale.reshape(1, np_)  # 1-D operands trip XLA/Mosaic layouts

    out = pl.pallas_call(
        functools.partial(_kernel, khalf=khalf),
        grid=(mp // tm, np_ // tn),
        in_specs=[
            pl.BlockSpec((tm, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((khalf, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * k * np_,
            bytes_accessed=mp * k * x.dtype.itemsize + khalf * np_
            + mp * np_ * x.dtype.itemsize,
            transcendentals=0),
    )(x, packed, scale2)
    return out[:m, :n]


def int4_matmul_reference(x, packed, scale):
    """jnp oracle: dequantize fully, then one dot."""
    from vlm_fo1_tpu.quant import unpack_int4

    w = unpack_int4(packed).astype(jnp.float32) * scale[None, :]
    return (x.astype(jnp.float32) @ w).astype(x.dtype)
