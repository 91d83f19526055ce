"""Pallas TPU kernel: one fused int4 SwiGLU MLP (gate+up+down) per call.

Why: decode is HBM-bound and the MLP holds ~88% of a trunk layer's weight
bytes (gate/up [D,I] + down [I,D]; Qwen2.5-3B: 67.6MB of 77MB int8). int4
halves that stream, but the per-linear Pallas formulation
(ops/int4_matmul.py) pays a fixed per-pallas_call cost x 252 linears/token
that eats the savings (see its docstring). Fusing the whole SwiGLU into ONE
kernel per layer makes it 36 calls/token and streams every packed byte
exactly once:

  grid over I-tiles; per step t:
    g = x_lo @ lo(gate_t) + x_hi @ hi(gate_t)   (contraction-packed, quant.
    u = likewise for up                          _quantize_weight_int4)
    h = silu(g * gs) * (u * us)
    y += h @ [lo|hi](down_t) * ds               (OUTPUT-packed: byte[i, n]
                                                 holds w[i,n] and w[i,n+D/2],
                                                 so both nibbles of a tile's
                                                 bytes are consumed in-step)

The two packing conventions differ deliberately: gate/up pack along the
contraction axis (x is fully resident in VMEM, so the two halves feed two
dots with zero data movement), while down packs along the OUTPUT axis —
contraction-packing down would pair intermediate row i with i+I/2, which
lives in a different grid tile, forcing every packed byte to stream twice.

Replaces the role of the reference's bitsandbytes 4-bit CUDA kernels
(model/builder.py:28-36) on the decode path; used by the `int4-mlp` hybrid
quant mode (int4 MLP + int8 attention/head).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _unpack_nibbles_i32(p32):
    """int32 copy of packed bytes -> (lo, hi) int32 in [-8, 7]. Mosaic can't
    legalize vector shifts on i8, so: hi = floor(p/16) (arithmetic-shift
    semantics for negatives), lo sign-corrected from the remainder."""
    hi = jnp.floor_divide(p32, 16)
    lo = p32 - 16 * hi
    lo = lo - 16 * (lo >= 8).astype(jnp.int32)
    return lo, hi


def _kernel(x_ref, g_ref, u_ref, gs_ref, us_ref, d_ref, ds_ref, o_ref, *,
            dhalf: int):
    x = x_ref[:]                                        # [TM, D]
    glo, ghi = _unpack_nibbles_i32(g_ref[:].astype(jnp.int32))  # [D/2, TI]
    ulo, uhi = _unpack_nibbles_i32(u_ref[:].astype(jnp.int32))
    dot = functools.partial(jax.lax.dot_general,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    g = dot(x[:, :dhalf], glo.astype(x.dtype)) \
        + dot(x[:, dhalf:], ghi.astype(x.dtype))        # [TM, TI] f32
    u = dot(x[:, :dhalf], ulo.astype(x.dtype)) \
        + dot(x[:, dhalf:], uhi.astype(x.dtype))
    g = g * gs_ref[0][None, :]
    u = u * us_ref[0][None, :]
    h = (g * jax.nn.sigmoid(g) * u).astype(x.dtype)     # silu(g) * u

    dlo, dhi = _unpack_nibbles_i32(d_ref[:].astype(jnp.int32))  # [TI, D/2]
    y = jnp.concatenate([dot(h, dlo.astype(x.dtype)),
                         dot(h, dhi.astype(x.dtype))], axis=1)  # [TM, D]
    y = y * ds_ref[0][None, :]

    @pl.when(pl.program_id(1) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += y


def _round_up(v, m):
    return -(-v // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def int4_mlp_matmul(x: jnp.ndarray, node: dict,
                    interpret: bool = False) -> jnp.ndarray:
    """x [M, D] @ fused int4 SwiGLU MLP -> [M, D] (dtype follows x).

    node: quant.quantize_mlp_int4 output — gate_pk/up_pk [D/2, I] (byte k
    holds w[k,·] lo, w[k+D/2,·] hi), down_pk [I, D/2] (byte ·,n holds w[·,n]
    lo, w[·,n+D/2] hi), gate_s/up_s [I], down_s [D], all f32.
    """
    m, d = x.shape
    dhalf2, i_dim = node["gate_pk"].shape
    assert d == 2 * dhalf2, (x.shape, node["gate_pk"].shape)

    ti = 256 if i_dim % 256 == 0 else 128
    assert i_dim % ti == 0, (i_dim, ti)
    tm = 8 if m <= 8 else (128 if m >= 128 else _round_up(m, 8))
    mp = _round_up(m, tm)
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    gs2 = node["gate_s"].reshape(1, i_dim)
    us2 = node["up_s"].reshape(1, i_dim)
    ds2 = node["down_s"].reshape(1, d)

    # Grid: (M-tiles, I-tiles) — I iterates fastest so each row block
    # accumulates over every I tile before the next row block starts
    # (the ADVICE r3 fix: a 1-D I grid with x/out pinned to row block 0
    # never touched rows >= tm when M > 128).
    out = pl.pallas_call(
        functools.partial(_kernel, dhalf=dhalf2),
        grid=(mp // tm, i_dim // ti),
        in_specs=[
            pl.BlockSpec((tm, d), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dhalf2, ti), lambda i, t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dhalf2, ti), lambda i, t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti), lambda i, t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti), lambda i, t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, d // 2), lambda i, t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, d), lambda i, t: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, d), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * d * i_dim * 3,
            bytes_accessed=(mp * d * x.dtype.itemsize
                            + 3 * dhalf2 * i_dim + mp * d * 4),
            transcendentals=mp * i_dim),
    )(x, node["gate_pk"], node["up_pk"], gs2, us2, node["down_pk"], ds2)
    return out[:m].astype(x.dtype)


def int4_mlp_reference(x: jnp.ndarray, node: dict) -> jnp.ndarray:
    """Pure-XLA oracle (and the CPU-backend fallback): dequantize the three
    weights fully, then the plain SwiGLU chain in fp32 — same contraction
    order and dtypes as the kernel (h cast to x.dtype before the down dot)."""
    from vlm_fo1_tpu.quant import unpack_int4

    xf = x.astype(jnp.float32)
    gate = unpack_int4(node["gate_pk"]).astype(jnp.float32)   # [D, I]
    up = unpack_int4(node["up_pk"]).astype(jnp.float32)
    g = (xf @ gate) * node["gate_s"][None, :]
    u = (xf @ up) * node["up_s"][None, :]
    h = (g * jax.nn.sigmoid(g) * u).astype(x.dtype).astype(jnp.float32)

    pk = node["down_pk"]                                      # [I, D/2]
    lo = jnp.right_shift(jnp.left_shift(pk, 4), 4)            # sign-extend
    hi = jnp.right_shift(pk, 4)                               # arithmetic
    down = jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)  # [I, D]
    y = (h @ down) * node["down_s"][None, :]
    return y.astype(x.dtype)


def int4_mlp(x: jnp.ndarray, node: dict) -> jnp.ndarray:
    """Dispatch: Pallas on TPU, XLA halves-formulation elsewhere. x may
    carry leading batch/seq dims; the kernel sees [M, D]."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if jax.default_backend() == "cpu":
        y2 = int4_mlp_reference(x2, node)
    else:
        y2 = int4_mlp_matmul(x2, node)
    return y2.reshape(*lead, y2.shape[-1])
