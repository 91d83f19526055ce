"""Microbench: nibble-unpack strategies for the fused int4 MLP kernel.

The fused kernel (ops/int4_mlp.py) measured 78 GB/s effective on v5e —
10x off the 819 GB/s stream bound — suspecting the VPU unpack
(int8->int32 convert + floor_divide) rather than the HBM stream.
This isolates per-strategy cost on the real MLP block geometry.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D, I, TI, M = 2048, 11008, 256, 8


def unpack_divide(p32):
    hi = jnp.floor_divide(p32, 16)
    lo = p32 - 16 * hi
    lo = lo - 16 * (lo >= 8).astype(jnp.int32)
    return lo, hi


def unpack_shift(p32):
    hi = jnp.right_shift(p32, 4)                      # arithmetic
    lo = jnp.right_shift(jnp.left_shift(p32, 28), 28)  # sign-extend low 4
    return lo, hi


def unpack_float(p8, dtype):
    pf = p8.astype(dtype)                             # int8 exact in bf16
    hif = jnp.floor(pf * (1.0 / 16.0))
    lof = pf - 16.0 * hif
    return lof, hif


def kernel(x_ref, g_ref, u_ref, o_ref, *, mode):
    x = x_ref[:]
    dhalf = D // 2
    if mode == "float":
        glo, ghi = unpack_float(g_ref[:], x.dtype)
        ulo, uhi = unpack_float(u_ref[:], x.dtype)
    else:
        f = unpack_divide if mode == "divide" else unpack_shift
        glo, ghi = f(g_ref[:].astype(jnp.int32))
        ulo, uhi = f(u_ref[:].astype(jnp.int32))
        glo, ghi = glo.astype(x.dtype), ghi.astype(x.dtype)
        ulo, uhi = ulo.astype(x.dtype), uhi.astype(x.dtype)
    dot = functools.partial(jax.lax.dot_general,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    g = dot(x[:, :dhalf], glo) + dot(x[:, dhalf:], ghi)
    u = dot(x[:, :dhalf], ulo) + dot(x[:, dhalf:], uhi)

    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += jnp.pad(g * u, ((0, 0), (0, D - TI)))


def nounpack_kernel(x_ref, g_ref, u_ref, o_ref):
    """Stream the same bytes but skip the unpack: measures the pure
    load+dot floor (dots use the raw int8 block converted once)."""
    x = x_ref[:]
    g8 = g_ref[:].astype(x.dtype)
    u8 = u_ref[:].astype(x.dtype)
    dot = functools.partial(jax.lax.dot_general,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    g = dot(x[:, :D // 2], g8)
    u = dot(x[:, :D // 2], u8)

    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += jnp.pad(g * u, ((0, 0), (0, D - TI)))


def build(mode):
    body = (functools.partial(kernel, mode=mode) if mode != "none"
            else nounpack_kernel)
    return pl.pallas_call(
        body,
        grid=(I // TI,),
        in_specs=[
            pl.BlockSpec((M, D), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D // 2, TI), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D // 2, TI), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, D), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, D), jnp.float32),
    )


def main():
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.integers(-128, 127, (D // 2, I), dtype=np.int8))
    u = jnp.asarray(rng.integers(-128, 127, (D // 2, I), dtype=np.int8))
    x = jnp.asarray(rng.standard_normal((M, D)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    nbytes = 2 * (D // 2) * I
    for mode in ["none", "divide", "shift", "float"]:
        f = build(mode)

        @jax.jit
        def loop(x, f=f):
            def body(h, _):
                return f(h, g, u).astype(h.dtype), None
            h, _ = jax.lax.scan(body, x, None, length=100)
            return h

        loop(x).block_until_ready()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            loop(x).block_until_ready()
            ts.append(time.perf_counter() - t0)
        ms = sorted(ts)[2] * 1e3 / 100
        print(f"{mode:8s} {ms:.4f} ms  eff-bw {nbytes / ms / 1e6:.0f} GB/s")


if __name__ == "__main__":
    main()
