"""Isolate the MSDA kernel's per-grid-step overhead (scratch experiment).

The real kernel measured ~15us per grid step with compute accounting for
~1us — pipeline/DMA-bound. Variants here measure the levers:

  base        current production shape: qb=256, dvm (1,qb,S) i32 thin
              (tile-padded 32x in DMA), w4 (1,qb,4S) f32 thin (8x),
              out (1,qb,128) f32, 3 SMEM fallback arrays
  qb512       same but qb=512 (half the steps)
  qb512-t     qb=512 + dvm/w4 transposed to slot-major rows (tiny DMA)
              + one-hot built transposed (sublane broadcast + lhs-T dot)
  qb1024-t    qb=1024 variant of the same

Usage: python tools/xp_msda_micro.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

S, D4, HEADS = 4, 128, 8
LQP = 76800
RBAND = 16384


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    val4 = jnp.asarray(rng.standard_normal((HEADS, RBAND, D4)),
                       jnp.bfloat16)
    ex = jnp.asarray(np.eye(4 * S, S * D4)[:, :S * D4], jnp.bfloat16)

    def run(name, qb, transposed):
        nqb = LQP // qb
        ncode = (nqb + 7) // 8 * 8
        code = jnp.asarray(
            rng.integers(0, RBAND - 128, size=(HEADS, ncode, 128)),
            jnp.int32)
        if transposed:
            dvm = jnp.asarray(rng.integers(0, 128, size=(HEADS, 8, LQP)),
                              jnp.int32)
            w4 = jnp.asarray(rng.standard_normal((HEADS, 4 * S, LQP)),
                             jnp.float32)
        else:
            dvm = jnp.asarray(rng.integers(0, 128, size=(HEADS, LQP, S)),
                              jnp.int32)
            w4 = jnp.asarray(rng.standard_normal((HEADS, LQP, 4 * S)),
                             jnp.float32)
        brows = qb * S // 128
        smem_extra = jnp.zeros((HEADS, LQP * S // 128, 128), jnp.int32)

        def kernel(code_ref, dvm_ref, g1, g2, g3, w4_ref, ex_ref,
                   val4_ref, out_ref, w128_ref):
            exv = ex_ref[:]
            if transposed:
                w4v = w4_ref[0]                       # (4S, qb)
                hi = w4v.astype(jnp.bfloat16)
                w128_ref[:] = jax.lax.dot_general(
                    hi, exv, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                w4v = w4_ref[0]                       # (qb, 4S)
                hi = w4v.astype(jnp.bfloat16)
                w128_ref[:] = jnp.dot(
                    hi, exv, preferred_element_type=jnp.float32)
            vdt = val4_ref.dtype
            io_l = jax.lax.broadcasted_iota(jnp.int32, (64, 128), 1)
            io_s = jax.lax.broadcasted_iota(jnp.int32, (128, 64), 0)
            jrow = jax.lax.rem(pl.program_id(1), 8)

            for g64 in range(qb // 64):   # static unroll: q0 constant
                q0 = g64 * 64
                if not transposed:
                    dmat = dvm_ref[0, pl.ds(q0, 64), :]
                acc = jnp.zeros((64, D4), jnp.float32)
                for s in range(S):
                    c = code_ref[0, jrow, g64 * S + s]
                    base = pl.multiple_of(jnp.maximum(c, 0), 8)
                    blk = val4_ref[0, pl.ds(base, 128), :]
                    if transposed:
                        dl = dvm_ref[0, s, q0:q0 + 64]        # (64,) lanes
                        ohT = (io_s == dl[None, :]).astype(vdt)  # (128,64)
                        sel = jax.lax.dot_general(
                            ohT, blk, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                    else:
                        delta = jax.lax.slice(dmat, (0, s), (64, s + 1))
                        oh = (io_l == delta).astype(vdt)
                        sel = jnp.dot(oh, blk,
                                      preferred_element_type=jnp.float32)
                    acc = acc + sel * w128_ref[q0:q0 + 64,
                                               s * D4:(s + 1) * D4]
                out_ref[0, pl.ds(q0, 64), :] = acc

        smem = pl.BlockSpec((1, 8, 128), lambda i, j: (i, j // 8, 0),
                            memory_space=pltpu.SMEM)
        if transposed:
            dspec = pl.BlockSpec((1, 8, qb), lambda i, j: (i, 0, j),
                                 memory_space=pltpu.VMEM)
            wspec = pl.BlockSpec((1, 4 * S, qb), lambda i, j: (i, 0, j),
                                 memory_space=pltpu.VMEM)
            wscr = pltpu.VMEM((qb, S * D4), jnp.float32)
        else:
            dspec = pl.BlockSpec((1, qb, S), lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM)
            wspec = pl.BlockSpec((1, qb, 4 * S), lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM)
            wscr = pltpu.VMEM((qb, S * D4), jnp.float32)
        extras = [pl.BlockSpec((1, brows, 128), lambda i, j: (i, j, 0),
                               memory_space=pltpu.SMEM)] * 3

        @jax.jit
        def f(code, dvm, e1, e2, e3, w4, ex, val4):
            return pl.pallas_call(
                kernel,
                grid=(HEADS, nqb),
                in_specs=[smem, dspec] + extras + [
                    wspec,
                    pl.BlockSpec((4 * S, S * D4), lambda i, j: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, RBAND, D4), lambda i, j: (i, 0, 0),
                                 memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, qb, D4), lambda i, j: (i, j, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((HEADS, LQP, D4),
                                               jnp.float32),
                scratch_shapes=[wscr],
            )(code, dvm, e1, e2, e3, w4, ex, val4)

        args = (code, dvm, smem_extra, smem_extra, smem_extra, w4, ex, val4)
        out = jax.block_until_ready(f(*args))
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            out = f(*args)
            np.asarray(out.ravel()[:1])
            ts.append(time.perf_counter() - t0)
        steps = HEADS * nqb
        print(f"{name:10s} {min(ts)*1e3:8.2f} ms   "
              f"{min(ts)/steps*1e6:7.2f} us/step   "
              f"({min(ts)/(LQP*HEADS*S)*1e9:.2f} ns/sample)")

    run("base", 256, False)
    run("qb512", 512, False)
    run("qb512-t", 512, True)
    run("qb1024-t", 1024, True)


if __name__ == "__main__":
    main()
