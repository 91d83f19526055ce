"""Measure the Pallas/Mosaic floor for small chained matmuls (scratch).

The MSDA kernel's fast64 path is ~760ns per (64,128)@(128,128) bf16->f32
matmul visit (xp_msda_micro), ~9x the naive MXU estimate. Which part is
structural? Every variant processes the same workload per grid step —
QB=1024 queries x 4 slots, acc'd over slots, written to out — varying the
row-tile size and the dependency/data pattern:

  rows64     MSDA shape: per 64-query group, 4 dep-chained
             acc += dot((64,128),(128,128)) with per-slot rhs
  rows128    same, 128-query tiles
  rows256    same, 256-query tiles
  rows512    same, 512-query tiles
  w64        rows64 + per-slot (64,128) f32 weight mul (the real pattern)
  same64     rows64 but ONE shared rhs for all slots (stationary weights)
  k512x64    per 64-query group ONE dot((64,512),(512,128)) (slots in K)

Usage: python tools/xp_matmul_floor.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QB = 1024
NSTEP = 600
SLOTS = 4


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    lhs_all = jnp.asarray(rng.standard_normal((QB, 512)), jnp.bfloat16)
    rhs = jnp.asarray(rng.standard_normal((SLOTS * 128, 128)), jnp.bfloat16)
    wgt = jnp.asarray(rng.standard_normal((QB, 512)), jnp.float32)

    def run(name, rows, variant):
        def kernel(lhs_ref, rhs_ref, w_ref, out_ref):
            for c in range(QB // rows):
                q0 = c * rows
                if variant == "k512":
                    lhs = lhs_ref[q0:q0 + rows, :]              # (rows, 512)
                    acc = jnp.dot(lhs, rhs_ref[:],
                                  preferred_element_type=jnp.float32)
                else:
                    lhs = lhs_ref[q0:q0 + rows, 0:128]
                    acc = jnp.zeros((rows, 128), jnp.float32)
                    for s in range(SLOTS):
                        r0 = 0 if variant == "same" else s * 128
                        sel = jnp.dot(lhs, rhs_ref[r0:r0 + 128, :],
                                      preferred_element_type=jnp.float32)
                        if variant == "weight":
                            sel = sel * w_ref[q0:q0 + rows,
                                              s * 128:(s + 1) * 128]
                        acc = acc + sel
                out_ref[q0:q0 + rows, :] = acc

        def call(lhs, rhs, w):
            return pl.pallas_call(
                kernel,
                grid=(NSTEP,),
                in_specs=[
                    pl.BlockSpec((QB, 512), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((SLOTS * 128, 128), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((QB, 512), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((QB, 128), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((QB, 128), jnp.float32),
            )(lhs, rhs, w)

        # amortize the ~26ms tunneled-dispatch round trip: K dependent
        # iterations inside ONE program (carry feeds lhs so XLA can't CSE)
        K = 20

        @jax.jit
        def f(lhs, rhs, w):
            def step(i, carry):
                l2 = lhs + jnp.tile(carry, (1, 4)).astype(jnp.bfloat16) \
                    * jnp.bfloat16(1e-30)
                return call(l2, rhs, w)
            return jax.lax.fori_loop(0, K, step,
                                     jnp.zeros((QB, 128), jnp.float32))

        out = jax.block_until_ready(f(lhs_all, rhs, wgt))
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            out = f(lhs_all, rhs, wgt)
            np.asarray(out.ravel()[:1])
            ts.append(time.perf_counter() - t0)
        t = min(ts) / K
        flops = NSTEP * QB * SLOTS * 128 * 128 * 2
        nvisit = NSTEP * (QB // 64) * SLOTS  # per-64-query-slot visits
        print(f"{name:9s} {t*1e3:8.2f} ms  {t/nvisit*1e9:7.1f} ns/64q-slot"
              f"  {flops/t/1e12:6.1f} TF/s")

    run("rows64", 64, "chain")
    run("rows128", 128, "chain")
    run("rows256", 256, "chain")
    run("rows512", 512, "chain")
    run("w64", 64, "weight")
    run("same64", 64, "same")
    run("k512x64", 64, "k512")


if __name__ == "__main__":
    main()
