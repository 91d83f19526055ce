"""Isolate the MSDA kernel's per-grid-step block-streaming overhead.

r5 finding: an EMPTY kernel body over the real pass structure still costs
~38 of 57 ms/layer (xp=floor_noexp), invariant to qb, window size, branches
and compute — pointing at the input/output block pipeline itself. This
microbench rebuilds the same grid (8 heads x 299 query blocks x 4 passes
~= 9568 steps/layer) from scratch and adds one input block at a time:

  base      val4-style big VMEM block (constant over j) + out write
  +dvm      (1, qb, 4) i32 VMEM block — thin minor, lane-padded 32x
  +w4       (1, qb, 16) f32 VMEM block — thin minor, lane-padded 8x
  +smem     three (1, 8, 128) SMEM blocks (code-style)
  +densevm  three (1, brows, 128) i32 VMEM blocks (s0r/gb/dw-style, dense)
  +densesm  the same three as SMEM blocks (the production layout)

Usage: python tools/xp_msda_dma.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QB = 256
NQB = 299          # ~76544 queries
HEADS = 8
PASSES = 4
RBAND = 26624      # ~6.5MB of bf16 (RBAND x 128 x 2B)
BROWS = QB * 4 // 128  # 8


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    lq = QB * NQB
    rng = np.random.default_rng(0)
    val4 = jnp.asarray(rng.standard_normal((HEADS, RBAND, 128)),
                       jnp.bfloat16)
    dvm = jnp.zeros((HEADS, lq, 4), jnp.int32)
    w4 = jnp.zeros((HEADS, lq, 16), jnp.float32)
    smem1 = jnp.zeros((HEADS, -(-NQB // 8) * 8, 128), jnp.int32)
    dense = jnp.zeros((HEADS, lq * 4 // 128, 128), jnp.int32)

    def build(with_dvm=False, with_w4=False, with_smem=False,
              with_densevm=False, with_densesm=False):
        n_extra = (with_dvm + with_w4 + with_smem * 3
                   + with_densevm * 3 + with_densesm * 3)

        def kernel(*refs):
            out_ref = refs[-1]
            out_ref[0] = jnp.zeros((QB, 32), jnp.float32)

        specs = [pl.BlockSpec((1, RBAND, 128), lambda i, j: (i, 0, 0),
                              memory_space=pltpu.VMEM)]
        args = [val4]
        if with_dvm:
            specs.append(pl.BlockSpec((1, QB, 4), lambda i, j: (i, j, 0),
                                      memory_space=pltpu.VMEM))
            args.append(dvm)
        if with_w4:
            specs.append(pl.BlockSpec((1, QB, 16), lambda i, j: (i, j, 0),
                                      memory_space=pltpu.VMEM))
            args.append(w4)
        if with_smem:
            for _ in range(3):
                specs.append(pl.BlockSpec((1, 8, 128),
                                          lambda i, j: (i, j // 8, 0),
                                          memory_space=pltpu.SMEM))
                args.append(smem1)
        if with_densevm:
            for _ in range(3):
                specs.append(pl.BlockSpec((1, BROWS, 128),
                                          lambda i, j: (i, j, 0),
                                          memory_space=pltpu.VMEM))
                args.append(dense)
        if with_densesm:
            for _ in range(3):
                specs.append(pl.BlockSpec((1, BROWS, 128),
                                          lambda i, j: (i, j, 0),
                                          memory_space=pltpu.SMEM))
                args.append(dense)

        call = pl.pallas_call(
            kernel,
            grid=(HEADS, NQB),
            in_specs=specs,
            out_specs=pl.BlockSpec((1, QB, 32), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((HEADS, lq, 32), jnp.float32),
        )
        del n_extra

        @jax.jit
        def f(*a):
            def step(i, carry):
                outs = [call(a[0] + carry.astype(jnp.bfloat16), *a[1:])
                        for _ in range(PASSES)]
                tot = outs[0]
                for o in outs[1:]:
                    tot = tot + o
                return tot[0, :1, :1].reshape(1).astype(jnp.float32) * 1e-30
            return jax.lax.fori_loop(0, 2, step, jnp.zeros((1,)))

        return f, args

    cases = [
        ("base (val4+out)", {}),
        ("+dvm thin", dict(with_dvm=True)),
        ("+dvm+w4 thin", dict(with_dvm=True, with_w4=True)),
        ("+smem code", dict(with_dvm=True, with_w4=True, with_smem=True)),
        ("+dense VMEM x3", dict(with_dvm=True, with_w4=True, with_smem=True,
                                with_densevm=True)),
        ("+dense SMEM x3 (prod)", dict(with_dvm=True, with_w4=True,
                                       with_smem=True, with_densesm=True)),
    ]
    for name, kw in cases:
        f, args = build(**kw)
        out = jax.block_until_ready(f(*args))
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            out = f(*args)
            np.asarray(out)
            ts.append(time.perf_counter() - t0)
        # f runs 2 iterations of PASSES passes = one "layer" equivalent x2
        print(f"{name:24s} {min(ts)/2*1e3:8.1f} ms/layer-equivalent")


if __name__ == "__main__":
    main()


def main2():
    """Variant sweep: thin (32-lane) vs dense (128-lane) OUT block, and
    no-val4 — isolates which block's streaming costs the ~4us/grid-step."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    lq = QB * NQB
    rng = np.random.default_rng(0)
    val4 = jnp.asarray(rng.standard_normal((HEADS, RBAND, 128)),
                       jnp.bfloat16)

    def build(out_lanes, with_val4=True, n_calls=4):
        def kernel(*refs):
            out_ref = refs[-1]
            out_ref[0] = jnp.zeros((QB, out_lanes), jnp.float32)

        specs = []
        args = []
        if with_val4:
            specs.append(pl.BlockSpec((1, RBAND, 128),
                                      lambda i, j: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
            args.append(val4)
        call = pl.pallas_call(
            kernel,
            grid=(HEADS, NQB),
            in_specs=specs,
            out_specs=pl.BlockSpec((1, QB, out_lanes),
                                   lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((HEADS, lq, out_lanes),
                                           jnp.float32),
        )

        @jax.jit
        def f(*a):
            def step(i, carry):
                tot = None
                for k in range(n_calls):
                    # distinct operand per call (carry + k) defeats CSE
                    if with_val4:
                        o = call(a[0] + (carry + k).astype(jnp.bfloat16))
                    else:
                        o = call()
                    tot = o if tot is None else tot + o
                return tot[0, :1, :1].reshape(1).astype(jnp.float32) * 1e-30
            return jax.lax.fori_loop(0, 2, step, jnp.zeros((1,)))

        return f, args

    for name, kw in [
        ("out32, val4, 4 passes", dict(out_lanes=32)),
        ("out128, val4, 4 passes", dict(out_lanes=128)),
        ("out32, NO val4, 4 passes", dict(out_lanes=32, with_val4=False)),
        ("out32, val4, 1 pass", dict(out_lanes=32, n_calls=1)),
    ]:
        f, args = build(**kw)
        out = jax.block_until_ready(f(*args))
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            out = f(*args)
            np.asarray(out)
            ts.append(time.perf_counter() - t0)
        print(f"{name:28s} {min(ts)/2*1e3:8.1f} ms/layer-equivalent")


def main3():
    """Scratch/VMEM-pressure sweep: does adding the production kernel's
    (QB, S*4D) f32 scratch next to the 6.5MB band block serialize the
    pipeline?"""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    lq = QB * NQB
    rng = np.random.default_rng(0)
    val4 = jnp.asarray(rng.standard_normal((HEADS, RBAND, 128)),
                       jnp.bfloat16)

    def build(scratch_rows, touch=True):
        def kernel(v_ref, out_ref, *scratch):
            if scratch and touch:
                scratch[0][0, :] = jnp.zeros((scratch[0].shape[1],),
                                             jnp.float32)
            out_ref[0] = jnp.zeros((QB, 32), jnp.float32)

        call = pl.pallas_call(
            kernel,
            grid=(HEADS, NQB),
            in_specs=[pl.BlockSpec((1, RBAND, 128), lambda i, j: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, QB, 32), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((HEADS, lq, 32), jnp.float32),
            scratch_shapes=([pltpu.VMEM((scratch_rows, 2048), jnp.float32)]
                            if scratch_rows else []),
        )

        @jax.jit
        def f(v):
            def step(i, carry):
                tot = None
                for k in range(4):
                    o = call(v + (carry + k).astype(jnp.bfloat16))
                    tot = o if tot is None else tot + o
                return tot[0, :1, :1].reshape(1).astype(jnp.float32) * 1e-30
            return jax.lax.fori_loop(0, 2, step, jnp.zeros((1,)))

        return f

    for name, rows in [("no scratch", 0), ("scratch 1MB (128r)", 128),
                       ("scratch 2MB (256r)", 256),
                       ("scratch 4MB (512r)", 512)]:
        f = build(rows)
        out = jax.block_until_ready(f(val4))
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            out = f(val4)
            np.asarray(out)
            ts.append(time.perf_counter() - t0)
        print(f"{name:22s} {min(ts)/2*1e3:8.1f} ms/layer-equivalent")
