"""Validate the MSDA kernel's per-visit cost model: cost ∝ window size.

Hypothesis (r5): a supergroup-slot visit costs ≈ WIN-row load + (SG, WIN)
one-hot + (SG, WIN)@(WIN, 4D) matmul — all ∝ _WIN — so downsampling slots
(level-j queries sampling level-(j+k): sample span = SG/2^k rows) could run
with per-slot windows of 128/64/32 instead of the global 256 and cut most
visit costs 2-8x.

Measures one single-level pass at a slope-1/2 geometry (span ~66 rows,
fits any window >= 128) under _WIN=256 vs _WIN=128 (with _SG=128 fixed).

Usage: python tools/xp_msda_win.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W = 112, 128          # sample level map
LQ = 57344               # level-0-like query count
M, P, D = 8, 4, 32


def geometry():
    """Queries on a 224x256 grid sampling the (112,128) map: slope 1/2."""
    ys = (np.arange(224) + 0.5) / 224
    xs = (np.arange(256) + 0.5) / 256
    ref = np.stack(np.meshgrid(xs, ys), -1).reshape(-1, 2)  # row-major [x,y]
    thetas = np.arange(M) * (2 * np.pi / M)
    compass = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    compass = compass / np.abs(compass).max(-1, keepdims=True)
    off = np.zeros((1, M, P, 2), np.float32)
    for p in range(P):
        off[0, :, p] = compass * (p + 1)
    loc = ref[:, None, None, None] + off[None] / np.array([W, H], np.float32)
    loc_flat = loc.reshape(1, LQ, -1).astype(np.float32)
    rng = np.random.default_rng(0)
    aw = rng.uniform(0.1, 1.0, size=(LQ, M * P)).astype(np.float32)
    aw = aw / aw.sum(-1, keepdims=True)
    return loc_flat, aw.reshape(1, LQ, -1)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vlm_fo1_tpu.ops import msda_pallas as MP

    loc, aw = geometry()
    locj = jnp.asarray(loc)
    awj = jnp.asarray(aw)
    rng = np.random.default_rng(1)
    value = jnp.asarray(rng.standard_normal((1, H * W, M, D)), jnp.bfloat16)
    shapes = ((H, W),)

    ref_out = None
    for win in (256, 128):
        MP._WIN = win
        MP._msda_pallas.clear_cache()
        K = 8

        @jax.jit
        def f(v, l, a):
            def step(i, carry):
                v2 = v + (carry * jnp.bfloat16(1e-30))
                return MP._msda_pallas(v2, shapes, l, a, n_heads=M)[
                    0, :1, :1].reshape(1, 1, 1, 1).astype(v.dtype)
            return jax.lax.fori_loop(0, K, step,
                                     jnp.zeros((1, 1, 1, 1), value.dtype))

        full = jax.jit(lambda v, l, a: MP._msda_pallas(
            v, shapes, l, a, n_heads=M))
        outv = np.asarray(full(value, locj, awj))
        if ref_out is None:
            ref_out = outv
        else:
            err = np.abs(outv - ref_out).max()
            print(f"  win={win} max abs diff vs win=256: {err:.2e}")
        out = jax.block_until_ready(f(value, locj, awj))
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            out = f(value, locj, awj)
            np.asarray(out.ravel()[:1])
            ts.append(time.perf_counter() - t0)
        print(f"_WIN={win:4d}  {min(ts)/K*1e3:8.2f} ms/pass "
              f"({LQ} queries x {M} heads x {P} slots)")
    MP._WIN = 256


if __name__ == "__main__":
    main()
