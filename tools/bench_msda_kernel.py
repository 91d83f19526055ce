"""MSDA kernel microbenchmark at the real UPN encoder geometry.

Times ms_deform_attn_core_flat's jitted core (meta + packing + Pallas
passes) on the device for the 896x1024-bucket encoder workload (76384
queries x 8 heads x 5 levels x 4 points = 12.2M samples), under the three
path-selection regimes (default hierarchical / fast8-only / per-sample
slow), and for two offset regimes:

  init    zero offset weights -> pure compass bias (UPNWrapper.random_init
          and freshly-initialized checkpoints; offsets identical per query)
  jitter  + per-query N(0, 2px) noise (emulates trained offset weights)

Also prints the XLA-side path statistics (fraction of supergroup slots on
the fast64 / per-8 / per-sample paths) computed from the same geometry.

Usage: python tools/bench_msda_kernel.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = ((224, 256), (112, 128), (56, 64), (28, 32), (14, 16))
M, P, D = 8, 4, 32


def geometry(jitter_px: float, seed: int = 0):
    """loc_flat [1, Lq, L*M*P*2], aw_flat [1, Lq, L*M*P] replicating the
    encoder's reference-point grids + compass offset init (msda_layer_init,
    reference ms_deform_attn.py:77-97)."""
    rng = np.random.default_rng(seed)
    L = len(SHAPES)
    refs = []
    for h, w in SHAPES:
        ys = (np.arange(h) + 0.5) / h
        xs = (np.arange(w) + 0.5) / w
        g = np.stack(np.meshgrid(xs, ys), -1).reshape(-1, 2)  # (h*w, [x,y])
        refs.append(g)
    ref = np.concatenate(refs, 0).astype(np.float32)          # [Lq, 2]
    lq = ref.shape[0]

    thetas = np.arange(M) * (2 * np.pi / M)
    compass = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    compass = compass / np.abs(compass).max(-1, keepdims=True)  # [M, 2]
    # offsets in level-j pixels: direction * (p+1); lane order (l, m, p, c)
    off = np.zeros((L, M, P, 2), np.float32)
    for p in range(P):
        off[:, :, p] = compass * (p + 1)
    norm = np.array([(w, h) for h, w in SHAPES], np.float32)  # [L, (W,H)]
    loc = ref[:, None, None, None] + off[None] / norm[None, :, None, None]
    if jitter_px:
        loc = loc + (rng.normal(0, jitter_px, size=(lq, L, M, P, 2))
                     / norm[None, :, None, None]).astype(np.float32)
    loc_flat = loc.reshape(1, lq, -1).astype(np.float32)
    aw = rng.uniform(0.1, 1.0, size=(lq, L * M * P)).astype(np.float32)
    aw = aw / aw.sum(-1, keepdims=True)
    # (m, l, p)->(l, m, p) order is already (l, m, p) here
    aw_flat = aw.reshape(1, lq, -1)
    return loc_flat, aw_flat, lq


def path_stats(loc_flat, aw_flat, lq):
    """Host-side replica of _msda_pallas's starts math + _group_meta path
    split, per level (single-level passes, ignoring banding)."""
    L = len(SHAPES)
    MP = M * P
    from vlm_fo1_tpu.ops.msda_pallas import _SG, _WIN

    lq_pad = -(-lq // 256) * 256
    loc = loc_flat[0]  # [Lq, L*MP*2]
    tots = np.zeros(3)  # fast-group / fast8 / slow (sample-weighted)
    for j, (h, w) in enumerate(SHAPES):
        sl = slice(j * MP * 2, (j + 1) * MP * 2)
        t = loc[:, sl].reshape(lq, MP, 2) * np.array([w, h], np.float32) - 0.5
        t0 = np.floor(t).astype(np.int64)
        starts = (np.clip(t0[..., 1] + 1, 0, h) * (w + 2)
                  + np.clip(t0[..., 0] + 1, 0, w))        # [Lq, MP]
        starts = np.pad(starts, ((0, lq_pad - lq), (0, 0)))
        sgg = starts.reshape(-1, _SG, MP)
        base_g = (sgg.min(1) // 8) * 8
        fg = (sgg.max(1) - base_g) < _WIN                 # [nqg, MP]
        sg8 = starts.reshape(-1, 8, MP)
        b8 = (sg8.min(1) // 8) * 8
        f8 = (sg8.max(1) - b8) < 16                       # [nq8, MP]
        ng = fg.sum() * _SG
        n8 = (~fg[:, None, :]
              & f8.reshape(-1, _SG // 8, MP)).sum() * 8
        nslow = sgg.shape[0] * _SG * MP - ng - n8
        tots += np.array([ng, n8, nslow])
    tot = tots.sum()
    return tots / tot


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vlm_fo1_tpu.ops.msda_pallas import _msda_pallas

    s = sum(h * w for h, w in SHAPES)
    rng = np.random.default_rng(1)
    value = jnp.asarray(rng.standard_normal((1, s, M, D)), jnp.bfloat16)

    for regime, jit_px in (("init", 0.0), ("jitter2px", 2.0)):
        loc_flat, aw_flat, lq = geometry(jit_px)
        fr = path_stats(loc_flat, aw_flat, lq)
        print(f"[{regime}] samples: fastgroup {fr[0]*100:.1f}%  "
              f"fast8 {fr[1]*100:.1f}%  slow {fr[2]*100:.1f}%")
        locj = jnp.asarray(loc_flat)
        awj = jnp.asarray(aw_flat)
        cases = [("force=None", {}), ("force=fast8", {"force": "fast8"}),
                 ("force=slow", {"force": "slow"})]
        if regime == "init" and os.environ.get("MSDA_XP", "0") == "1":
            # perf experiments (wrong numerics by design): which part of
            # the fast64 slot visit costs
            cases += [("xp=staticbase", {"xp": "staticbase"}),
                      ("xp=noonehot", {"xp": "noonehot"}),
                      ("xp=noweight", {"xp": "noweight"}),
                      ("xp=nokernel", {"xp": "nokernel"})]
        for name, kw in cases:
            # amortize the ~26ms tunneled dispatch round trip: K dependent
            # iterations inside one program (carry perturbs value so XLA
            # can't CSE the calls)
            K = 8

            @jax.jit
            def f(v, l, a):
                def step(i, carry):
                    v2 = v + (carry * jnp.bfloat16(1e-30))
                    return _msda_pallas(v2, SHAPES, l, a, n_heads=M,
                                        **kw)[0, :1, :1].reshape(
                                            1, 1, 1, 1).astype(v.dtype)
                return jax.lax.fori_loop(
                    0, K, step, jnp.zeros((1, 1, 1, 1), value.dtype))

            out = jax.block_until_ready(f(value, locj, awj))
            ts = []
            for _ in range(6):
                t0 = time.perf_counter()
                out = f(value, locj, awj)
                np.asarray(out.ravel()[:1])
                ts.append(time.perf_counter() - t0)
            print(f"  {name:14s} {min(ts)/K*1e3:8.1f} ms/layer  "
                  f"(med {np.median(ts)/K*1e3:.1f}, amortized K={K})")


if __name__ == "__main__":
    main()
