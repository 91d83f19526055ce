"""Device-trace the real MSDA kernel pass structure and aggregate op times.

The r5 differential campaign (bench_msda_kernel xp knobs) attributed
~38 ms/layer to an "empty-kernel skeleton", but the rebuilt-skeleton
microbench (xp_msda_dma) under-amortized the ~26ms tunnel round trip
(K=2), so its cases all read the measurement floor. This tool gets the
ground truth: a jax.profiler trace of K amortized real-geometry calls,
aggregated per-HLO-op with xprof's xplane parser — showing directly how
much is Pallas kernel vs XLA glue (fusions, copies, transposes).

Usage: python tools/xp_msda_trace.py [xp]   (xp: none|floor_noexp|nokernel)
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_msda_kernel import SHAPES, M, P, D, geometry  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vlm_fo1_tpu.ops.msda_pallas import _msda_pallas

    xp = sys.argv[1] if len(sys.argv) > 1 else None
    if xp in ("none", "None", ""):
        xp = None
    jitter = float(os.environ.get("MSDA_JITTER", "0"))

    s = sum(h * w for h, w in SHAPES)
    rng = np.random.default_rng(1)
    value = jnp.asarray(rng.standard_normal((1, s, M, D)), jnp.bfloat16)
    loc_flat, aw_flat, lq = geometry(jitter)
    locj = jnp.asarray(loc_flat)
    awj = jnp.asarray(aw_flat)

    K = 8

    @jax.jit
    def f(v, l, a):
        def step(i, carry):
            v2 = v + (carry * jnp.bfloat16(1e-30))
            return _msda_pallas(v2, SHAPES, l, a, n_heads=M,
                                xp=xp)[0, :1, :1].reshape(
                                    1, 1, 1, 1).astype(v.dtype)
        return jax.lax.fori_loop(
            0, K, step, jnp.zeros((1, 1, 1, 1), value.dtype))

    out = jax.block_until_ready(f(value, locj, awj))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(value, locj, awj))
        ts.append(time.perf_counter() - t0)
    print(f"wall: {min(ts)/K*1e3:.1f} ms/layer (xp={xp}, jitter={jitter}) "
          f"ts={[round(t, 3) for t in ts]}")

    trace_dir = "/tmp/msda-trace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    out = jax.block_until_ready(f(value, locj, awj))
    jax.profiler.stop_trace()

    # ---- aggregate device ops from the xplane proto
    pbs = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    print("xplane:", pbs)
    from xprof.convert import raw_to_tool_data as r2t

    data, _ = r2t.xspace_to_tool_data(pbs, "trace_viewer", {})
    if isinstance(data, bytes):
        data = data.decode()
    tr = json.loads(data)
    evs = tr["traceEvents"] if isinstance(tr, dict) else tr
    # device-side complete events: aggregate by name
    agg: dict[str, list[float]] = {}
    for e in evs:
        if e.get("ph") != "X":
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        agg.setdefault(name, []).append(dur)
    rows = sorted(((sum(v), len(v), k) for k, v in agg.items()),
                  reverse=True)
    print(f"{'total_ms':>9} {'n':>5}  name")
    for tot, n, k in rows[:40]:
        print(f"{tot:9.2f} {n:5d}  {k[:110]}")


if __name__ == "__main__":
    main()
