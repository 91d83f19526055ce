"""DaViT per-piece TPU microbench: find where the ~50-60ms goes.

Every sub-op of a block pair is shape-preserving (residual), so each is
timed as a lax.scan of N on-device iterations inside ONE dispatch — the
~26ms tunnel round trip would otherwise swamp sub-millisecond ops.

Usage: python tools/xp_davit_micro.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 32


def fetch(x):
    import jax

    leaf = jax.tree.leaves(x)[0]
    return np.asarray(leaf.ravel()[:1])[0]


def timeit_rep(name, f, p, x, iters=5, n=N):
    """f(p, x) -> same-shape y, executed n times on device per dispatch."""
    import jax

    def loop(p, x):
        def body(c, _):
            return f(p, c), None

        y, _ = jax.lax.scan(body, x, None, length=n)
        return y

    g = jax.jit(loop)
    fetch(g(p, x))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fetch(g(p, x))
        ts.append(time.perf_counter() - t0)
    per = min(ts) / n
    print(f"{name:46s} {per*1e3:8.3f} ms/op")
    return per


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vlm_fo1_tpu.config import FO1Config
    from vlm_fo1_tpu.models.davit import (
        _channel_attention,
        _depthwise_residual,
        _ffn_residual,
        _window_attention,
        davit_forward,
    )
    from vlm_fo1_tpu.training.checkpointing import load_params_safetensors

    cfg = FO1Config().davit
    params = load_params_safetensors(
        "/root/repo/.bench_params_3b_int8-all.safetensors")["vision_tower_aux"]
    params = jax.device_put(params, jax.devices()[0])
    jax.block_until_ready(params)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((1, 768, 768, 3)), jnp.bfloat16)

    f = jax.jit(lambda p, x: davit_forward(p, cfg, x))
    fetch(f(params, img))
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        fetch(f(params, img))
        ts.append(time.perf_counter() - t0)
    total = min(ts)
    print(f"davit full fwd (768^2): {total*1e3:.2f} ms "
          f"(med {np.median(ts)*1e3:.2f})\n")

    sizes = [(192, 192), (96, 96), (48, 48), (24, 24)]
    acc = 0.0
    for i, (h, w) in enumerate(sizes):
        c = cfg.embed_dims[i]
        x = jnp.asarray(rng.standard_normal((1, h, w, c)) * 0.02, jnp.bfloat16)
        blk = params["stages"][i]["blocks"][0]
        d = cfg.depths[i]
        sp, ch = blk["spatial"], blk["channel"]
        t_dw = timeit_rep(f"s{i} dw conv {h}x{w}x{c}",
                          _depthwise_residual, sp["conv1"], x)
        t_wa = timeit_rep(
            f"s{i} window attn",
            lambda p, x: _window_attention(p, x, cfg.num_heads[i],
                                           cfg.window_size), sp["attn"], x)
        t_ca = timeit_rep(
            f"s{i} channel attn",
            lambda p, x: _channel_attention(p, x, cfg.num_groups[i]),
            ch["attn"], x)
        t_ff = timeit_rep(f"s{i} ffn", _ffn_residual, sp["ffn"], x)
        stage_est = d * (4 * t_dw + t_wa + t_ca + 2 * t_ff)
        acc += stage_est
        print(f"  -> stage {i} blocks est (depth {d}): "
              f"{stage_est*1e3:.2f} ms\n")
    print(f"sum of block pieces: {acc*1e3:.2f} ms   "
          f"(full fwd {total*1e3:.2f}; rest = conv stems + fusion wins)")


if __name__ == "__main__":
    main()
