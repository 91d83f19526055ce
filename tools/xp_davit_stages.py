"""DaViT stage-prefix profile: per-stage cost with the tunnel latency
cancelled out.

tools/xp_davit_micro.py's per-op scan numbers carry a ~26ms/N dispatch
floor (N=32 -> ~0.8ms on every op), which swamps the real sub-op costs.
Here each measurement jits a PREFIX of the real davit_forward (stem 0,
stage 0, stem 1, stage 1, ...) reduced to one scalar; every prefix pays
the same one-dispatch latency, so consecutive DELTAS are the true
on-device stage costs.

Usage: python tools/xp_davit_stages.py [n_s2_blocks_sweep]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(f, *args, iters=7):
    # np.asarray, not block_until_ready: the axon platform's
    # block_until_ready does not reliably synchronize (CLAUDE.md); only a
    # host fetch of the result round-trips for real.
    np.asarray(f(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vlm_fo1_tpu.config import FO1Config
    from vlm_fo1_tpu.models import davit as D
    from vlm_fo1_tpu.training.checkpointing import load_params_safetensors

    cfg = FO1Config().davit
    params = load_params_safetensors(
        "/root/repo/.bench_params_3b_int8-all.safetensors")["vision_tower_aux"]
    params = jax.device_put(params, jax.devices()[0])
    jax.block_until_ready(params)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((1, 768, 768, 3)), jnp.bfloat16)

    # prefix runner: (stage_idx, n_blocks) pairs to execute
    def prefix(p, x, plan):
        for i, nblk in plan:
            stage = p["stages"][i]
            x = D._conv_embed(stage["conv"], x, cfg, i)
            for blk in stage["blocks"][:nblk]:
                sp = blk["spatial"]
                x = D._depthwise_residual(sp["conv1"], x)
                x = D._window_attention(sp["attn"], x, cfg.num_heads[i],
                                        cfg.window_size)
                x = D._depthwise_residual(sp["conv2"], x)
                x = D._ffn_residual(sp["ffn"], x)
                ch = blk["channel"]
                x = D._depthwise_residual(ch["conv1"], x)
                x = D._channel_attention(ch["attn"], x, cfg.num_groups[i])
                x = D._depthwise_residual(ch["conv2"], x)
                x = D._ffn_residual(ch["ffn"], x)
        return jnp.sum(x.astype(jnp.float32))

    plans = []
    for i in range(4):
        plans.append((f"..stem{i}", [(j, cfg.depths[j]) for j in range(i)]
                      + [(i, 0)]))
        plans.append((f"..stage{i}", [(j, cfg.depths[j]) for j in range(i + 1)]))
    # stage-2 block sweep for the per-block-pair marginal cost
    for k in (3, 6):
        plans.append((f"..s2[{k}blk]", [(0, 1), (1, 1), (2, k)]))

    results = {}
    prev = 0.0
    base = ("..stage3", None)
    for name, plan in plans:
        f = jax.jit(lambda p, x, plan=tuple(plan): prefix(p, x, plan))
        t = timed(f, params, img)
        results[name] = t
        print(f"{name:12s} cum {t*1e3:8.2f} ms", flush=True)

    print("\n-- deltas (true stage costs, dispatch latency cancelled) --")
    order = [p[0] for p in plans[:8]]
    prev = 0.0
    for name in order:
        d = results[name] - prev
        print(f"{name:12s} +{d*1e3:8.2f} ms")
        prev = results[name]
    s2_3, s2_6 = results["..s2[3blk]"], results["..s2[6blk]"]
    print(f"\nstage-2 marginal per block pair: {(s2_6-s2_3)/3*1e3:.2f} ms")


if __name__ == "__main__":
    main()
