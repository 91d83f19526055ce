"""Per-stage TPU profiler for the FO1 pipeline.

Loads the int8 param cache written by bench.py (no 12-min host init), then
times each jitted program with a forced device->host fetch (the tunneled
backend's block_until_ready does not reliably synchronize):

  ViT | DaViT | HFRE+projectors (full encode) | prefill | decode/token

Usage: python tools/profile_stages.py [max_pixels]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fetch(tree):
    """Synchronize by pulling ONE element to host (fetching a whole leaf
    would time the tunnel transfer, not the computation)."""
    import jax

    leaf = jax.tree.leaves(tree)[0]
    return np.asarray(leaf.ravel()[:1])[0]


def timeit(name, fn, *a, iters=10):
    import jax

    fetch(fn(*a))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fetch(fn(*a))
        ts.append(time.perf_counter() - t0)
    print(f"{name:42s} {min(ts)*1e3:8.1f} ms  (med {np.median(ts)*1e3:.1f})")
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from PIL import Image

    from vlm_fo1_tpu import preprocess as pp
    from vlm_fo1_tpu.config import FO1Config
    from vlm_fo1_tpu.models import davit, llm, vit
    from vlm_fo1_tpu.models.fo1 import FO1Model, _encode_image_and_regions
    from vlm_fo1_tpu.preprocess.windowing import build_vit_plan, pad_pixel_values
    from vlm_fo1_tpu.runtime.generate import (
        GenerationConfig,
        decode_loop,
        pad_to_bucket,
        prefill,
    )
    from vlm_fo1_tpu.training.checkpointing import load_params_safetensors

    cache = "/root/repo/.bench_params_3b_int8-all.safetensors"
    if not os.path.exists(cache):
        sys.exit(f"run bench.py first to create {cache}")
    cfg = FO1Config()
    params = jax.device_put(load_params_safetensors(cache), jax.devices()[0])
    jax.block_until_ready(params)
    model = FO1Model(cfg, params)

    max_pixels = int(sys.argv[1]) if len(sys.argv) > 1 else 1024 * 1024
    img = Image.open("/root/reference/demo/demo_image.jpg").convert("RGB")
    pv, grid = pp.qwen_image_preprocess(
        img, patch_size=cfg.vision.patch_size,
        merge_size=cfg.vision.spatial_merge_size,
        min_pixels=cfg.min_pixels, max_pixels=max_pixels)
    aux = pp.aux_image_preprocess(img, cfg.aux_image_size)
    plan = build_vit_plan(grid, cfg.vision)
    dt = jnp.bfloat16
    patches = jnp.asarray(pad_pixel_values(pv, plan)[None], dt)
    aux_img = jnp.asarray(aux.transpose(1, 2, 0)[None], dt)
    print(f"grid={grid} padded_units={plan.num_windows} "
          f"patches={patches.shape}")

    rng = np.random.default_rng(0)
    nb = 8
    boxes = np.stack([rng.uniform(0, 300, nb), rng.uniform(0, 300, nb),
                      rng.uniform(400, 768, nb),
                      rng.uniform(400, 768, nb)], 1).astype(np.float32)
    sx = grid[2] * 14 / 768
    sy = grid[1] * 14 / 768
    vtb = boxes * np.array([sx, sy, sx, sy], np.float32)

    vitf = jax.jit(lambda p, x: vit.vit_forward(
        p, cfg.vision, x, jnp.asarray(plan.rot_cos),
        jnp.asarray(plan.rot_sin), jnp.asarray(plan.valid),
        num_windows=plan.num_windows,
        inv_unit_idx=jnp.asarray(plan.inv_unit_idx)))
    davf = jax.jit(lambda p, x: davit.davit_forward(p, cfg.davit, x))
    encf = jax.jit(lambda p, pa, ai, ab, vb: _encode_image_and_regions(
        p, cfg, pa, jnp.asarray(plan.rot_cos), jnp.asarray(plan.rot_sin),
        jnp.asarray(plan.valid), jnp.asarray(plan.inv_unit_idx),
        jnp.asarray(plan.inv_token_idx), ai, ab, vb,
        num_windows=plan.num_windows, grid=grid))

    t_vit = timeit("ViT (32 blocks, padded windows)", vitf,
                   params["vision_tower"], patches)
    t_dav = timeit("DaViT 768^2", davf, params["vision_tower_aux"], aux_img)
    t_enc = timeit("encode full (ViT+DaViT+HFRE+proj)", encf, params,
                   patches, aux_img, jnp.asarray(boxes), jnp.asarray(vtb))
    print(f"{'  -> HFRE + projectors (residual)':42s} "
          f"{(t_enc - t_vit - t_dav)*1e3:8.1f} ms")

    # prefill + decode on a synthetic prompt
    s = 459
    pad_len = pad_to_bucket(s, 128)
    embeds = jnp.asarray(
        rng.standard_normal((1, pad_len, cfg.text.hidden_size)) * 0.02, dt)
    pos = np.zeros((3, 1, pad_len), np.int32)
    pos[:, :, :s] = np.arange(s)
    cache_len = pad_len + 32
    pre = lambda p, e, po, sl: prefill(p, cfg.text, e, po, sl,
                                       cache_len=cache_len)
    t_pre = timeit("prefill (padded 512)", pre, params["text"], embeds,
                   jnp.asarray(pos), jnp.asarray([s], np.int32))

    gen_cfg = GenerationConfig(max_new_tokens=32, eos_token_id=-1)
    kv, first = prefill(params["text"], cfg.text, embeds, jnp.asarray(pos),
                        jnp.asarray([s], np.int32), cache_len=cache_len)
    jax.block_until_ready(first)

    def dec():
        kv2, first2 = prefill(params["text"], cfg.text, embeds,
                              jnp.asarray(pos), jnp.asarray([s], np.int32),
                              cache_len=cache_len)
        return decode_loop(params["text"], cfg.text, gen_cfg, kv2, first2,
                           jnp.asarray([s], np.int32),
                           jnp.asarray([0], np.int32), jax.random.PRNGKey(0))

    fetch(dec())
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        fetch(dec())
        ts.append(time.perf_counter() - t0)
    t_dec = min(ts) - t_pre
    print(f"{'decode 32 tokens (loop only)':42s} {t_dec*1e3:8.1f} ms "
          f"({t_dec/32*1e3:.2f} ms/token)")


if __name__ == "__main__":
    main()
