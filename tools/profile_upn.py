"""Per-stage TPU profiler for the UPN proposal pipeline.

Decomposes the end-to-end UPN latency (bench.py's upn_img_s workload:
reference scripts/run_upn.py — demo image at the 800/1333 transform) into
Swin backbone / encoder / decoder / glue, and isolates the MSDA kernel
from its layer projections by slicing the encoder/decoder layer lists.

Usage: python tools/profile_upn.py [image_path]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fetch(tree):
    import jax

    leaf = jax.tree.leaves(tree)[0]
    return np.asarray(leaf.ravel()[:1])[0]


def timeit(name, fn, *a, iters=6):
    fetch(fn(*a))  # compile
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fetch(fn(*a))
        ts.append(time.perf_counter() - t0)
    print(f"{name:46s} {min(ts)*1e3:8.1f} ms  (med {np.median(ts)*1e3:.1f})")
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from functools import partial

    from PIL import Image

    from vlm_fo1_tpu.upn.model import upn_forward
    from vlm_fo1_tpu.upn.swin import swin_forward
    from vlm_fo1_tpu.upn.wrapper import UPNWrapper

    img_path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/demo/demo_image.jpg"
    img = Image.open(img_path).convert("RGB")

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        w = UPNWrapper.random_init(dtype=jnp.bfloat16)
    w.params = jax.device_put(w.params, jax.devices()[0])
    jax.block_until_ready(w.params)

    from vlm_fo1_tpu.upn.wrapper import IMAGENET_MEAN, IMAGENET_STD

    arr, (nh, nw) = w.transform_image(img)   # raw uint8
    padded = w._pad_to_bucket(arr)
    print(f"input {nh}x{nw} -> bucket {padded.shape[:2]}")
    norm = (padded.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    image = jnp.asarray(norm[None]).astype(jnp.bfloat16)
    valid_hw = jnp.asarray([[nh, nw]], np.int32)

    @partial(jax.jit, static_argnames=("ne", "nd"))
    def fwd(params, image, valid_hw, ne, nd):
        p = dict(params)
        p["encoder"] = params["encoder"][:ne]
        p["decoder"] = dict(params["decoder"])
        p["decoder"]["layers"] = params["decoder"]["layers"][:nd]
        return upn_forward(p, w.cfg, w.swin_cfg, image, valid_hw,
                           "fine_grained_prompt")

    swin = jax.jit(lambda p, x: swin_forward(p, w.swin_cfg, x))

    t_swin = timeit("swin backbone", swin, w.params["backbone"], image)
    t_e0d0 = timeit("forward enc=0 dec=0", fwd, w.params, image, valid_hw,
                    0, 0)
    t_e1d0 = timeit("forward enc=1 dec=0", fwd, w.params, image, valid_hw,
                    1, 0)
    t_e6d0 = timeit("forward enc=6 dec=0", fwd, w.params, image, valid_hw,
                    6, 0)
    t_e6d1 = timeit("forward enc=6 dec=1", fwd, w.params, image, valid_hw,
                    6, 1)
    t_full = timeit("forward enc=6 dec=6 (full)", fwd, w.params, image,
                    valid_hw, 6, 6)

    # host wrapper overhead (transform + pad + pull)
    t0 = time.perf_counter()
    w.inference(img)
    t_api = time.perf_counter() - t0
    for _ in range(3):
        t0 = time.perf_counter()
        w.inference(img)
        t_api = min(t_api, time.perf_counter() - t0)

    print()
    print(f"{'per encoder layer':46s} {(t_e6d0 - t_e0d0) / 6 * 1e3:8.1f} ms")
    print(f"{'  first encoder layer':46s} {(t_e1d0 - t_e0d0) * 1e3:8.1f} ms")
    print(f"{'per decoder layer':46s} {(t_full - t_e6d0) / 6 * 1e3:8.1f} ms")
    print(f"{'glue (proj+pos+two-stage) = e0d0 - swin':46s} "
          f"{(t_e0d0 - t_swin) * 1e3:8.1f} ms")
    print(f"{'host overhead = api - device':46s} "
          f"{(t_api - t_full) * 1e3:8.1f} ms")
    print(f"{'end-to-end api':46s} {t_api * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
