"""Pre-warm the persistent compile cache for serving.

Any geometry/batch knob change re-pays ~2 min of first-request latency
(the fused _serve_batch program recompiles per (grid, batch, pad_len)
combination — BENCH_r01-r03 `compile_s` volatility). This tool compiles a
deployment's whole ladder up front into `.jax_cache/`, so a fresh process
serves its first real request from cache.

Usage:
    python tools/prewarm.py                    # default ladder
    BENCH_QUANT=int8-all python tools/prewarm.py --batches 8,16 \
        --sizes 640x480,500x375,612x612 --geometry-factor 112

Uses the same cached int8 params as bench.py (builds them on first use).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,16",
                    help="comma-separated serving batch sizes")
    ap.add_argument("--sizes", default="640x480,500x375,612x612",
                    help="comma-separated WxH source image sizes")
    ap.add_argument("--max-pixels", type=int, default=1024 * 1024)
    ap.add_argument("--decode-tokens", type=int, default=32)
    ap.add_argument("--geometry-factor", type=int, default=112)
    ap.add_argument("--preset", default=os.environ.get("BENCH_PRESET", "3b"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     "/root/repo/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # reuse bench.py's param-cache bootstrap (host-quantized int8 tree)
    os.environ.setdefault("BENCH_PRESET", args.preset)
    from PIL import Image

    from vlm_fo1_tpu.runtime.serving import ServingOptions, ServingPipeline
    from vlm_fo1_tpu.task_templates import OD_template

    import bench

    bench._enable_compile_cache()
    # build/load the model exactly like bench (cached int8 params)
    saved_env = dict(os.environ)
    os.environ["BENCH_SERVING"] = "0"
    os.environ["BENCH_UPN"] = "0"
    os.environ["BENCH_MIXED"] = "0"
    try:
        model = _load_bench_model()
    finally:
        os.environ.clear()
        os.environ.update(saved_env)

    rng = np.random.default_rng(0)
    sizes = [tuple(int(v) for v in sz.split("x"))
             for sz in args.sizes.split(",")]
    batches = [int(b) for b in args.batches.split(",")]
    boxes = [[10.0, 10.0, 60.0, 60.0], [30.0, 20.0, 90.0, 80.0]]

    for w, h in sizes:
        img = Image.fromarray(
            rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8))
        msgs = [{
            "role": "user",
            "content": [
                {"type": "image_url", "image_url": {"url": img}},
                {"type": "text", "text": OD_template.format("orange")},
            ],
            "bbox_list": boxes,
        }]
        for b in batches:
            pipe = ServingPipeline(model, ServingOptions(
                batch_size=b, max_new_tokens=args.decode_tokens,
                max_pixels=args.max_pixels, eos_token_id=-1,
                geometry_factor=args.geometry_factor or None))
            t0 = time.time()
            pipe.run([msgs] * b)
            print(f"warmed size={w}x{h} batch={b} "
                  f"({time.time() - t0:.1f}s)", flush=True)
    print("prewarm done — cache at",
          jax.config.jax_compilation_cache_dir)


def _load_bench_model():
    """The bench.py model bootstrap (param cache -> FO1Model) without the
    benchmark body: import-time reuse keeps one source of truth for the
    quantized-params cache format."""
    import jax
    import jax.numpy as jnp

    from vlm_fo1_tpu.config import FO1Config
    from vlm_fo1_tpu.models.fo1 import FO1Model
    from vlm_fo1_tpu.runtime.fallback_tokenizer import FallbackTokenizer

    preset = os.environ.get("BENCH_PRESET", "3b")
    quant = os.environ.get("BENCH_QUANT", "int8-all")
    cfg = FO1Config.tiny() if preset == "tiny" else FO1Config()
    cache = os.environ.get(
        "BENCH_PARAM_CACHE",
        f"/root/repo/.bench_params_{preset}_{quant}.safetensors")
    if cache and os.path.exists(cache):
        from vlm_fo1_tpu.training.checkpointing import load_params_safetensors

        model = FO1Model(cfg, load_params_safetensors(cache),
                         tokenizer=FallbackTokenizer())
    else:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            model = FO1Model.random_init(cfg, seed=0, dtype=jnp.bfloat16,
                                         tokenizer=FallbackTokenizer())
            if quant in ("int8", "int8-all") and preset != "tiny":
                from vlm_fo1_tpu.quant import (
                    ALL_QUANT_PATTERNS,
                    quantize_params,
                )

                model.params = quantize_params(model.params,
                                               ALL_QUANT_PATTERNS)
    model.params = jax.device_put(model.params, jax.devices()[0])
    jax.block_until_ready(model.params)
    return model


if __name__ == "__main__":
    main()
