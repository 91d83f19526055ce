"""Serving batch-size sweep on the real chip: find the throughput knee.

Loads the int8-all 3B param cache ONCE, then for each batch size compiles
the fused serving program and measures (a) single-batch device latency and
(b) steady-state pipelined throughput, printing one JSON line per config.
The device-time accounting (batch_latency * n_batches vs pipelined wall)
quantifies how much of the cycle the pipeline hides.

Usage: python tools/sweep_serving.py  [BATCHES=8,16,24,32] [REQUESTS=96]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    cache_dir = os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vlm_fo1_tpu.config import FO1Config
    from vlm_fo1_tpu.models.fo1 import FO1Model
    from vlm_fo1_tpu.runtime.fallback_tokenizer import FallbackTokenizer
    from vlm_fo1_tpu.runtime.serving import ServingOptions, ServingPipeline
    from vlm_fo1_tpu.task_templates import OD_template
    from vlm_fo1_tpu.training.checkpointing import load_params_safetensors

    batches = [int(x) for x in
               os.environ.get("BATCHES", "8,16,24,32").split(",")]
    in_flights = [int(x) for x in os.environ.get("IN_FLIGHTS", "3").split(",")]
    decode_tokens = int(os.environ.get("BENCH_DECODE_TOKENS", "32"))
    max_pixels = int(os.environ.get("BENCH_MAX_PIXELS", str(1024 * 1024)))

    cfg = FO1Config()
    cache = "/root/repo/.bench_params_3b_int8-all.safetensors"
    model = FO1Model(cfg, load_params_safetensors(cache),
                     tokenizer=FallbackTokenizer())
    model.params = jax.device_put(model.params, jax.devices()[0])
    jax.block_until_ready(model.params)

    img_path = "/root/reference/demo/demo_image.jpg"
    bbox_list = [[161.0, 11.0, 292.0, 127.0], [268.0, 61.0, 428.0, 226.0],
                 [12.0, 100.0, 140.0, 227.0], [205.0, 188.0, 332.0, 320.0],
                 [326.0, 202.0, 478.0, 357.0], [136.0, 106.0, 269.0, 233.0],
                 [25.0, 206.0, 200.0, 383.0]]
    messages = [{
        "role": "user",
        "content": [
            {"type": "image_url", "image_url": {"url": img_path}},
            {"type": "text", "text": OD_template.format("orange")},
        ],
        "bbox_list": bbox_list,
    }]

    for sbatch in batches:
        for mif in in_flights:
            pipe = ServingPipeline(model, ServingOptions(
                batch_size=sbatch, max_new_tokens=decode_tokens,
                max_pixels=max_pixels, eos_token_id=-1,
                prepare_workers=8, max_in_flight=mif))
            row = {"batch": sbatch, "in_flight": mif}
            try:
                t0 = time.time()
                pipe.run([messages] * sbatch)  # compile
                row["compile_s"] = round(time.time() - t0, 1)
                blat = []
                for _ in range(3):
                    t0 = time.time()
                    pipe.run([messages] * sbatch)
                    blat.append(time.time() - t0)
                row["batch_p50_s"] = round(float(np.percentile(blat, 50)), 4)
                n_req = max(sbatch * 8,
                            int(os.environ.get("REQUESTS", "96")))
                n_req = -(-n_req // sbatch) * sbatch
                sweeps = []
                for _ in range(3):
                    t0 = time.time()
                    pipe.run([messages] * n_req)
                    sweeps.append(round(n_req / (time.time() - t0), 4))
                row["img_s"] = max(sweeps)
                row["img_s_sweeps"] = sweeps
                row["requests"] = n_req
                # pipeline efficiency: fraction of the per-batch latency
                # the pipeline hides at steady state
                row["batch_img_s"] = round(sbatch / row["batch_p50_s"], 4)
                row["pipeline_eff"] = round(
                    row["img_s"] / row["batch_img_s"], 3)
            except Exception as e:
                row["error"] = str(e)[:200]
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
