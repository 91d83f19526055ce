"""Decode-stage TPU profiler (VERDICT r1 #4: 5.5 -> <=4.2 ms/token).

Loads the int8 param cache written by bench.py, then separates the decode
loop's per-token cost into (a) per-trunk-layer streaming cost and (b) fixed
per-step overhead (embed + lm head + sampling + loop plumbing) by sweeping
the scanned layer stack's length, and measures the KV-cache-length
sensitivity. All timings are (prefill + decode(N)) - (prefill + decode(1))
over N-1 tokens so the donated cache never needs copying and per-program
dispatch latency cancels.

Roofline: int8-all decode streams ~2.77GB trunk + 0.31GB tied head per
token; v5e HBM ~819GB/s -> ~3.76 ms/token bound.

Usage: python tools/profile_decode.py [cache_len] [batch]

batch > 1 (r5) profiles the BATCHED decode loop the serving pipeline runs —
the per-step cost should stay near the weight-streaming bound (weights are
read once per step regardless of batch), so (batched step cost) /
(batch-1 step cost) reads directly as the batched-decode overhead factor.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dataclasses import replace

    from vlm_fo1_tpu.config import FO1Config
    from vlm_fo1_tpu.runtime.generate import (
        GenerationConfig,
        decode_loop,
        prefill,
    )
    from vlm_fo1_tpu.training.checkpointing import load_params_safetensors

    cache_len = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    path = "/root/repo/.bench_params_3b_int8-all.safetensors"
    params = load_params_safetensors(path)
    text = jax.device_put(params["text"], jax.devices()[0])
    del params
    jax.block_until_ready(text)

    cfg = FO1Config().text
    prompt = 459
    rng = np.random.default_rng(0)
    embeds = jnp.asarray(
        rng.standard_normal((batch, 512, cfg.hidden_size)) * 0.02,
        jnp.bfloat16)
    pos = jnp.broadcast_to(jnp.arange(512)[None, None], (3, batch, 512))
    seq_lens = jnp.full((batch,), prompt, jnp.int32)
    deltas = jnp.zeros((batch,), jnp.int32)

    def run(n_layers, n_tokens, clen):
        tcfg = replace(cfg, num_hidden_layers=n_layers)
        p = dict(text)
        if n_layers != cfg.num_hidden_layers:
            p["layers"] = jax.tree.map(lambda x: x[:n_layers],
                                       text["layers"])
        gen = GenerationConfig(max_new_tokens=n_tokens, eos_token_id=-1)

        def go(p, key):
            # params as an ARGUMENT: closing over them captures ~3GB as
            # program constants, which bloats the compile payload enough
            # to break the tunneled remote-compile link
            cache, logits = prefill.__wrapped__(p, tcfg, embeds, pos,
                                                seq_lens, clen)
            toks, steps, _ = decode_loop.__wrapped__(
                p, tcfg, gen, cache, logits, seq_lens, deltas, key,
                prompt_pad=(512 if batch > 1 else None))
            return toks

        f = jax.jit(go)
        key = jax.random.PRNGKey(0)
        np.asarray(f(p, key))  # compile
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            np.asarray(f(p, key))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def pair(name, n_layers, clen, n=33):
        t1 = run(n_layers, 1, clen)
        tn = run(n_layers, n, clen)
        per_tok = (tn - t1) / (n - 1)
        print(f"{name:44s} {per_tok*1e3:7.3f} ms/token   "
              f"(prefill+1tok {t1*1e3:.1f} ms)")
        return per_tok

    full = pair(f"36 layers, cache {cache_len}, batch {batch}", 36,
                cache_len)
    half = pair(f"18 layers, cache {cache_len}, batch {batch}", 18,
                cache_len)
    big = pair(f"36 layers, cache 2048, batch {batch}", 36, 2048)

    per_layer = (full - half) / 18
    fixed = full - 36 * per_layer
    print()
    print(f"{'per trunk layer':44s} {per_layer*1e3:7.3f} ms"
          f"   (36x = {per_layer*36e3:.2f} ms)")
    print(f"{'fixed/step (embed+head+sample+loop)':44s} {fixed*1e3:7.3f} ms")
    print(f"{'cache-length sensitivity (2048 vs '
          + str(cache_len) + ')':44s} {(big-full)*1e3:7.3f} ms/token")
    print(f"{'roofline (3.08GB @ 819GB/s)':44s}   3.76  ms/token"
          f"   -> {3.76e-3/full*100:.0f}% of bound")


if __name__ == "__main__":
    main()
