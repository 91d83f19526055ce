"""Pipelined batch serving: overlap host preprocessing with device compute.

The reference's eval loops are strictly sequential batch-1 (SURVEY.md §3.4):
every image pays host preprocessing, device compute and result parsing back
to back. Here serving is a three-stage pipeline:

  stage H (host, thread pool): prepare() — PIL decode, resizes, patchify,
          tokenization, window plans, M-RoPE indices. Pure numpy, no JAX.
  stage D (device, async dispatch): launch_batch() — batched encode +
          splice + prefill + decode loop. JAX dispatch returns immediately;
          the arrays are futures on the device stream.
  stage F (host): finish_batch() — block on the tokens, trim at EOS, decode
          text.

Because JAX dispatch is asynchronous, a single Python thread can keep the
device queue fed: while the TPU executes batch i, the pool prepares batch
i+1 and the main thread dispatches it. `max_in_flight` bounds the number of
launched-but-unfinished batches so device memory for KV caches stays capped.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Iterable


@dataclass
class ServingOptions:
    batch_size: int = 8
    max_new_tokens: int = 512
    temperature: float = 0.0
    top_p: float = 1.0
    seed: int = 0
    max_pixels: int | None = None
    eos_token_id: int | None = None
    prepare_workers: int = 4
    max_in_flight: int = 2  # launched-but-unfinished batches
    # ship ONE smart-resized raw uint8 image per request and run patchify /
    # window-pad / aux squash on device (FO1Model.prepare device_preproc):
    # ~5x fewer host->device bytes on the slow tunneled link. ViT numerics
    # exact; the DaViT aux input is one resampling generation removed from
    # the reference chain (device bicubic of the smart-resized image).
    device_preproc: bool = True


@dataclass
class _Launched:
    handle: dict
    indices: list[int]


class ServingPipeline:
    """Throughput-oriented driver around FO1Model.

    run(messages_list) returns results in input order, numerically identical
    to FO1Model.generate_batch over the same batching (the device programs
    are the same jitted functions; only the host scheduling differs).
    """

    def __init__(self, model, options: ServingOptions | None = None):
        self.model = model
        self.opts = options or ServingOptions()

    def run(self, messages_list: list[list[dict]]) -> list:
        results: list = [None] * len(messages_list)
        for i, r in self.run_stream(messages_list):
            results[i] = r
        return results

    def run_stream(self, messages_iter: Iterable[list[dict]]):
        """Generator variant: yields (index, GenerationResult) in submission
        order while later requests are still being prepared/executed."""
        from collections import deque

        opts = self.opts
        it = enumerate(messages_iter)
        # batches whose prepare() tasks are submitted ahead of need: when the
        # launch window opens, the futures are (usually) already resolved, so
        # the main thread never stalls on host preprocessing between device
        # batches — profiled, those stalls were 150-375ms of device idle per
        # batch (all the idle there was)
        prefetch_depth = opts.max_in_flight + 2

        with ThreadPoolExecutor(max_workers=opts.prepare_workers) as pool:
            pending: deque = deque()    # (indices, prepare futures)
            in_flight: deque = deque()  # launched batches
            done = False

            def submit_prepare():
                nonlocal done
                idxs, futs = [], []
                for _ in range(opts.batch_size):
                    try:
                        i, msgs = next(it)
                    except StopIteration:
                        done = True
                        break
                    idxs.append(i)
                    futs.append(pool.submit(
                        self.model.prepare, msgs, max_pixels=opts.max_pixels,
                        device_preproc=opts.device_preproc))
                if idxs:
                    pending.append((idxs, futs))

            while not done and len(pending) < prefetch_depth:
                submit_prepare()
            while pending or in_flight:
                while pending and len(in_flight) <= opts.max_in_flight:
                    idxs, futs = pending.popleft()
                    preps = [f.result() for f in futs]
                    handle = self.model.launch_batch(
                        preps, max_new_tokens=opts.max_new_tokens,
                        temperature=opts.temperature, top_p=opts.top_p,
                        seed=opts.seed, eos_token_id=opts.eos_token_id)
                    in_flight.append(_Launched(handle, idxs))
                    if not done:
                        submit_prepare()
                launched = in_flight.popleft()
                for i, r in zip(launched.indices,
                                self.model.finish_batch(launched.handle)):
                    yield i, r

    def _finish(self, launched: _Launched, results: list) -> None:
        for i, r in zip(launched.indices,
                        self.model.finish_batch(launched.handle)):
            results[i] = r
