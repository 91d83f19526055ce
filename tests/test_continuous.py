"""Continuous batching (slot refill) tests: chunked decode equivalence,
prefill-into-slots equivalence, and the serving pipeline's throughput
accounting on mixed-length traffic (VERDICT r4 #4 — the reference has no
batching at all; its decode fast path is per-request,
omchat_qwen2_5_vl.py:143-155)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlm_fo1_tpu.config import TextConfig
from vlm_fo1_tpu.models import llm
from vlm_fo1_tpu.preprocess.mrope import get_rope_index
from vlm_fo1_tpu.runtime.generate import (
    GenerationConfig,
    decode_chunk,
    decode_loop,
    pad_to_bucket,
    prefill,
    prefill_into_slots,
    sample_first,
)

CFG = TextConfig(
    vocab_size=256, hidden_size=32, intermediate_size=64,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    head_dim=8, mrope_section=(2, 1, 1), rms_norm_eps=1e-5,
    tie_word_embeddings=False,
)


@pytest.fixture(scope="module")
def params():
    return llm.init_text_params(jax.random.PRNGKey(3), CFG)


def _prefill_batch(params, ids):
    b, s = ids.shape
    pos, deltas = get_rope_index(ids, None)
    sp = pad_to_bucket(s, 8)
    emb = jnp.zeros((b, sp, CFG.hidden_size)).at[:, :s].set(
        llm.embed_tokens(params, jnp.asarray(ids)))
    posp = np.zeros((3, b, sp), np.int32)
    posp[:, :, :s] = pos
    return emb, posp, deltas, sp


def test_decode_chunk_matches_decode_loop(params, rng):
    """N steps of chunked decode (3 chunks) must emit exactly the tokens of
    one decode_loop run with the same start state (greedy)."""
    b, s, max_new = 3, 6, 12
    ids = rng.integers(0, CFG.vocab_size, size=(b, s))
    emb, posp, deltas, sp = _prefill_batch(params, ids)
    gen_cfg = GenerationConfig(max_new_tokens=max_new, temperature=0.0,
                               eos_token_id=-7, pad_token_id=0)

    cache, logits = prefill(params, CFG, emb, jnp.asarray(posp),
                            jnp.asarray([s] * b), cache_len=sp + max_new)
    ref_tokens, ref_steps, _ = decode_loop(
        params, CFG, gen_cfg, cache, logits, jnp.asarray([s] * b),
        jnp.asarray(deltas[:, 0]), jax.random.PRNGKey(0), prompt_pad=sp)
    ref_tokens = np.asarray(ref_tokens)

    cache, logits = prefill(params, CFG, emb, jnp.asarray(posp),
                            jnp.asarray([s] * b), cache_len=sp + max_new)
    cur, done = sample_first(logits, gen_cfg, jax.random.PRNGKey(0))
    row_steps = jnp.ones((b,), jnp.int32)
    tail = jnp.full((b, 1), -1, jnp.int32)
    got = [np.asarray(cur)[:, None]]
    row_max = jnp.full((b,), max_new, jnp.int32)
    for _ in range(3):
        toks, cur, row_steps, done, tail, steps, cache = decode_chunk(
            params, CFG, gen_cfg, cache, cur, row_steps, done,
            jnp.asarray([s] * b), jnp.asarray(deltas[:, 0]), row_max, tail,
            jax.random.PRNGKey(1), prompt_pad=sp, chunk=4)
        t = np.asarray(toks)
        got.append(t[:, :int(steps)])
    got = np.concatenate(got, axis=1)
    assert got.shape[1] >= max_new
    np.testing.assert_array_equal(got[:, :max_new], ref_tokens)
    # chunk counters: every row generated exactly max_new (row_max) tokens
    np.testing.assert_array_equal(np.asarray(row_steps), max_new)
    assert bool(np.asarray(done).all())


def test_row_max_budgets_and_early_exit(params, rng):
    """Per-row max_new budgets freeze rows independently; the chunk loop
    early-exits once every row is done."""
    b, s = 3, 6
    ids = rng.integers(0, CFG.vocab_size, size=(1, s))
    ids = np.repeat(ids, b, axis=0)
    emb, posp, deltas, sp = _prefill_batch(params, ids)
    gen_cfg = GenerationConfig(max_new_tokens=16, temperature=0.0,
                               eos_token_id=-7, pad_token_id=0)
    cache, logits = prefill(params, CFG, emb, jnp.asarray(posp),
                            jnp.asarray([s] * b), cache_len=sp + 16)
    cur, done = sample_first(logits, gen_cfg, jax.random.PRNGKey(0))
    row_max = jnp.asarray([2, 5, 9], jnp.int32)
    toks, cur, row_steps, done, tail, steps, cache = decode_chunk(
        params, CFG, gen_cfg, cache, cur, jnp.ones((b,), jnp.int32), done,
        jnp.asarray([s] * b), jnp.asarray(deltas[:, 0]), row_max,
        jnp.full((b, 1), -1, jnp.int32), jax.random.PRNGKey(1),
        prompt_pad=sp, chunk=16)
    toks = np.asarray(toks)
    np.testing.assert_array_equal(np.asarray(row_steps), [2, 5, 9])
    assert bool(np.asarray(done).all())
    # loop exited when the longest row hit its budget, not at chunk=16
    assert int(steps) == 8
    # identical prompts -> identical streams while alive, pad after
    np.testing.assert_array_equal(toks[0, :1], toks[2, :1])
    assert (toks[0, 1:] == 0).all()
    np.testing.assert_array_equal(toks[1, :4], toks[2, :4])
    assert (toks[1, 4:] == 0).all()


def test_prefill_into_slots_matches_fresh(params, rng):
    """A request refilled into a used slot must decode exactly like a
    fresh batch containing it (greedy)."""
    b, s, max_new = 2, 6, 8
    ids_ab = rng.integers(0, CFG.vocab_size, size=(b, s))
    ids_c = rng.integers(0, CFG.vocab_size, size=(1, s))
    gen_cfg = GenerationConfig(max_new_tokens=max_new, temperature=0.0,
                               eos_token_id=-7, pad_token_id=0)

    # reference: C decoded in a fresh batch next to B
    ids_ref = np.stack([ids_c[0], ids_ab[1]])
    emb, posp, deltas_ref, sp = _prefill_batch(params, ids_ref)
    cache, logits = prefill(params, CFG, emb, jnp.asarray(posp),
                            jnp.asarray([s] * b), cache_len=sp + max_new)
    ref_tokens, _, _ = decode_loop(
        params, CFG, gen_cfg, cache, logits, jnp.asarray([s] * b),
        jnp.asarray(deltas_ref[:, 0]), jax.random.PRNGKey(0), prompt_pad=sp)
    ref_c = np.asarray(ref_tokens)[0]

    # session: decode A,B a few steps, then refill slot 0 with C
    emb, posp, deltas, sp = _prefill_batch(params, ids_ab)
    cache, logits = prefill(params, CFG, emb, jnp.asarray(posp),
                            jnp.asarray([s] * b), cache_len=sp + max_new)
    cur, done = sample_first(logits, gen_cfg, jax.random.PRNGKey(0))
    seq_lens = jnp.asarray([s] * b)
    deltas_d = jnp.asarray(deltas[:, 0])
    row_max = jnp.full((b,), max_new, jnp.int32)
    tail = jnp.full((b, 1), -1, jnp.int32)
    toks, cur, row_steps, done, tail, steps, cache = decode_chunk(
        params, CFG, gen_cfg, cache, cur, jnp.ones((b,), jnp.int32), done,
        seq_lens, deltas_d, row_max, tail, jax.random.PRNGKey(1),
        prompt_pad=sp, chunk=3)

    # refill slot 0 with C
    emb_c, posp_c, deltas_c, _ = _prefill_batch(params, ids_c)
    slots = jnp.asarray([0], jnp.int32)
    cache, logits_c = prefill_into_slots(
        params, CFG, emb_c, jnp.asarray(posp_c), jnp.asarray([s]), cache,
        slots)
    tok0_c, done_c = sample_first(logits_c, gen_cfg, jax.random.PRNGKey(2))
    cur = cur.at[slots].set(tok0_c)
    row_steps = row_steps.at[slots].set(1)
    done = done.at[slots].set(done_c)
    deltas_d = deltas_d.at[slots].set(deltas_c[0, 0])
    got_c = [int(np.asarray(tok0_c)[0])]
    for _ in range(4):
        prev0 = int(np.asarray(row_steps)[0])
        toks, cur, row_steps, done, tail, steps, cache = decode_chunk(
            params, CFG, gen_cfg, cache, cur, row_steps, done, seq_lens,
            deltas_d, row_max, tail, jax.random.PRNGKey(3),
            prompt_pad=sp, chunk=3)
        t = np.asarray(toks)
        cnt = int(np.asarray(row_steps)[0]) - prev0
        got_c.extend(int(x) for x in t[0, :cnt])
        if bool(np.asarray(done).all()):
            break
    got_c = np.asarray(got_c)
    assert len(got_c) == max_new
    np.testing.assert_array_equal(got_c, ref_c[:max_new])


def _fo1_requests(tmp_path, rng, n):
    import os

    from PIL import Image

    paths = []
    img = rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)
    for i in range(n):
        p = os.path.join(str(tmp_path), f"im{i}.jpg")
        # same pixels -> same geometry (the session's one-grid constraint)
        Image.fromarray(img).save(p)
        paths.append(p)
    reqs = []
    for i, p in enumerate(paths):
        reqs.append([{
            "role": "user",
            "content": [
                {"type": "image_url", "image_url": {"url": p}},
                {"type": "text", "text": f"Describe object {i}."},
            ],
            "bbox_list": [[1, 1, 30, 30]],
        }])
    return reqs


def test_continuous_pipeline_mixed_lengths(tmp_path, rng):
    """End-to-end: mixed per-request budgets through the slot-refill
    pipeline — results match the batch-synchronous path per request, and
    the decode-step count beats batch-synchronous by >= 1.5x on 4-vs-16
    mixed traffic."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import StubTokenizer

    from vlm_fo1_tpu.config import FO1Config
    from vlm_fo1_tpu.models.fo1 import FO1Model
    from vlm_fo1_tpu.runtime.serving import (
        ContinuousOptions,
        ContinuousServingPipeline,
    )

    model = FO1Model.random_init(FO1Config.tiny(), seed=0,
                                 tokenizer=StubTokenizer())
    n = 10
    short, long_ = 2, 24
    maxes = [short if i % 2 == 0 else long_ for i in range(n)]
    reqs = [{"messages": m, "max_new_tokens": mx}
            for m, mx in zip(_fo1_requests(tmp_path, rng, n), maxes)]

    pipe = ContinuousServingPipeline(model, ContinuousOptions(
        batch_size=2, chunk=4, refill_size=1, max_new_tokens=long_,
        device_preproc=False))
    results = pipe.run(reqs)
    assert all(r is not None for r in results)
    for r, mx in zip(results, maxes):
        assert r.num_steps <= mx

    # batch-synchronous reference: same traffic in fixed batches of 2 runs
    # every batch to the longest budget
    sync_steps = 0
    sync_results = []
    for i in range(0, n, 2):
        batch = [reqs[i]["messages"], reqs[i + 1]["messages"]]
        preps = [model.prepare(m, device_preproc=False) for m in batch]
        handle = model.launch_batch(preps,
                                    max_new_tokens=max(maxes[i:i + 2]))
        sync_steps += int(handle["steps"])
        sync_results.extend(model.finish_batch(handle))

    # per-request outputs agree on the shared budget prefix
    for r_cont, r_sync, mx in zip(results, sync_results, maxes):
        np.testing.assert_array_equal(
            np.asarray(r_cont.token_ids)[:mx],
            np.asarray(r_sync.token_ids)[:mx])

    steps = pipe.stats["device_steps"]
    assert steps * 3 <= sync_steps * 2, (steps, sync_steps)
