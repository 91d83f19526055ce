"""Jitted generation loop: bucketed prefill + static-cache decode.

TPU replacement for HF GenerationMixin (reference omchat_qwen2_5_vl.py:535-572
threads multimodal kwargs through HF generate; KeywordsStoppingCriteria stops
on <|im_end|>, mm_utils.py:137-181): here prefill and the whole decode loop
are two jitted programs with static shapes. Prefill lengths are bucketed
(pad-to-multiple) so repeated calls reuse compiled code; the decode loop is a
lax.while_loop with an all-rows-done early exit and greedy / temperature +
top-p sampling.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from vlm_fo1_tpu.config import TextConfig
from vlm_fo1_tpu.models import llm


@dataclass(frozen=True)
class GenerationConfig:
    max_new_tokens: int = 512
    temperature: float = 0.0
    top_p: float = 1.0
    eos_token_id: int = 151645  # <|im_end|>
    pad_token_id: int = 151643
    # multi-token keyword stopping (reference KeywordsStoppingCriteria,
    # mm_utils.py:137-181, matches keywords as token id sequences): tuple of
    # id tuples, n-gram-matched against the tail of the generated ids inside
    # the jitted loop. Static (part of the jit key), like the other fields.
    stop_sequences: tuple = ()


def pad_to_bucket(n: int, multiple: int = 128) -> int:
    return max(multiple, -(-n // multiple) * multiple)


@partial(jax.jit, static_argnames=("cfg", "cache_len"))
def prefill(
    params: dict,
    cfg: TextConfig,
    embeds: jnp.ndarray,        # [B, Sp, D] padded prefill embeddings
    position_ids: jnp.ndarray,  # [3, B, Sp]
    seq_lens: jnp.ndarray,      # [B] actual lengths
    cache_len: int,
):
    """Run the prompt through the trunk, filling a fresh KV cache.

    Returns (kv_cache, last_logits [B, V] fp32).
    """
    b, sp, _ = embeds.shape
    cache = llm.init_kv_cache(cfg, b, cache_len, dtype=embeds.dtype)
    cos, sin = llm.mrope_cos_sin(position_ids, cfg)

    q_pos = jnp.arange(sp)[None, :, None]          # [1, Sp, 1]
    k_pos = jnp.arange(cache_len)[None, None, :]   # [1, 1, C]
    causal = k_pos <= q_pos
    in_prompt = k_pos < seq_lens[:, None, None]
    mask = (causal & in_prompt)[:, None]           # [B, 1, Sp, C]

    hidden, cache = llm.text_forward(params, cfg, embeds, cos, sin, mask,
                                     kv_cache=cache, cache_offset=0)
    last = jnp.take_along_axis(
        hidden, (seq_lens - 1)[:, None, None].astype(jnp.int32), axis=1)
    logits = llm.lm_head_logits(params, cfg, last)[:, 0]
    return cache, logits


def _sample(logits, temperature, top_p, key):
    """Greedy for temperature==0 (static), else top-p nucleus sampling."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / jnp.float32(temperature)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1) - probs
        cutoff_mask = cum > top_p
        kth = jnp.sum(~cutoff_mask, axis=-1, keepdims=True) - 1
        threshold = jnp.take_along_axis(sorted_logits, kth, axis=-1)
        logits = jnp.where(logits < threshold, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("cfg", "gen_cfg", "prompt_pad"),
         donate_argnames=("kv_cache",))
def decode_loop(
    params: dict,
    cfg: TextConfig,
    gen_cfg: GenerationConfig,
    kv_cache: dict,
    first_logits: jnp.ndarray,  # [B, V] from prefill
    seq_lens: jnp.ndarray,      # [B] prompt lengths
    rope_deltas: jnp.ndarray,   # [B] (max position + 1 - prompt len)
    rng: jnp.ndarray,
    prompt_pad: int | None = None,  # cache slot base for generated tokens;
                                    # defaults to seq_lens[0] (B=1 fast path)
):
    """Autoregressive decode with early exit when every row hit EOS.

    Generated tokens occupy cache slots [prompt_pad, prompt_pad+max_new);
    rows with seq_len < prompt_pad simply mask out the gap, which makes
    ragged-prompt batches work with uniform write offsets.

    Returns (tokens [B, max_new] int32 — padded with pad_token_id after EOS,
    num_steps int32, kv_cache). The cache is threaded back out so the donated
    input buffer aliases an output (no silent copy of the multi-hundred-MB
    cache at the while_loop boundary); callers that don't continue generation
    just drop it.
    """
    b = first_logits.shape[0]
    cache_len = kv_cache["k"].shape[2]
    max_new = gen_cfg.max_new_tokens

    def body(state):
        cache, tokens, cur, step, done, key = state
        key, sub = jax.random.split(key)
        # embed current token, rope position = prompt_pos + delta + step
        emb = llm.embed_tokens(params, cur[:, None])  # [B, 1, D]
        # `cur` was generated at loop step-1 -> sequence position
        # seq_len + step - 1; its rope position adds the mrope delta
        pos = (seq_lens + rope_deltas + step - 1)[None, :, None]  # [1, B, 1]
        pos = jnp.broadcast_to(pos, (3, b, 1))
        cos, sin = llm.mrope_cos_sin(pos, cfg)
        k_pos = jnp.arange(cache_len)[None, None, None, :]
        if prompt_pad is None:
            write_at = seq_lens[0] + step - 1
            mask = jnp.broadcast_to(k_pos <= write_at, (b, 1, 1, cache_len))
        else:
            write_at = prompt_pad + step - 1
            in_prompt = k_pos < seq_lens[:, None, None, None]
            in_gen = (k_pos >= prompt_pad) & (k_pos <= write_at)
            mask = in_prompt | in_gen
        hidden, cache = llm.text_forward(params, cfg, emb, cos, sin, mask,
                                         kv_cache=cache,
                                         cache_offset=write_at)
        logits = llm.lm_head_logits(params, cfg, hidden)[:, 0]
        nxt = _sample(logits, gen_cfg.temperature, gen_cfg.top_p, sub)
        nxt = jnp.where(done, gen_cfg.pad_token_id, nxt)
        tokens = tokens.at[:, step].set(nxt)
        done = done | (nxt == gen_cfg.eos_token_id)
        for seq in gen_cfg.stop_sequences:
            n = len(seq)
            if n == 0 or n > max_new:
                continue
            # window of the last n generated ids ending at `step`
            # (dynamic_slice clamps early steps; the step+1 >= n guard
            # keeps those clamped windows from matching)
            win = jax.lax.dynamic_slice_in_dim(tokens, step - n + 1, n,
                                               axis=1)
            hit = jnp.all(win == jnp.asarray(seq, jnp.int32)[None], axis=1)
            done = done | (hit & (step + 1 >= n))
        return cache, tokens, nxt, step + 1, done, key

    def cond(state):
        _, _, _, step, done, _ = state
        return (step < max_new) & ~jnp.all(done)

    # the first generated token comes from the prefill logits
    key, sub = jax.random.split(rng)
    tok0 = _sample(first_logits, gen_cfg.temperature, gen_cfg.top_p, sub)
    tokens = jnp.full((b, max_new), gen_cfg.pad_token_id, jnp.int32)
    tokens = tokens.at[:, 0].set(tok0)
    done0 = tok0 == gen_cfg.eos_token_id
    for seq in gen_cfg.stop_sequences:
        if len(seq) == 1:  # the loop body's window starts at step 1
            done0 = done0 | (tok0 == seq[0])

    state = (kv_cache, tokens, tok0, jnp.int32(1), done0, key)
    state = jax.lax.while_loop(cond, body, state)
    cache, tokens, _, step, _, _ = state
    return tokens, step, cache


@partial(jax.jit, static_argnames=("cfg", "gen_cfg", "prompt_pad", "chunk"),
         donate_argnames=("kv_cache", "tail"))
def decode_chunk(
    params: dict,
    cfg: TextConfig,
    gen_cfg: GenerationConfig,
    kv_cache: dict,
    cur: jnp.ndarray,         # [B] last sampled token per row
    row_steps: jnp.ndarray,   # [B] tokens generated so far (incl. cur)
    done: jnp.ndarray,        # [B] bool
    seq_lens: jnp.ndarray,    # [B] prompt lengths
    rope_deltas: jnp.ndarray, # [B]
    row_max: jnp.ndarray,     # [B] per-request max_new_tokens
    tail: jnp.ndarray,        # [B, T] last T generated ids (stop n-grams)
    rng: jnp.ndarray,
    prompt_pad: int,
    chunk: int,
):
    """Up to `chunk` decode steps over live slot state — the continuous-
    batching decode program (VERDICT r4 #4). Unlike `decode_loop`, every
    per-row quantity (step counter, cache write position, rope position,
    max_new budget) is a vector, so slots REFILLED mid-stream at different
    steps decode together in one batch; the reference has no batching at
    all (its decode fast path is one request at a time,
    omchat_qwen2_5_vl.py:143-155).

    Rows that are `done` emit pad and freeze their counters. Early-exits
    when every row is done. `row_max` makes per-request token budgets (a
    serving API the batch-synchronous loop cannot honor) the deterministic
    mixed-length workload. Returns (tokens [B, chunk], cur, row_steps,
    done, tail, steps_taken, kv_cache).
    """
    b = cur.shape[0]
    cache_len = kv_cache["k"].shape[2]
    tlen = tail.shape[1]

    def body(state):
        cache, tokens, cur, row_steps, lstep, done, tail, key = state
        key, sub = jax.random.split(key)
        emb = llm.embed_tokens(params, cur[:, None])        # [B, 1, D]
        pos = (seq_lens + rope_deltas + row_steps - 1)[None, :, None]
        cos, sin = llm.mrope_cos_sin(
            jnp.broadcast_to(pos, (3, b, 1)), cfg)
        write_at = prompt_pad + row_steps - 1               # [B]
        k_pos = jnp.arange(cache_len)[None, None, None, :]
        in_prompt = k_pos < seq_lens[:, None, None, None]
        in_gen = ((k_pos >= prompt_pad)
                  & (k_pos <= write_at[:, None, None, None]))
        mask = in_prompt | in_gen                           # [B, 1, 1, C]
        hidden, cache = llm.text_forward(params, cfg, emb, cos, sin, mask,
                                         kv_cache=cache,
                                         cache_offset=write_at)
        logits = llm.lm_head_logits(params, cfg, hidden)[:, 0]
        nxt = _sample(logits, gen_cfg.temperature, gen_cfg.top_p, sub)
        nxt = jnp.where(done, gen_cfg.pad_token_id, nxt)
        tokens = tokens.at[:, lstep].set(nxt)
        new_steps = row_steps + jnp.where(done, 0, 1)
        tail = jnp.concatenate([tail[:, 1:], nxt[:, None]], axis=1)
        ndone = done | (nxt == gen_cfg.eos_token_id) | (new_steps >= row_max)
        for seq in gen_cfg.stop_sequences:
            n = len(seq)
            if n == 0 or n > tlen:
                continue
            hit = jnp.all(tail[:, tlen - n:] == jnp.asarray(seq, jnp.int32),
                          axis=1)
            ndone = ndone | (hit & (new_steps >= n))
        return cache, tokens, nxt, new_steps, lstep + 1, ndone, tail, key

    def cond(state):
        _, _, _, _, lstep, done, _, _ = state
        return (lstep < chunk) & ~jnp.all(done)

    tokens = jnp.full((b, chunk), gen_cfg.pad_token_id, jnp.int32)
    state = (kv_cache, tokens, cur, row_steps, jnp.int32(0), done, tail, rng)
    state = jax.lax.while_loop(cond, body, state)
    cache, tokens, cur, row_steps, lstep, done, tail, _ = state
    return tokens, cur, row_steps, done, tail, lstep, cache


@partial(jax.jit, static_argnames=("gen_cfg",))
def sample_first(first_logits, gen_cfg: GenerationConfig, rng):
    """Sample each row's first generated token from prefill logits and
    initialize its done flag — the session-start / refill counterpart of
    decode_loop's tok0 block."""
    tok0 = _sample(first_logits, gen_cfg.temperature, gen_cfg.top_p, rng)
    done0 = tok0 == gen_cfg.eos_token_id
    for seq in gen_cfg.stop_sequences:
        if len(seq) == 1:
            done0 = done0 | (tok0 == seq[0])
    return tok0, done0


@partial(jax.jit, static_argnames=("cfg",),
         donate_argnames=("kv_cache",))
def prefill_into_slots(
    params: dict,
    cfg: TextConfig,
    embeds: jnp.ndarray,        # [G, Sp, D] padded prompts (new requests)
    position_ids: jnp.ndarray,  # [3, G, Sp]
    seq_lens_g: jnp.ndarray,    # [G]
    kv_cache: dict,             # live session cache [L, B, C, Hkv, hd]
    slots: jnp.ndarray,         # [G] batch slots to (re)fill
):
    """Prefill G new requests and scatter their KV into free batch slots of
    a live continuous-batching cache. Stale generated-token KV beyond Sp is
    left in place — decode_chunk's per-row mask never attends past the
    row's write position, so it is unreachable. Returns (kv_cache,
    first_logits [G, V])."""
    sp = embeds.shape[1]
    cache_g, logits = prefill.__wrapped__(params, cfg, embeds, position_ids,
                                          seq_lens_g, cache_len=sp)
    kv_cache = {
        "k": kv_cache["k"].at[:, slots, :sp].set(
            cache_g["k"].astype(kv_cache["k"].dtype)),
        "v": kv_cache["v"].at[:, slots, :sp].set(
            cache_g["v"].astype(kv_cache["v"].dtype)),
    }
    return kv_cache, logits


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("kv_cache",))
def decode_step(
    params: dict,
    cfg: TextConfig,
    kv_cache: dict,
    cur: jnp.ndarray,        # [B] current token ids
    rope_pos: jnp.ndarray,   # [B] rope position of `cur`
    write_at: jnp.ndarray,   # scalar cache slot of `cur`
):
    """One cached decode step (for streaming / interactive use — the batch
    loop path is decode_loop). Returns (logits [B, V] fp32, kv_cache)."""
    b = cur.shape[0]
    cache_len = kv_cache["k"].shape[2]
    emb = llm.embed_tokens(params, cur[:, None])
    pos = jnp.broadcast_to(rope_pos[None, :, None], (3, b, 1))
    cos, sin = llm.mrope_cos_sin(pos, cfg)
    mask = jnp.broadcast_to(
        (jnp.arange(cache_len) <= write_at)[None, None, None, :],
        (b, 1, 1, cache_len))
    hidden, kv_cache = llm.text_forward(params, cfg, emb, cos, sin, mask,
                                        kv_cache=kv_cache,
                                        cache_offset=write_at)
    return llm.lm_head_logits(params, cfg, hidden)[:, 0], kv_cache


def decode_to_text(tokenizer, token_row, eos_token_id=151645,
                   stop_strings=("<|im_end|>",)):
    """Host-side: trim at EOS and decode; string-level stop fallback mirrors
    KeywordsStoppingCriteria's substring check (mm_utils.py:158-172)."""
    toks = list(int(t) for t in token_row)
    if eos_token_id in toks:
        toks = toks[:toks.index(eos_token_id)]
    text = tokenizer.decode(toks, skip_special_tokens=False)
    for s in stop_strings:
        if s in text:
            text = text.split(s)[0]
    return text.strip()


def prefill_sequence_parallel(params, cfg: TextConfig, embeds, position_ids,
                              seq_lens, cache_len: int, mesh,
                              axis: str = "model"):
    """Sequence-parallel prefill: the padded prompt is sharded over `axis`
    of `mesh` and the trunk runs with ring attention (growth path for long
    multimodal prompts — SURVEY.md §2.4; the reference has no distributed
    attention). Returns (kv_cache, last_logits) exactly like `prefill`.

    Sp (the padded length) must divide by the axis size. Params are taken
    as replicated over `axis` (they may still be tensor-sharded over other
    axes by the caller's NamedShardings).
    """
    import functools

    from jax.sharding import NamedSharding, PartitionSpec as P

    b, sp, _ = embeds.shape
    n = mesh.shape[axis]
    assert sp % n == 0, (sp, n)
    cos, sin = llm.mrope_cos_sin(position_ids, cfg)
    pos = jnp.broadcast_to(jnp.arange(sp)[None], (b, sp))
    valid = pos < seq_lens[:, None]

    fn = jax.shard_map(
        functools.partial(llm.text_forward_ring, axis_name=axis),
        mesh=mesh,
        in_specs=(P(), None, P(None, axis), P(None, axis), P(None, axis),
                  P(None, axis), P(None, axis), P(None, axis)),
        out_specs=(P(None, axis),
                   (P(None, None, axis), P(None, None, axis))))
    hidden, (ks, vs) = fn(params, cfg, embeds, cos, sin, pos, pos, valid)

    cache = llm.init_kv_cache(cfg, b, cache_len, dtype=embeds.dtype)
    cache = {
        "k": jax.lax.dynamic_update_slice(
            cache["k"], ks.astype(cache["k"].dtype), (0, 0, 0, 0, 0)),
        "v": jax.lax.dynamic_update_slice(
            cache["v"], vs.astype(cache["v"].dtype), (0, 0, 0, 0, 0)),
    }
    last = jnp.take_along_axis(
        hidden, (seq_lens - 1)[:, None, None].astype(jnp.int32), axis=1)
    logits = llm.lm_head_logits(params, cfg, last)[:, 0]
    return cache, logits.astype(jnp.float32)
