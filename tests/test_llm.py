"""Qwen2.5 decoder parity vs the HF implementation (tiny config, shared
weights): single forward, M-RoPE tables, KV-cache decode, greedy generate."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlm_fo1_tpu.checkpoint import convert_text_model, strip_prefix, to_device_tree
from vlm_fo1_tpu.config import TextConfig
from vlm_fo1_tpu.models import llm
from vlm_fo1_tpu.preprocess.mrope import get_rope_index
from vlm_fo1_tpu.runtime.generate import (
    GenerationConfig,
    decode_loop,
    pad_to_bucket,
    prefill,
)

CFG = TextConfig(
    vocab_size=256, hidden_size=32, intermediate_size=64,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    head_dim=8, mrope_section=(2, 1, 1), rms_norm_eps=1e-5,
    tie_word_embeddings=False,
)


@pytest.fixture(scope="module")
def hf_model():
    torch = pytest.importorskip("torch")
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLConfig,
    )
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VLForConditionalGeneration,
    )

    cfg = Qwen2_5_VLConfig(
        vocab_size=CFG.vocab_size, hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_hidden_layers,
        num_attention_heads=CFG.num_attention_heads,
        num_key_value_heads=CFG.num_key_value_heads,
        rms_norm_eps=CFG.rms_norm_eps, rope_theta=CFG.rope_theta,
        tie_word_embeddings=False,
        rope_scaling={"type": "mrope",
                      "mrope_section": list(CFG.mrope_section)},
        vision_config=dict(depth=1, hidden_size=16, intermediate_size=32,
                           num_heads=2, out_hidden_size=CFG.hidden_size),
    )
    cfg._attn_implementation = "eager"
    torch.manual_seed(7)
    model = Qwen2_5_VLForConditionalGeneration(cfg).eval()
    return model


def _params(hf_model):
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    flat = strip_prefix(sd, "model.language_model.")
    flat.update({k: v for k, v in sd.items() if k.startswith("lm_head")})
    return to_device_tree(convert_text_model(flat, CFG), dtype=jnp.float32)


def test_forward_matches_hf(hf_model, rng):
    torch = pytest.importorskip("torch")
    params = _params(hf_model)
    b, s = 2, 9
    ids = rng.integers(0, CFG.vocab_size, size=(b, s))
    pos, _ = get_rope_index(ids, None)

    with torch.no_grad():
        out = hf_model(input_ids=torch.tensor(ids),
                       position_ids=torch.tensor(np.asarray(pos, np.int64)))
    ref_logits = out.logits.numpy()

    embeds = llm.embed_tokens(params, jnp.asarray(ids))
    cos, sin = llm.mrope_cos_sin(jnp.asarray(pos), CFG)
    q = jnp.arange(s)[None, :, None]
    k = jnp.arange(s)[None, None, :]
    mask = (k <= q)[:, None]
    hidden, _ = llm.text_forward(params, CFG, embeds, cos, sin, mask)
    logits = np.asarray(llm.lm_head_logits(params, CFG, hidden))
    np.testing.assert_allclose(logits, ref_logits, atol=3e-4, rtol=1e-3)


def test_prefill_decode_matches_full_forward(hf_model, rng):
    """Decode with the static KV cache must equal running the whole sequence
    at once."""
    params = _params(hf_model)
    ids = rng.integers(0, CFG.vocab_size, size=(1, 7))
    full = np.concatenate([ids, rng.integers(0, CFG.vocab_size, (1, 3))], 1)
    pos_full, _ = get_rope_index(full, None)

    # oracle: full forward
    embeds = llm.embed_tokens(params, jnp.asarray(full))
    cos, sin = llm.mrope_cos_sin(jnp.asarray(pos_full), CFG)
    s = full.shape[1]
    mask = (jnp.arange(s)[None, None, :] <= jnp.arange(s)[None, :, None])[:, None]
    hidden_full, _ = llm.text_forward(params, CFG, embeds, cos, sin, mask)
    ref = np.asarray(llm.lm_head_logits(params, CFG, hidden_full))

    # prefill on the first 7, then 3 cached decode steps
    pos_p, _ = get_rope_index(ids, None)
    sp = pad_to_bucket(7, 8)
    emb_p = jnp.zeros((1, sp, CFG.hidden_size)).at[:, :7].set(
        llm.embed_tokens(params, jnp.asarray(ids)))
    posp = np.zeros((3, 1, sp), np.int32)
    posp[:, :, :7] = pos_p
    cache, logits = prefill(params, CFG, emb_p, jnp.asarray(posp),
                            jnp.asarray([7]), cache_len=16)
    np.testing.assert_allclose(np.asarray(logits), ref[:, 6], atol=3e-4,
                               rtol=1e-3)

    for step in range(3):
        tok = full[:, 7 + step]
        emb = llm.embed_tokens(params, jnp.asarray(tok)[:, None])
        p = jnp.broadcast_to(jnp.int32(7 + step)[None, None, None], (3, 1, 1))
        cos1, sin1 = llm.mrope_cos_sin(p, CFG)
        mask1 = (jnp.arange(16) <= 7 + step)[None, None, None, :]
        hidden, cache = llm.text_forward(params, CFG, emb, cos1, sin1, mask1,
                                         kv_cache=cache, cache_offset=7 + step)
        got = np.asarray(llm.lm_head_logits(params, CFG, hidden))[:, 0]
        np.testing.assert_allclose(got, ref[:, 7 + step], atol=3e-4, rtol=1e-3)


def test_greedy_generate_matches_hf(hf_model, rng):
    torch = pytest.importorskip("torch")
    params = _params(hf_model)
    ids = rng.integers(0, CFG.vocab_size, size=(1, 6))
    max_new = 8

    with torch.no_grad():
        hf_out = hf_model.generate(
            input_ids=torch.tensor(ids), max_new_tokens=max_new,
            do_sample=False, use_cache=True,
            pad_token_id=0, eos_token_id=-1)
    ref_tokens = hf_out[0, 6:].numpy()

    pos, deltas = get_rope_index(ids, None)
    sp = pad_to_bucket(6, 8)
    emb = jnp.zeros((1, sp, CFG.hidden_size)).at[:, :6].set(
        llm.embed_tokens(params, jnp.asarray(ids)))
    posp = np.zeros((3, 1, sp), np.int32)
    posp[:, :, :6] = pos
    cache, logits = prefill(params, CFG, emb, jnp.asarray(posp),
                            jnp.asarray([6]), cache_len=sp + max_new)
    gen_cfg = GenerationConfig(max_new_tokens=max_new, temperature=0.0,
                               eos_token_id=-7, pad_token_id=0)
    tokens, steps, _ = decode_loop(params, CFG, gen_cfg, cache, logits,
                                   jnp.asarray([6]), jnp.asarray(deltas[:, 0]),
                                   jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(tokens)[0], ref_tokens)
    assert int(steps) == max_new


def test_decode_stops_on_multitoken_keyword(hf_model, rng):
    """KeywordsStoppingCriteria parity (reference mm_utils.py:137-181): a
    2-token stop sequence halts the jitted decode loop via n-gram match
    against the tail of the generated ids."""
    params = _params(hf_model)
    ids = rng.integers(0, CFG.vocab_size, size=(1, 6))
    pos, deltas = get_rope_index(ids, None)
    sp = pad_to_bucket(6, 8)
    emb = jnp.zeros((1, sp, CFG.hidden_size)).at[:, :6].set(
        llm.embed_tokens(params, jnp.asarray(ids)))
    posp = np.zeros((3, 1, sp), np.int32)
    posp[:, :, :6] = pos

    def decode(stop_sequences):
        cache, logits = prefill(params, CFG, emb, jnp.asarray(posp),
                                jnp.asarray([6]), cache_len=sp + 8)
        gen_cfg = GenerationConfig(max_new_tokens=8, temperature=0.0,
                                   eos_token_id=-7, pad_token_id=0,
                                   stop_sequences=stop_sequences)
        tokens, steps, _ = decode_loop(params, CFG, gen_cfg, cache, logits,
                                       jnp.asarray([6]),
                                       jnp.asarray(deltas[:, 0]),
                                       jax.random.PRNGKey(0))
        return np.asarray(tokens)[0], int(steps)

    free, n_free = decode(())
    assert n_free == 8
    keyword = (int(free[2]), int(free[3]))  # 2-token keyword mid-stream
    tokens, steps = decode((keyword,))
    assert steps == 4  # stops right after the keyword's last token
    np.testing.assert_array_equal(tokens[:4], free[:4])
    assert (tokens[4:] == 0).all()

    # a 1-token keyword equal to the very first generated token
    tokens, steps = decode(((int(free[0]),),))
    assert steps == 1


def test_decode_stops_at_eos(hf_model, rng):
    params = _params(hf_model)
    ids = rng.integers(0, CFG.vocab_size, size=(1, 6))
    pos, deltas = get_rope_index(ids, None)
    emb = llm.embed_tokens(params, jnp.asarray(ids))
    cache, logits = prefill(params, CFG, emb, jnp.asarray(pos),
                            jnp.asarray([6]), cache_len=32)
    # force EOS = the actual greedy first token -> loop must stop immediately
    eos = int(np.asarray(jnp.argmax(logits, -1))[0])
    gen_cfg = GenerationConfig(max_new_tokens=8, temperature=0.0,
                               eos_token_id=eos, pad_token_id=0)
    tokens, steps, _ = decode_loop(params, CFG, gen_cfg, cache, logits,
                                   jnp.asarray([6]), jnp.asarray(deltas[:, 0]),
                                   jax.random.PRNGKey(0))
    assert int(steps) == 1
    assert int(np.asarray(tokens)[0, 0]) == eos
    assert (np.asarray(tokens)[0, 1:] == 0).all()


def test_batched_decode_early_exit_and_per_row_padding(hf_model, rng):
    """Batched decode must (a) stop the while_loop well before
    max_new_tokens when every row hits EOS early (decode_loop cond,
    runtime/generate.py:159-161), and (b) pad each row after ITS OWN EOS
    even when other rows keep generating — the long-decode serving
    property (VERDICT r3 #7)."""
    params = _params(hf_model)
    b, s, max_new = 4, 6, 24
    ids = rng.integers(0, CFG.vocab_size, size=(1, s))
    ids = np.repeat(ids, b, axis=0)           # identical rows
    pos, deltas = get_rope_index(ids, None)
    sp = pad_to_bucket(s, 8)
    emb = jnp.zeros((b, sp, CFG.hidden_size)).at[:, :s].set(
        llm.embed_tokens(params, jnp.asarray(ids)))
    posp = np.zeros((3, b, sp), np.int32)
    posp[:, :, :s] = pos

    def run(eos):
        cache, logits = prefill(params, CFG, emb, jnp.asarray(posp),
                                jnp.asarray([s] * b),
                                cache_len=sp + max_new)
        gen_cfg = GenerationConfig(max_new_tokens=max_new, temperature=0.0,
                                   eos_token_id=eos, pad_token_id=0)
        tokens, steps, _ = decode_loop(params, CFG, gen_cfg, cache, logits,
                                       jnp.asarray([s] * b),
                                       jnp.asarray(deltas[:, 0]),
                                       jax.random.PRNGKey(0),
                                       prompt_pad=sp)
        return np.asarray(tokens), int(steps)

    free, n_free = run(eos=-7)
    assert n_free == max_new
    # all identical rows -> identical streams
    for i in range(1, b):
        np.testing.assert_array_equal(free[i], free[0])

    # (a) every row hits EOS at step 3 -> the loop exits at 4, not max_new
    eos = int(free[0, 3])
    k = int(np.argmax(free[0] == eos))  # first occurrence (may be < 3)
    tokens, steps = run(eos=eos)
    assert steps == k + 1 < max_new
    np.testing.assert_array_equal(tokens[:, :k + 1], free[:, :k + 1])
    assert (tokens[:, k + 1:] == 0).all()

    # (b) ragged completion: row 3 gets a different prompt so rows finish
    # at different times (or row 3 never finishes); finished rows pad
    ids2 = ids.copy()
    ids2[3] = rng.integers(0, CFG.vocab_size, size=(s,))
    pos2, deltas2 = get_rope_index(ids2, None)
    emb2 = jnp.zeros((b, sp, CFG.hidden_size)).at[:, :s].set(
        llm.embed_tokens(params, jnp.asarray(ids2)))
    posp2 = np.zeros((3, b, sp), np.int32)
    posp2[:, :, :s] = pos2
    cache, logits = prefill(params, CFG, emb2, jnp.asarray(posp2),
                            jnp.asarray([s] * b), cache_len=sp + max_new)
    gen_cfg = GenerationConfig(max_new_tokens=max_new, temperature=0.0,
                               eos_token_id=eos, pad_token_id=0)
    tokens2, steps2, _ = decode_loop(params, CFG, gen_cfg, cache, logits,
                                     jnp.asarray([s] * b),
                                     jnp.asarray(deltas2[:, 0]),
                                     jax.random.PRNGKey(0), prompt_pad=sp)
    tokens2 = np.asarray(tokens2)
    # rows 0-2 stopped at k; everything after is padding for them
    np.testing.assert_array_equal(tokens2[:3, :k + 1], free[:3, :k + 1])
    assert (tokens2[:3, k + 1:] == 0).all()
    # row 3 decodes past rows 0-2's stop iff it didn't emit eos first
    row3 = tokens2[3]
    if eos in row3.tolist():
        j = row3.tolist().index(eos)
        assert (row3[j + 1:] == 0).all()
    else:
        assert int(steps2) == max_new
