"""Qwen2.5 decoder trunk with M-RoPE and GQA, TPU-native.

Functional re-implementation of the vendored Qwen2.5-VL language model
(reference modeling_qwen2_5_vl.py:566-1102): RMSNorm -> GQA attention with
3-section multimodal rotary embeddings -> SwiGLU MLP, with a *static* KV
cache ([L, B, C, Hkv, hd] preallocated, dynamic_update_slice per step) so the
decode loop jits to a single fixed program — the TPU replacement for HF's
dynamic Cache objects.

Numerics parity: RMSNorm stats fp32 (reference :135-140), rotary tables fp32
(:611-618), attention softmax fp32 (:784).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from vlm_fo1_tpu import nn
from vlm_fo1_tpu.config import TextConfig


def stack_layer_params(layers: list[dict]) -> dict:
    """List of identical per-layer pytrees -> one pytree with a leading layer
    axis, ready for lax.scan (cuts trace/compile time ~num_layers-fold)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def init_text_params(key, cfg: TextConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, cfg.num_hidden_layers + 2)
    d = cfg.hidden_size
    hd = cfg.head_dim
    layers = []
    for i in range(cfg.num_hidden_layers):
        k = jax.random.split(keys[i], 7)
        layers.append({
            "input_layernorm": nn.rms_norm_init(d, dtype),
            "post_attention_layernorm": nn.rms_norm_init(d, dtype),
            "attn": {
                "q_proj": nn.linear_init(k[0], d, cfg.num_attention_heads * hd,
                                         bias=cfg.attention_bias, dtype=dtype),
                "k_proj": nn.linear_init(k[1], d, cfg.num_key_value_heads * hd,
                                         bias=cfg.attention_bias, dtype=dtype),
                "v_proj": nn.linear_init(k[2], d, cfg.num_key_value_heads * hd,
                                         bias=cfg.attention_bias, dtype=dtype),
                "o_proj": nn.linear_init(k[3], cfg.num_attention_heads * hd, d,
                                         bias=False, dtype=dtype),
            },
            "mlp": {
                "gate_proj": nn.linear_init(k[4], d, cfg.intermediate_size,
                                            bias=False, dtype=dtype),
                "up_proj": nn.linear_init(k[5], d, cfg.intermediate_size,
                                          bias=False, dtype=dtype),
                "down_proj": nn.linear_init(k[6], cfg.intermediate_size, d,
                                            bias=False, dtype=dtype),
            },
        })
    params = {
        "embed_tokens": nn.embedding_init(keys[-2], cfg.vocab_size, d, dtype),
        "layers": stack_layer_params(layers),
        "norm": nn.rms_norm_init(d, dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = nn.linear_init(keys[-1], d, cfg.vocab_size,
                                           bias=False, dtype=dtype)
    return params


def mrope_cos_sin(position_ids: jnp.ndarray, cfg: TextConfig):
    """3-section multimodal rotary tables.

    position_ids: [3, B, S] int. Returns cos/sin [B, S, head_dim] fp32 with
    the per-channel t/h/w interleave of the reference
    apply_multimodal_rotary_pos_emb (modeling:643-685): channel blocks of the
    half-dim are taken from the t, h, w position streams in mrope_section
    order, then duplicated for the rotate-half layout.
    """
    hd = cfg.head_dim
    inv_freq = 1.0 / (cfg.rope_theta ** (
        jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))  # [hd/2]
    freqs = position_ids.astype(jnp.float32)[..., None] * inv_freq  # [3,B,S,hd/2]

    sections = list(cfg.mrope_section)
    assert sum(sections) == hd // 2, "mrope sections must cover half head_dim"
    parts = []
    start = 0
    for i, sec in enumerate(sections):
        parts.append(freqs[i % 3, :, :, start:start + sec])
        start += sec
    half = jnp.concatenate(parts, axis=-1)          # [B, S, hd/2]
    emb = jnp.concatenate([half, half], axis=-1)    # [B, S, hd]
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _apply_rope(x, cos, sin):
    """x: [B, S, H, hd]; cos/sin: [B, S, hd] fp32 angle tables.

    The multiply-add runs in x.dtype (tables are cast down): fp32 inputs
    (parity tests) match the reference's upcast rotary exactly
    (modeling:643-685); bf16 serving keeps q/k in bf16 so the attention
    matmuls stay on the fast MXU path instead of materializing fp32
    rotate-half intermediates."""
    out = (x * cos[:, :, None, :].astype(x.dtype)
           + _rotate_half(x) * sin[:, :, None, :].astype(x.dtype))
    return out


def init_kv_cache(cfg: TextConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
    shape = (cfg.num_hidden_layers, batch, max_len,
             cfg.num_key_value_heads, cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def _attention(p, cfg: TextConfig, x, cos, sin, mask, layer_cache,
               cache_offset):
    """GQA attention. x: [B, S, D]; mask: [B, 1, S, C] (C = cache length when
    a cache is used, else S); layer_cache: (k [B,C,Hkv,hd], v) or None.

    cache_offset may be a scalar (shared write position — prefill and the
    batch-synchronous decode loop) or a [B] vector of PER-ROW positions
    (continuous-batching decode, where refilled slots sit at different
    steps; the per-row path requires S == 1)."""
    b, s, _ = x.shape
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    q = nn.linear(p["q_proj"], x).reshape(b, s, nh, hd)
    k = nn.linear(p["k_proj"], x).reshape(b, s, nkv, hd)
    v = nn.linear(p["v_proj"], x).reshape(b, s, nkv, hd)
    q = _apply_rope(q, cos, sin)
    k = _apply_rope(k, cos, sin)

    if layer_cache is not None:
        kc, vc = layer_cache
        if getattr(cache_offset, "ndim", 0) == 1:
            assert s == 1, "per-row cache offsets require single-token steps"
            # masked select, NOT a vmapped dynamic_update_slice: the
            # latter lowers to a per-row scatter that XLA:TPU serializes
            # (measured ~10x on the whole decode step); the select streams
            # the full cache once per layer (~20MB at batch 16), well
            # within the step's weight-stream budget
            col = jnp.arange(kc.shape[1])[None, :, None, None]
            at = cache_offset[:, None, None, None]
            kc = jnp.where(col == at, k.astype(kc.dtype), kc)
            vc = jnp.where(col == at, v.astype(vc.dtype), vc)
        else:
            kc = jax.lax.dynamic_update_slice(
                kc, k.astype(kc.dtype), (0, cache_offset, 0, 0))
            vc = jax.lax.dynamic_update_slice(
                vc, v.astype(vc.dtype), (0, cache_offset, 0, 0))
        new_cache = (kc, vc)
        k_all, v_all = kc.astype(x.dtype), vc.astype(x.dtype)
    else:
        new_cache = None
        k_all, v_all = k, v

    # GQA: fold the group dim into the query heads
    groups = nh // nkv
    if s == 1 and layer_cache is not None:
        # decode-specialized: drop the S=1 dim BEFORE the score einsum.
        # The general path's [B, n, g, S, C] logits put S=1 second-minor,
        # which tile-pads 8x and inflates every materialization in the
        # mask -> softmax -> weighted-sum chain (profiled ~35% of the
        # batched decode step beyond the weight stream); [B, n, g, C] has
        # clean (8, 128) tiles (g = 8 for Qwen2.5's 16q/2kv GQA).
        qg = q.reshape(b, nkv, groups, hd)
        logits = jnp.einsum("bngh,bcnh->bngc", qg, k_all,
                            preferred_element_type=jnp.float32)
        logits = logits * (1.0 / jnp.sqrt(jnp.float32(hd)))
        m1 = mask[:, 0, 0, :][:, None, None, :]            # [B, 1, 1, C]
        logits = jnp.where(m1, logits, jnp.finfo(jnp.float32).min)
        logits = logits.astype(x.dtype)
        probs = jax.nn.softmax(logits.astype(jnp.float32),
                               axis=-1).astype(x.dtype)
        out = jnp.einsum("bngc,bcnh->bngh", probs, v_all)
        out = out.reshape(b, 1, nh * hd)
        return nn.linear(p["o_proj"], out), new_cache
    qg = q.reshape(b, s, nkv, groups, hd)
    logits = jnp.einsum("bsngh,bcnh->bngsc", qg, k_all,
                        preferred_element_type=jnp.float32)
    logits = logits * (1.0 / jnp.sqrt(jnp.float32(hd)))
    logits = jnp.where(mask[:, :, None], logits, jnp.finfo(jnp.float32).min)
    # bf16 logit storage, f32 softmax internals (see nn.sdpa)
    logits = logits.astype(x.dtype)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bngsc,bcnh->bsngh", probs, v_all)
    out = out.reshape(b, s, nh * hd)
    return nn.linear(p["o_proj"], out), new_cache


def _layer(layer, cfg, x, cos, sin, mask, layer_cache, cache_offset):
    act = nn.ACT[cfg.hidden_act]
    attn_out, new_cache = _attention(
        layer["attn"], cfg,
        nn.rms_norm(layer["input_layernorm"], x, eps=cfg.rms_norm_eps),
        cos, sin, mask, layer_cache, cache_offset)
    x = x + attn_out
    h = nn.rms_norm(layer["post_attention_layernorm"], x, eps=cfg.rms_norm_eps)
    if "fused_int4" in layer["mlp"]:
        # int4-mlp mode: one Pallas kernel streams gate+up+down packed
        # nibbles exactly once (ops/int4_mlp.py; silu baked in)
        assert cfg.hidden_act == "silu"
        from vlm_fo1_tpu.ops.int4_mlp import int4_mlp

        x = x + int4_mlp(h, layer["mlp"]["fused_int4"])
    else:
        x = x + nn.linear(layer["mlp"]["down_proj"],
                          act(nn.linear(layer["mlp"]["gate_proj"], h))
                          * nn.linear(layer["mlp"]["up_proj"], h))
    return x, new_cache


def text_forward(
    params: dict,
    cfg: TextConfig,
    hidden: jnp.ndarray,          # [B, S, D] input embeddings
    cos: jnp.ndarray,             # [B, S, hd] fp32
    sin: jnp.ndarray,
    mask: jnp.ndarray,            # [B, 1, S, C] bool, True = attend
    kv_cache: dict | None = None,
    cache_offset=0,
    remat: bool = False,
):
    """Run the decoder trunk via lax.scan over the stacked layer params
    (one traced layer instead of num_hidden_layers copies — keeps compile
    time flat in depth). Returns (hidden [B,S,D], updated kv_cache).

    remat=True checkpoints each scanned layer (training: activation memory
    drops from O(layers) to O(1) residuals at one extra forward of
    recompute — the jax.checkpoint analog of the reference's
    gradient-checkpointing hooks, modeling_qwen2_5_vl/davit)."""
    stacked = params["layers"]

    if kv_cache is None:
        def body(x, lp):
            x, _ = _layer(lp, cfg, x, cos, sin, mask, None, cache_offset)
            return x, None

        if remat:
            body = jax.checkpoint(body)
        x, _ = jax.lax.scan(body, hidden, stacked)
        out_cache = None
    else:
        def body(x, xs):
            lp, kc, vc = xs
            x, (kc, vc) = _layer(lp, cfg, x, cos, sin, mask, (kc, vc),
                                 cache_offset)
            return x, (kc, vc)

        x, (knew, vnew) = jax.lax.scan(
            body, hidden, (stacked, kv_cache["k"], kv_cache["v"]))
        out_cache = {"k": knew, "v": vnew}

    x = nn.rms_norm(params["norm"], x, eps=cfg.rms_norm_eps)
    return x, out_cache


def lm_head_logits(params: dict, cfg: TextConfig, hidden: jnp.ndarray):
    """[B, S, D] -> [B, S, V] fp32 logits (tied or untied head; int8-aware)."""
    if cfg.tie_word_embeddings or "lm_head" not in params:
        emb = params["embed_tokens"]
        if "w_q" in emb:
            # int8 tied head: feed the int8 table to the dot directly and
            # scale per logit (per-row scales, quant.quantize_embedding) —
            # halves the dominant decode-loop HBM stream
            logits = jax.lax.dot_general(
                hidden, emb["w_q"], (((2,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return logits * emb["scale"]
        return jnp.einsum("bsd,vd->bsv", hidden, emb["w"],
                          preferred_element_type=jnp.float32)
    head = params["lm_head"]
    if "w_q" in head:
        # int8 operand fed to the dot DIRECTLY: an .astype first would make
        # XLA materialize a bf16 copy of the whole 0.3GB head every step
        logits = jax.lax.dot_general(
            hidden, head["w_q"], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return logits * head["scale"]
    if "w_q4" in head:
        from vlm_fo1_tpu import nn as _nn

        # fp32 activations -> fp32 logits through the int4 dispatch
        return _nn.linear(head, hidden.astype(jnp.float32))
    return jnp.einsum("bsd,dv->bsv", hidden, head["w"],
                      preferred_element_type=jnp.float32)


def embed_tokens(params: dict, ids: jnp.ndarray):
    # the final-norm scale carries the model's compute dtype (bf16 serving,
    # f32 tests) — the quantized-table path dequantizes into it
    return nn.embedding(params["embed_tokens"], ids,
                        dtype=params["norm"]["scale"].dtype)


def splice_multimodal_embeds(
    params: dict,
    input_ids: jnp.ndarray,        # [S] expanded ids (region slots negative)
    image_features: jnp.ndarray | None,   # [n_img_tokens, D]
    image_positions: jnp.ndarray | None,  # [n_img_tokens]
    region_features: jnp.ndarray | None,  # [n_regions, D]
    region_positions: jnp.ndarray | None,
) -> jnp.ndarray:
    """Text embedding + feature scatter (the reference's python splice loop,
    omchat_qwen2_5_vl.py:236-373, reduced to two XLA scatters)."""
    embeds = embed_tokens(params, jnp.maximum(input_ids, 0))
    if image_features is not None and image_positions is not None:
        embeds = embeds.at[image_positions].set(
            image_features.astype(embeds.dtype))
    if region_features is not None and region_positions is not None:
        embeds = embeds.at[region_positions].set(
            region_features.astype(embeds.dtype))
    return embeds


def text_forward_ring(params, cfg: TextConfig, hidden, cos, sin, q_pos,
                      kv_pos, kv_valid, axis_name: str):
    """Sequence-parallel trunk forward for use inside jax.shard_map: the
    sequence axis of `hidden`/`cos`/`sin`/positions is sharded over
    `axis_name` and attention runs as ring attention (K/V blocks rotate via
    ppermute — parallel/ring_attention.py). Everything else (projections,
    norms, MLP) is token-local so it needs no communication.

    Returns (hidden [B, Sl, D], (k, v) [L, B, Sl, Hkv, hd]) — the per-layer
    K/V for cache assembly outside the shard_map.
    """
    from vlm_fo1_tpu.parallel.ring_attention import ring_attention

    act = nn.ACT[cfg.hidden_act]
    nh, nkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                   cfg.head_dim)

    def body(x, lp):
        b, s, _ = x.shape
        h = nn.rms_norm(lp["input_layernorm"], x, eps=cfg.rms_norm_eps)
        q = nn.linear(lp["attn"]["q_proj"], h).reshape(b, s, nh, hd)
        k = nn.linear(lp["attn"]["k_proj"], h).reshape(b, s, nkv, hd)
        v = nn.linear(lp["attn"]["v_proj"], h).reshape(b, s, nkv, hd)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)
        attn = ring_attention(q, k, v, q_pos, kv_pos, kv_valid, axis_name)
        x = x + nn.linear(lp["attn"]["o_proj"], attn.reshape(b, s, nh * hd))
        h = nn.rms_norm(lp["post_attention_layernorm"], x,
                        eps=cfg.rms_norm_eps)
        if "fused_int4" in lp["mlp"]:
            # Same dispatch as _layer: int4-mlp-quantized params carry a
            # fused node instead of gate/up/down linears.
            assert cfg.hidden_act == "silu"
            from vlm_fo1_tpu.ops.int4_mlp import int4_mlp

            x = x + int4_mlp(h, lp["mlp"]["fused_int4"])
        else:
            x = x + nn.linear(lp["mlp"]["down_proj"],
                              act(nn.linear(lp["mlp"]["gate_proj"], h))
                              * nn.linear(lp["mlp"]["up_proj"], h))
        return x, (k, v)

    x, (ks, vs) = jax.lax.scan(body, hidden, params["layers"])
    x = nn.rms_norm(params["norm"], x, eps=cfg.rms_norm_eps)
    return x, (ks, vs)
