"""Weight-only int8 quantization.

Parity feature for the reference's `load_8bit` flag (model/builder.py:25-27,
bitsandbytes) re-designed for TPU: per-output-channel symmetric int8 weights
stored in HBM, upconverted inside the fused matmul — halves the HBM traffic
that bounds single-stream decode. Activations stay bf16; scales are fp32.

Quantized linears are drop-in: nn.linear dispatches on the presence of
"w_q" in the param dict.
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp


@jax.jit
def _quantize_weight(w):
    """bf16/f32 [..., in, out] -> (int8 weights, f32 [..., out] scales).
    Jitted so the fp32 upcast / amax / round / clip chain fuses into one
    pass over the tensor instead of materializing ~4 full-size eager temps
    (a 1.6GB stacked-trunk tensor would otherwise spike >9GB)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    w_q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return w_q, scale.squeeze(-2)


def quantize_linear(p: dict) -> dict:
    """{"w": [in, out], "b"?} -> {"w_q": int8, "scale": f32 [out], "b"?}.
    Works on stacked layer params too ([..., in, out]): scales are computed
    over the `in` axis."""
    w_q, scale = _quantize_weight(p["w"])
    out = {"w_q": w_q, "scale": scale}
    if "b" in p:
        out["b"] = p["b"]
    return out


@jax.jit
def _quantize_rows(w):
    """[V, D] -> (int8, f32 [V]) with per-ROW absmax scales."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    w_q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return w_q, scale.squeeze(-1)


def quantize_embedding(p: dict) -> dict:
    """{"w": [V, D]} -> {"w_q": int8 [V, D], "scale": f32 [V]}.

    Per-vocab-ROW scales serve both consumers of a tied embedding table
    (config.tie_word_embeddings, the 3B default): the embedding gather
    dequantizes the few looked-up rows, and the lm-head dot feeds int8 to
    the MXU and applies the scale per logit. The bf16 tied head was the
    single biggest decode-loop HBM stream (622MB = 0.82ms/token profiled —
    XLA hoists any pre-cast out of the loop and streams the full bf16
    table every step)."""
    w_q, scale = _quantize_rows(p["w"])
    return {"w_q": w_q, "scale": scale}


DEFAULT_QUANT_PATTERNS = (
    # the decode-bandwidth hot spots: trunk projections + lm head
    r"text/layers/(attn|mlp)/\w+$",
    r"text/lm_head$",
)

ALL_QUANT_PATTERNS = DEFAULT_QUANT_PATTERNS + (
    # vision towers too (memory-constrained serving)
    r"vision_tower/blocks/(window|full)/(attn|mlp)/\w+$",
    r"vision_tower_aux/stages/\d+/blocks/\d+/(spatial|channel)/(attn|ffn)/(qkv|proj|fc1|fc2)$",
    r"mm_projector(_aux)?/layers/\d+$",
    # the (tied) embedding table — row-quantized, see quantize_embedding
    r"text/embed_tokens$",
)


def quantize_params(params, patterns=DEFAULT_QUANT_PATTERNS):
    """Quantize every linear whose tree path matches one of `patterns`
    (matched against 'a/b/c' joined key paths of the dict holding "w").

    Destructive on matched nodes: the original "w" reference is dropped as
    soon as its int8 replacement materializes, so peak device memory stays
    ~(full model + one layer) instead of 2x the model — the single-chip
    runtime wedges permanently if total allocations ever overshoot its
    physical limit."""
    import jax

    compiled = [re.compile(p) for p in patterns]

    def walk(node, path):
        if isinstance(node, dict):
            if "w" in node and not isinstance(node["w"], dict):
                joined = "/".join(path)
                if any(c.search(joined) for c in compiled) \
                        and node["w"].ndim >= 2:
                    q = (quantize_embedding(node)
                         if joined.endswith("embed_tokens")
                         else quantize_linear(node))
                    jax.block_until_ready(q["w_q"])
                    node.pop("w")  # free the full-precision leaf NOW
                    return q
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, path + (str(i),)) for i, v in enumerate(node)]
        return node

    return walk(params, ())


def quantize_params_w8a8(params, patterns=DEFAULT_QUANT_PATTERNS):
    """int8 weights + dynamic per-token int8 activations (w8a8).

    Marks every int8-quantized linear with an "a8" flag; nn.linear then
    quantizes the activations per row at runtime and runs the int8 x int8
    -> int32 dot, which maps onto the MXU's double-rate int8 path (v5e:
    394 TOPS int8 vs 197 TFLOPS bf16) — the throughput mode for the
    compute-bound encode/prefill stages. This is the closer TPU analog of
    the reference's bitsandbytes load_8bit (model/builder.py:25-27), which
    also runs int8 GEMMs with dynamically quantized activations (LLM.int8,
    minus the fp16 outlier decomposition). The row-quantized embedding /
    tied head is left on its weight-only path (decode is HBM-bound; the
    activation quant would buy nothing there).

    The marker is a (1,) int8 array so the tree survives the safetensors
    round trip used by bench's param cache.
    """
    return mark_w8a8(quantize_params(params, patterns))


def mark_w8a8(q):
    """Add the "a8" activation-quant marker to every int8 LINEAR leaf of an
    already-quantized tree (idempotent). Embeddings are skipped by tree
    path — the same discriminator quantize_params uses — rather than by
    scale-shape coincidence (a square vocab==dim table would fool a shape
    test)."""

    def walk(node, path):
        if isinstance(node, dict):
            if "w_q" in node and node["w_q"].ndim >= 2:
                if not "/".join(path).endswith("embed_tokens"):
                    node = dict(node)
                    # leading dims mirror any stacked-layer axes so the
                    # marker scans alongside the weights ([L, in, out]
                    # trunks slice it to a per-layer (1,))
                    node["a8"] = jnp.ones(
                        node["w_q"].shape[:-2] + (1,), jnp.int8)
                return node
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, path + (str(i),)) for i, v in enumerate(node)]
        return node

    return walk(q, ())


def dequantize_linear(p: dict, dtype=jnp.bfloat16) -> dict:
    out = {"w": (p["w_q"].astype(jnp.float32)
                 * p["scale"][..., None, :]).astype(dtype)}
    if "b" in p:
        out["b"] = p["b"]
    return out


# ------------------------------------------------------------------- int4
# Parity for the reference's load_4bit flag (model/builder.py:28-36,
# bitsandbytes nf4). TPU-native variant: per-output-channel symmetric int4,
# two nibbles packed per int8 byte in HBM (the jnp.int4 dtype trips a
# backend bug on the tunneled chip, and packing is portable anyway).
# Unpacking is two arithmetic shifts on the VPU, fused into the consumer.

@jax.jit
def _quantize_weight_int4(w):
    """[..., in, out] -> (nibble-packed int8 [..., in//2, out], f32 scales).
    `in` must be even (all FO1 linears are). Packing pairs row i with row
    i + in//2 (halves, NOT interleaved): unpacking is then a plain
    concatenation along the contraction axis — or, better, two separate
    dots over the x halves with no data movement at all (the layout the
    Pallas int4 matmul kernel exploits)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(amax / 7.0, 1e-8)
    q = jnp.clip(jnp.round(wf / scale), -8, 7).astype(jnp.int8)
    half = q.shape[-2] // 2
    lo = q[..., :half, :]
    hi = q[..., half:, :]
    packed = jnp.bitwise_or(jnp.bitwise_and(lo, 0x0F),
                            jnp.left_shift(hi, 4)).astype(jnp.int8)
    return packed, scale.squeeze(-2)


def unpack_int4_halves(packed):
    """int8 [..., in//2, out] -> (lo, hi) int8 halves in [-8, 7]: the
    unpacked weight is concat([lo, hi], axis=-2)."""
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)  # sign-extend low
    hi = jnp.right_shift(packed, 4)                      # arithmetic shift
    return lo, hi


def unpack_int4(packed):
    """int8 [..., in//2, out] -> int8 [..., in, out] in [-8, 7]."""
    lo, hi = unpack_int4_halves(packed)
    return jnp.concatenate([lo, hi], axis=-2)


def quantize_linear_int4(p: dict) -> dict:
    w_q4, scale = _quantize_weight_int4(p["w"])
    out = {"w_q4": w_q4, "scale": scale}
    if "b" in p:
        out["b"] = p["b"]
    return out


@jax.jit
def _quantize_weight_int4_outpack(w):
    """[..., in, out] -> (nibble-packed int8 [..., in, out//2], f32 [..., out]
    scales): OUTPUT-axis packing — byte[..., i, n] holds w[..., i, n] in the
    low nibble and w[..., i, n + out//2] in the high one. This is the layout
    the fused MLP kernel needs for its down projection (ops/int4_mlp.py):
    contraction-axis packing would pair intermediate row i with i + in//2,
    which lives in a different grid tile."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(amax / 7.0, 1e-8)
    q = jnp.clip(jnp.round(wf / scale), -8, 7).astype(jnp.int8)
    half = q.shape[-1] // 2
    lo = q[..., :, :half]
    hi = q[..., :, half:]
    packed = jnp.bitwise_or(jnp.bitwise_and(lo, 0x0F),
                            jnp.left_shift(hi, 4)).astype(jnp.int8)
    return packed, scale.squeeze(-2)


def quantize_mlp_int4(mlp: dict) -> dict:
    """SwiGLU MLP params {gate_proj, up_proj, down_proj} (each {"w"}, with
    optional stacked leading layer axes) -> {"fused_int4": {...}} for the
    one-kernel-per-layer decode path (ops/int4_mlp.int4_mlp). Biasless only
    (all Qwen2.5 MLPs are)."""
    assert "b" not in mlp["gate_proj"] and "b" not in mlp["down_proj"]
    gate_pk, gate_s = _quantize_weight_int4(mlp["gate_proj"]["w"])
    up_pk, up_s = _quantize_weight_int4(mlp["up_proj"]["w"])
    down_pk, down_s = _quantize_weight_int4_outpack(mlp["down_proj"]["w"])
    node = {"gate_pk": gate_pk, "gate_s": gate_s, "up_pk": up_pk,
            "up_s": up_s, "down_pk": down_pk, "down_s": down_s}
    jax.block_until_ready(node)
    return {"fused_int4": node}


def quantize_params_int4_mlp(params):
    """The `int4-mlp` hybrid serving mode: trunk MLPs -> fused int4 kernel
    (88% of per-layer decode weight bytes at half stream), everything else
    (attention projections, vision towers, projectors, tied embedding/head)
    -> the int8 paths of quantize_params(ALL_QUANT_PATTERNS). Speed-optimal
    decode; quantization error confined to the MLPs."""
    mlp = params["text"]["layers"]["mlp"]
    # Eligibility must match the kernel's trace-time asserts
    # (int4_mlp_matmul: i_dim % 128 == 0) or an odd intermediate size would
    # quantize fine here and crash on the TPU path; ineligible models fall
    # back to the plain int8 treatment of quantize_params below.
    if mlp["gate_proj"]["w"].shape[-2] % 2 == 0 \
            and mlp["down_proj"]["w"].shape[-1] % 2 == 0 \
            and mlp["gate_proj"]["w"].shape[-1] % 128 == 0:
        params["text"]["layers"]["mlp"] = quantize_mlp_int4(mlp)
    return quantize_params(params, ALL_QUANT_PATTERNS)


def quantize_params_int4(params, patterns=DEFAULT_QUANT_PATTERNS):
    """Like quantize_params but 4-bit; linears with odd `in` dims are left
    in full precision. The (tied) embedding table is row-quantized to int8
    (quantize_embedding): with tie_word_embeddings the lm-head IS the
    embedding, and leaving it bf16 would make the head the dominant decode
    stream (0.62GB/token) — defeating the memory-optimal mode's point."""
    compiled = [re.compile(p) for p in patterns]

    def walk(node, path):
        if isinstance(node, dict):
            if "w" in node and not isinstance(node["w"], dict):
                joined = "/".join(path)
                if any(c.search(joined) for c in compiled) \
                        and node["w"].ndim >= 2 \
                        and node["w"].shape[-2] % 2 == 0:
                    q = quantize_linear_int4(node)
                    jax.block_until_ready(q["w_q4"])
                    node.pop("w")
                    return q
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, path + (str(i),)) for i, v in enumerate(node)]
        return node

    out = walk(params, ())
    emb = out.get("text", {}).get("embed_tokens") if isinstance(out, dict) \
        else None
    if isinstance(emb, dict) and "w" in emb and emb["w"].ndim == 2:
        out["text"]["embed_tokens"] = quantize_embedding(emb)
    return out
