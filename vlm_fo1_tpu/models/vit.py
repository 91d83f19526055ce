"""Qwen2.5-VL vision transformer, TPU-native.

Design notes vs the reference (modeling_qwen2_5_vl.py:404-563):
- Tokens live in a *padded window layout* [B, P, D] where P = num_windows *
  window_tokens (see preprocess/windowing.py). Window attention is a dense
  batched attention over [B*W, 64, D] tiles; the 4 full-attention blocks run
  over the whole padded sequence with a validity mask. No varlen kernels, no
  dynamic shapes — XLA sees the same static program for every image of a
  given grid geometry.
- The reference's feature GATHER monkey-patch (qwen2_5_vl_encoder.py:9-171)
  becomes a pure multi-output: hidden states at the full-attention blocks are
  returned functionally.
- patch_embed is a plain [patch_dim -> D] matmul (the reference's Conv3d with
  stride == kernel collapses to exactly this).

Numerics parity: RMSNorm stats and rotary application in fp32, softmax in
fp32 (reference :135-140, :219-230, :275).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vlm_fo1_tpu import nn
from vlm_fo1_tpu.config import ViTConfig


def vit_group_structure(cfg: ViTConfig) -> tuple[int, int]:
    """(num_groups, window_blocks_per_group) for the scanned layout.

    Requires the full-attention blocks to be evenly spaced at the end of each
    group — true for every released Qwen2.5-VL geometry
    (fullatt_block_indexes [7, 15, 23, 31] over depth 32)."""
    g = len(cfg.fullatt_block_indexes)
    period = cfg.depth // g
    expected = tuple(period * (i + 1) - 1 for i in range(g))
    if tuple(cfg.fullatt_block_indexes) != expected or period * g != cfg.depth:
        raise NotImplementedError(
            "vit scan layout needs evenly spaced full-attention blocks; got "
            f"{cfg.fullatt_block_indexes} for depth {cfg.depth}")
    return g, period - 1


def _block_init(key, cfg: ViTConfig, dtype):
    d = cfg.hidden_size
    k = jax.random.split(key, 5)
    return {
        "norm1": nn.rms_norm_init(d, dtype),
        "norm2": nn.rms_norm_init(d, dtype),
        "attn": {
            "qkv": nn.linear_init(k[0], d, 3 * d, dtype=dtype),
            "proj": nn.linear_init(k[1], d, d, dtype=dtype),
        },
        "mlp": {
            "gate_proj": nn.linear_init(k[2], d, cfg.intermediate_size, dtype=dtype),
            "up_proj": nn.linear_init(k[3], d, cfg.intermediate_size, dtype=dtype),
            "down_proj": nn.linear_init(k[4], cfg.intermediate_size, d, dtype=dtype),
        },
    }


def stack_vit_blocks(blocks: list[dict], cfg: ViTConfig) -> dict:
    """Depth-ordered block list -> {"window": [G, W, ...], "full": [G, ...]}
    stacked pytrees for the two-level scan."""
    g, wpg = vit_group_structure(cfg)
    period = wpg + 1
    window_groups = []
    full_blocks = []
    for gi in range(g):
        grp = blocks[gi * period:(gi + 1) * period]
        window_groups.append(jax.tree.map(lambda *xs: jnp.stack(xs), *grp[:-1])
                             if wpg > 0 else {})
        full_blocks.append(grp[-1])
    out = {"full": jax.tree.map(lambda *xs: jnp.stack(xs), *full_blocks)}
    if wpg > 0:
        out["window"] = jax.tree.map(lambda *xs: jnp.stack(xs), *window_groups)
    return out


def init_vit_params(key, cfg: ViTConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, cfg.depth + 2)
    d = cfg.hidden_size
    blocks = [_block_init(keys[i], cfg, dtype) for i in range(cfg.depth)]
    km = jax.random.split(keys[-1], 2)
    merged_dim = d * cfg.spatial_merge_unit
    return {
        "patch_embed": {"proj": nn.linear_init(keys[-2], cfg.patch_dim, d,
                                               bias=False, dtype=dtype)},
        "blocks": stack_vit_blocks(blocks, cfg),
        "merger": {
            "ln_q": nn.rms_norm_init(d, dtype),
            "fc1": nn.linear_init(km[0], merged_dim, merged_dim, dtype=dtype),
            "fc2": nn.linear_init(km[1], merged_dim, cfg.out_hidden_size, dtype=dtype),
        },
    }


def _apply_rotary(x, cos, sin):
    """rotate-half rotary in x's dtype. x: [..., H, hd]; cos/sin (fp32
    tables) broadcastable to x's shape with the head axis dropped (e.g.
    [P, hd] against [B, P, H, hd], or [1, W, T, hd] against
    [B, W, T, H, hd]).

    The angle tables are always computed in fp32; only the final
    multiply-add runs in x.dtype. In fp32 (the parity tests) this is
    bit-identical to the reference's upcast-to-fp32 rotary
    (modeling_qwen2_5_vl.py:162-169); in bf16 serving it keeps the whole
    q/k path in bf16 — profiled on v5e, the fp32 rotate-half materialized
    ~25ms/batch of HBM traffic per encode and forced the attention-logit
    matmuls onto the 8x-slower fp32 MXU path."""
    half = x.shape[-1] // 2
    rot = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
    return (x * cos[..., None, :].astype(x.dtype)
            + rot * sin[..., None, :].astype(x.dtype))


# full attention switches to the Pallas flash kernel above this sequence
# length (dense [P, P] logits for a 2048px image would need ~30GB; even at
# ~1.3k tokens the fused kernel beats the materialized fp32 logits path)
FLASH_FULL_ATTN_THRESHOLD = 1024


def _window_attention(p, x, cos, sin, mask, num_heads, num_windows):
    """Attention within windows. x: flat [B, P, D] (the padded layout is
    window-major by construction, so the [B, W, T, ...] view is a free
    reshape); cos/sin: [W, T, hd]; mask: [W, T, T] (True = attend).

    The dense projections run on the FLAT layout: one [B*P, D] matmul per
    projection instead of a [B, W, ...] batched matmul with M=T rows per
    batch element, which the profile showed running at a few percent of
    MXU rate (tiny M, weight re-streamed per window)."""
    b, pad, d = x.shape
    hd = d // num_heads
    w, t = num_windows, pad // num_windows
    # static minor-dim slices of the fused qkv output: splitting [.., 3D]
    # into three [.., H, hd] views is layout-free, unlike reshaping to
    # [.., 3, H, hd] which interleaves the 3-axis above heads and forced a
    # materialized relayout per block in the profiled HLO
    qkv = nn.linear(p["qkv"], x)
    q = qkv[..., :d].reshape(b, w, t, num_heads, hd)
    k = qkv[..., d:2 * d].reshape(b, w, t, num_heads, hd)
    v = qkv[..., 2 * d:].reshape(b, w, t, num_heads, hd)
    q = _apply_rotary(q, cos[None], sin[None])
    k = _apply_rotary(k, cos[None], sin[None])

    logits = jnp.einsum("bwqnh,bwknh->bwnqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * (1.0 / jnp.sqrt(jnp.float32(hd)))
    logits = jnp.where(mask[None, :, None], logits,
                       jnp.finfo(jnp.float32).min)
    # bf16 logit storage, f32 softmax internals (see nn.sdpa)
    logits = logits.astype(x.dtype)
    probs = jax.nn.softmax(logits.astype(jnp.float32),
                           axis=-1).astype(x.dtype)
    out = jnp.einsum("bwnqk,bwknh->bwqnh", probs, v).reshape(b, pad, d)
    return nn.linear(p["proj"], out)


def _full_attention(p, x, cos, sin, mask, num_heads, *, kv_valid=None):
    """Full attention over the whole padded sequence. x: [B, P, D];
    cos/sin: [P, hd]; mask: [1, 1, P, P]."""
    b, pad, d = x.shape
    hd = d // num_heads
    qkv = nn.linear(p["qkv"], x)
    q = qkv[..., :d].reshape(b, pad, num_heads, hd)
    k = qkv[..., d:2 * d].reshape(b, pad, num_heads, hd)
    v = qkv[..., 2 * d:].reshape(b, pad, num_heads, hd)
    q = _apply_rotary(q, cos, sin)
    k = _apply_rotary(k, cos, sin)

    if (pad >= FLASH_FULL_ATTN_THRESHOLD
            and jax.default_backend() == "tpu"):
        from vlm_fo1_tpu.ops.flash_attention import flash_attention

        out = flash_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), kv_valid=kv_valid)
        out = out.transpose(0, 2, 1, 3).reshape(b, pad, d)
    else:
        out = nn.sdpa(q, k, v, mask=mask).reshape(b, pad, d)
    return nn.linear(p["proj"], out)


def _mlp(p, x, act):
    return nn.linear(p["down_proj"],
                     act(nn.linear(p["gate_proj"], x)) * nn.linear(p["up_proj"], x))


def vit_forward(
    params: dict,
    cfg: ViTConfig,
    patches: jnp.ndarray,       # [B, P, patch_dim] padded-window layout
    rot_cos: jnp.ndarray,       # [P, head_dim]
    rot_sin: jnp.ndarray,       # [P, head_dim]
    valid: jnp.ndarray,         # [P] bool
    *,
    num_windows: int,
    inv_unit_idx: jnp.ndarray,  # [U] padded-unit slot per original merge unit
    capture_multi_level: bool = True,
    remat: bool = False,
):
    """Returns:
        tokens: [B, U, out_hidden] merged vision tokens in original order
        captures: [G, B, P, D] hidden states at the full-attention blocks
            (padded window order; G == len(fullatt_block_indexes)).

    remat=True checkpoints each scanned window block (training-memory
    analog of the reference's gradient-checkpointing hooks,
    qwen2_5_vl_encoder.py:141-144); full-attention blocks stay stored —
    their outputs are the multi-level captures anyway.
    """
    b, pad, _ = patches.shape
    act = nn.ACT[cfg.hidden_act]
    x = nn.linear(params["patch_embed"]["proj"], patches)

    wt = pad // num_windows
    valid_w = valid.reshape(num_windows, wt)
    win_mask = valid_w[:, :, None] & valid_w[:, None, :]   # [W, T, T]
    full_mask = (valid[None, None, :, None] & valid[None, None, None, :])
    cos_w = rot_cos.reshape(num_windows, wt, -1)
    sin_w = rot_sin.reshape(num_windows, wt, -1)

    def run_window_block(blk, x):
        attn_out = _window_attention(
            blk["attn"], nn.rms_norm(blk["norm1"], x), cos_w, sin_w,
            win_mask, cfg.num_heads, num_windows)
        x = x + attn_out
        return x + _mlp(blk["mlp"], nn.rms_norm(blk["norm2"], x), act)

    def run_full_block(blk, x):
        attn_out = _full_attention(
            blk["attn"], nn.rms_norm(blk["norm1"], x), rot_cos, rot_sin,
            full_mask, cfg.num_heads, kv_valid=valid)
        x = x + attn_out
        return x + _mlp(blk["mlp"], nn.rms_norm(blk["norm2"], x), act)

    # two-level scan over the periodic (window* , full) group structure:
    # one traced window block + one traced full block regardless of depth.
    # Both block kinds carry flat [B, P, D]; the window view is a free
    # reshape inside the attention einsum (the padded layout is
    # window-major), so the dense projections always see one large-M
    # matmul.
    _, wpg = vit_group_structure(cfg)

    def group_body(x, gp):
        if wpg > 0:
            def win_body(x, wp):
                return run_window_block(wp, x), None

            if remat:
                win_body = jax.checkpoint(win_body)
            x, _ = jax.lax.scan(win_body, x, gp["window"])
        x = run_full_block(gp["full"], x)
        return x, x

    x, captures = jax.lax.scan(group_body, x, params["blocks"])
    # captures: [G, B, P, D] hidden states at the full-attention blocks

    # patch merger: fold each merge unit's 4 tokens into one vision token
    m = params["merger"]
    y = nn.rms_norm(m["ln_q"], x, eps=1e-6)
    y = y.reshape(b, pad // cfg.spatial_merge_unit, -1)
    y = nn.linear(m["fc2"], jax.nn.gelu(nn.linear(m["fc1"], y), approximate=False))
    tokens = jnp.take(y, inv_unit_idx, axis=1)  # drop pads, original order
    return tokens, captures


def captures_to_feature_map(
    captures,
    inv_token_idx: jnp.ndarray,
    grid_thw: tuple[int, int, int],
    merge_size: int = 2,
) -> jnp.ndarray:
    """Convert captured hidden states to a channel-last feature map.

    Equivalent to the reference's VisionFeaturesGather.extract_multi_level_features
    (qwen2_5_vl_encoder.py:37-80) which un-permutes the window order and emits
    4 maps [1, D, gh, gw]; we return one concatenated [B, gh, gw, 4D] map
    (the HFRE concatenates them channel-wise anyway, hybrid...:259-261).

    captures: [G, B, P, D] stacked (or a list of [B, P, D]).
    """
    t, gh, gw = grid_thw
    if isinstance(captures, (list, tuple)):
        x = jnp.concatenate(list(captures), axis=-1)
    else:
        x = captures.transpose(1, 2, 0, 3).reshape(
            captures.shape[1], captures.shape[2], -1)  # [B, P, G*D]
    x = jnp.take(x, inv_token_idx, axis=1)          # [B, S, 4D] original order
    b, s, c = x.shape
    m = merge_size
    # token order is (h_block, w_block, merge_h, merge_w) per frame
    x = x.reshape(b, t, gh // m, gw // m, m, m, c)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)            # [B, t, gh/m, m, gw/m, m, C]
    return x.reshape(b, t * gh, gw, c)
