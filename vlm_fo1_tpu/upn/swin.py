"""Swin transformer backbone for UPN, TPU-native.

Functional re-implementation of the reference Swin-L
(detect_tools/upn/models/backbone/swin.py): 4-stage hierarchy of
(shifted-)window attention blocks with relative position bias, patch merging
between stages, per-output-stage LayerNorms. swin_L_384_22k geometry: embed
192, depths (2,2,18,2), heads (6,12,24,48), window 12
(wrapper.py:239-297).

TPU notes: activations are [B, H, W, C]; every (H, W) is static under jit
(the wrapper pads images to a stride bucket), so the shifted-window attention
masks are precomputed host-side per geometry. Window partition / cyclic shift
are reshapes + rolls that XLA folds into the attention einsums.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from vlm_fo1_tpu import nn


@dataclass(frozen=True)
class SwinConfig:
    embed_dim: int = 192
    depths: tuple[int, ...] = (2, 2, 18, 2)
    num_heads: tuple[int, ...] = (6, 12, 24, 48)
    window_size: int = 12
    patch_size: int = 4
    mlp_ratio: float = 4.0
    in_channels: int = 3
    out_indices: tuple[int, ...] = (0, 1, 2, 3)

    @property
    def num_features(self) -> tuple[int, ...]:
        return tuple(self.embed_dim * 2**i for i in range(len(self.depths)))


def swin_large_config() -> SwinConfig:
    return SwinConfig()


def init_swin_params(key, cfg: SwinConfig, dtype=jnp.float32) -> dict:
    ws = cfg.window_size
    stages = []
    keys = jax.random.split(key, len(cfg.depths) + 1)
    for i, depth in enumerate(cfg.depths):
        dim = cfg.embed_dim * 2**i
        ks = jax.random.split(keys[i], depth * 5 + 1)
        blocks = []
        for j in range(depth):
            kk = ks[j * 5:(j + 1) * 5]
            blocks.append({
                "norm1": nn.layer_norm_init(dim, dtype),
                "norm2": nn.layer_norm_init(dim, dtype),
                "attn": {
                    "qkv": nn.linear_init(kk[0], dim, dim * 3, dtype=dtype),
                    "proj": nn.linear_init(kk[1], dim, dim, dtype=dtype),
                    "rel_bias": (jax.random.normal(
                        kk[2], ((2 * ws - 1) ** 2, cfg.num_heads[i])) * 0.02
                    ).astype(dtype),
                },
                "mlp": {
                    "fc1": nn.linear_init(kk[3], dim, int(dim * cfg.mlp_ratio),
                                          dtype=dtype),
                    "fc2": nn.linear_init(kk[4], int(dim * cfg.mlp_ratio), dim,
                                          dtype=dtype),
                },
            })
        stage = {"blocks": blocks}
        if i < len(cfg.depths) - 1:
            stage["downsample"] = {
                "norm": nn.layer_norm_init(4 * dim, dtype),
                "reduction": nn.linear_init(ks[-1], 4 * dim, 2 * dim,
                                            bias=False, dtype=dtype),
            }
        stages.append(stage)
    out_norms = {str(i): nn.layer_norm_init(cfg.num_features[i], dtype)
                 for i in cfg.out_indices}
    return {
        "patch_embed": {
            "proj": nn.conv2d_init(keys[-1], cfg.in_channels, cfg.embed_dim,
                                   cfg.patch_size, dtype=dtype),
            "norm": nn.layer_norm_init(cfg.embed_dim, dtype),
        },
        "stages": stages,
        "out_norms": out_norms,
    }


def relative_position_index(ws: int) -> np.ndarray:
    """[ws*ws, ws*ws] index into the (2ws-1)^2 relative bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def shifted_window_mask(hp: int, wp: int, ws: int, shift: int) -> np.ndarray:
    """Additive (0 / -100) attention mask per window for SW-MSA, computed on
    the host from the static padded geometry."""
    img = np.zeros((hp, wp), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for vs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, vs] = cnt
            cnt += 1
    win = img.reshape(hp // ws, ws, wp // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


def _window_attention(p, x, num_heads, ws, rel_idx, attn_mask=None):
    """x: [B, Hp, Wp, C] (already padded to window multiples)."""
    b, hp, wp, c = x.shape
    nh, nw = hp // ws, wp // ws
    hd = c // num_heads
    y = x.reshape(b, nh, ws, nw, ws, c).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(b * nh * nw, ws * ws, c)
    qkv = nn.linear(p["qkv"], y).reshape(-1, ws * ws, 3, num_heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

    scale = hd ** -0.5
    acc_dt = jnp.promote_types(x.dtype, jnp.float32)
    logits = jnp.einsum("wqhd,wkhd->whqk", q * scale, k,
                        preferred_element_type=acc_dt)
    bias = p["rel_bias"][rel_idx]                     # [ws*ws, ws*ws, H]
    logits = logits + bias.transpose(2, 0, 1)[None].astype(acc_dt)
    if attn_mask is not None:
        # attn_mask: [num_windows, ws*ws, ws*ws], tile over batch
        logits = logits.reshape(b, nh * nw, num_heads, ws * ws, ws * ws)
        logits = logits + attn_mask[None, :, None]
        logits = logits.reshape(b * nh * nw, num_heads, ws * ws, ws * ws)
    probs = jax.nn.softmax(logits, -1).astype(x.dtype)
    out = jnp.einsum("whqk,wkhd->wqhd", probs, v).reshape(-1, ws * ws, c)
    out = nn.linear(p["proj"], out)
    out = out.reshape(b, nh, nw, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(b, hp, wp, c)


def _block(p, x, num_heads, ws, shift, rel_idx, sw_mask):
    b, h, w, c = x.shape
    shortcut = x
    y = nn.layer_norm(p["norm1"], x)
    ph = (ws - h % ws) % ws
    pw = (ws - w % ws) % ws
    if ph or pw:
        y = jnp.pad(y, ((0, 0), (0, ph), (0, pw), (0, 0)))
    if shift > 0:
        y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
    y = _window_attention(p["attn"], y, num_heads, ws, rel_idx,
                          sw_mask if shift > 0 else None)
    if shift > 0:
        y = jnp.roll(y, (shift, shift), axis=(1, 2))
    y = y[:, :h, :w]
    x = shortcut + y
    y = nn.layer_norm(p["norm2"], x)
    y = nn.linear(p["mlp"]["fc2"],
                  jax.nn.gelu(nn.linear(p["mlp"]["fc1"], y), approximate=False))
    return x + y


def _patch_merge(p, x):
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        h, w = x.shape[1:3]
    # concat order matches the reference (x0=even/even, x1=odd/even, ...)
    y = jnp.concatenate([
        x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2],
    ], axis=-1)
    y = nn.layer_norm(p["norm"], y)
    return nn.linear(p["reduction"], y)


def swin_forward(params: dict, cfg: SwinConfig, images: jnp.ndarray):
    """images: [B, H, W, 3] (H, W multiples of patch_size).

    Returns list of per-stage channel-last maps [B, H_i, W_i, C_i] for
    out_indices, each LayerNormed (reference forward_raw).
    """
    ws = cfg.window_size
    rel_idx = jnp.asarray(relative_position_index(ws))
    x = nn.conv2d(  # NCHW conv matches checkpoint kernel layout
        params["patch_embed"]["proj"], images.transpose(0, 3, 1, 2),
        stride=cfg.patch_size)
    x = x.transpose(0, 2, 3, 1)
    x = nn.layer_norm(params["patch_embed"]["norm"], x)

    outs = []
    for i, stage in enumerate(params["stages"]):
        h, w = x.shape[1:3]
        hp = -(-h // ws) * ws
        wp = -(-w // ws) * ws
        sw_mask = jnp.asarray(shifted_window_mask(hp, wp, ws, ws // 2))
        for j, blk in enumerate(stage["blocks"]):
            shift = 0 if j % 2 == 0 else ws // 2
            x = _block(blk, x, cfg.num_heads[i], ws, shift, rel_idx, sw_mask)
        if i in cfg.out_indices:
            outs.append(nn.layer_norm(params["out_norms"][str(i)], x))
        if "downsample" in stage:
            x = _patch_merge(stage["downsample"], x)
    return outs
