"""DaViT dual-attention vision encoder (aux perception tower), TPU-native.

Functional re-implementation of the Florence-2-style DaViT
(reference vlm_fo1/model/multimodal_encoder/davit/modeling_davit.py):
4 stages of [ConvEmbed -> depth_i x (SpatialBlock, ChannelBlock)]. The aux
branch always sees a fixed square input (768x768 squash), so every shape in
this network is static — ideal for XLA.

Layout: activations are channel-last [B, H, W, C] (TPU-friendly); checkpoint
convs stay OIHW (see checkpoint.convert_davit). Attention windows (12x12) and
channel groups are dense batched einsums on the MXU. Inference has no
DropPath (rate only affects training; the reference keeps eval identity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vlm_fo1_tpu import nn
from vlm_fo1_tpu.config import DaViTConfig


# --------------------------------------------------------------- params

def _prenorm_block_init(key, dim, heads_or_groups, mlp_ratio, dtype):
    k = jax.random.split(key, 6)
    hidden = int(dim * mlp_ratio)
    return {
        "conv1": {"dw": nn.conv2d_init(k[0], dim, dim, 3, groups=dim, dtype=dtype)},
        "attn": {
            "norm": nn.layer_norm_init(dim, dtype),
            "qkv": nn.linear_init(k[1], dim, dim * 3, dtype=dtype),
            "proj": nn.linear_init(k[2], dim, dim, dtype=dtype),
        },
        "conv2": {"dw": nn.conv2d_init(k[3], dim, dim, 3, groups=dim, dtype=dtype)},
        "ffn": {
            "norm": nn.layer_norm_init(dim, dtype),
            "fc1": nn.linear_init(k[4], dim, hidden, dtype=dtype),
            "fc2": nn.linear_init(k[5], hidden, dim, dtype=dtype),
        },
    }


def init_davit_params(key, cfg: DaViTConfig, dtype=jnp.float32) -> dict:
    stages = []
    keys = jax.random.split(key, cfg.num_stages)
    for i in range(cfg.num_stages):
        in_ch = cfg.in_channels if i == 0 else cfg.embed_dims[i - 1]
        dim = cfg.embed_dims[i]
        ks = jax.random.split(keys[i], cfg.depths[i] * 2 + 1)
        conv = {"proj": nn.conv2d_init(ks[0], in_ch, dim, cfg.patch_size[i],
                                       dtype=dtype)}
        # reference ConvEmbed: prenorm stages norm input channels, stage 0
        # norms the embedding
        conv["norm"] = nn.layer_norm_init(
            in_ch if cfg.patch_prenorm[i] else dim, dtype)
        blocks = []
        for j in range(cfg.depths[i]):
            blocks.append({
                "spatial": _prenorm_block_init(
                    ks[1 + 2 * j], dim, cfg.num_heads[i], cfg.mlp_ratio, dtype),
                "channel": _prenorm_block_init(
                    ks[2 + 2 * j], dim, cfg.num_groups[i], cfg.mlp_ratio, dtype),
            })
        stages.append({"conv": conv, "blocks": blocks})
    return {"stages": stages}


# --------------------------------------------------------------- pieces

def _conv_nhwc(p, x, stride=1, padding=0, groups=1):
    """NHWC conv with the checkpoint's OIHW kernel."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    kh, kw = p["w"].shape[-2:]
    if (groups == x.shape[-1] and groups == p["w"].shape[0]
            and stride == (1, 1)):
        # depthwise k x k: XLA's grouped-conv lowering runs ~50x below the
        # VPU/bandwidth floor on TPU (profiled 0.8ms for the 40-MFLOP 3x3 at
        # 48^2 x 1024 — tools/xp_davit_micro.py). Formulate as k^2 shifted
        # multiply-adds instead: pure elementwise work XLA fuses into ONE
        # pass over the map, accumulating in f32 like the conv path.
        (pt, pb), (pl, pr) = padding
        b, h, wd, c = x.shape
        xp = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
        oh = h + pt + pb - kh + 1
        ow = wd + pl + pr - kw + 1
        wf = p["w"].astype(jnp.float32)  # [C, 1, kh, kw]
        acc = jnp.zeros((b, oh, ow, c), jnp.float32)
        for di in range(kh):
            for dj in range(kw):
                acc = acc + (xp[:, di:di + oh, dj:dj + ow, :]
                             .astype(jnp.float32) * wf[:, 0, di, dj])
        y = acc.astype(x.dtype)
    elif groups == 1 and x.shape[-1] <= 16 and (kh > 1 or kw > 1):
        # few-input-channel stem conv (the RGB 7x7/s4): TPU convs with a
        # 3-deep input channel dim run an order of magnitude below MXU rate
        # (profiled ~5 TFLOP/s); extract the patches explicitly and do one
        # dense [*, C*kh*kw] @ [C*kh*kw, O] matmul instead. Patch features
        # are ordered (C, kh, kw) — exactly the flattened OIHW kernel.
        pat = jax.lax.conv_general_dilated_patches(
            x, (kh, kw), window_strides=stride, padding=padding,
            dimension_numbers=("NHWC", "OIHW", "NHWC"))
        w2 = p["w"].reshape(p["w"].shape[0], -1).T.astype(x.dtype)
        y = jnp.einsum("bhwk,ko->bhwo", pat, w2,
                       preferred_element_type=jnp.float32).astype(x.dtype)
    else:
        y = jax.lax.conv_general_dilated(
            x, p["w"], window_strides=stride, padding=padding,
            dimension_numbers=("NHWC", "OIHW", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def _depthwise_residual(p, x):
    c = x.shape[-1]
    return x + _conv_nhwc(p["dw"], x, stride=1, padding=1, groups=c)


def _ffn_residual(p, x):
    y = nn.layer_norm(p["norm"], x)
    y = nn.linear(p["fc2"], jax.nn.gelu(nn.linear(p["fc1"], y), approximate=False))
    return x + y


def _window_attention(p, x, num_heads, window):
    """Non-shifted 12x12 window MSA (reference modeling_davit.py:225-282)."""
    b, h, w, c = x.shape
    ph = (window - h % window) % window
    pw = (window - w % window) % window
    if ph or pw:
        x_p = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    else:
        x_p = x
    hp, wp = h + ph, w + pw
    nh, nw = hp // window, wp // window

    y = nn.layer_norm(p["norm"], x_p)
    y = y.reshape(b, nh, window, nw, window, c).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(b * nh * nw, window * window, c)
    hd = c // num_heads
    # static minor-dim slices instead of a [.., 3, H, hd] reshape: the
    # interleaved 3-axis forced a materialized relayout per block (see the
    # identical fix in vit._window_attention)
    qkv = nn.linear(p["qkv"], y)
    wt = window * window
    q = qkv[..., :c].reshape(-1, wt, num_heads, hd)
    k = qkv[..., c:2 * c].reshape(-1, wt, num_heads, hd)
    v = qkv[..., 2 * c:].reshape(-1, wt, num_heads, hd)
    out = nn.sdpa(q, k, v)
    out = nn.linear(p["proj"], out.reshape(y.shape[0], y.shape[1], c))
    out = out.reshape(b, nh, nw, window, window, c).transpose(0, 1, 3, 2, 4, 5)
    out = out.reshape(b, hp, wp, c)[:, :h, :w]
    # NOTE: parity quirk — the reference computes attention on padded windows
    # without masking the zero-pad tokens (modeling_davit.py:248-268); padding
    # here is likewise unmasked, intentionally.
    return x + out


def _channel_attention(p, x, groups):
    """Channel-group attention (reference modeling_davit.py:151-172):
    attention over the channel dim with 1/sqrt(N) scaling."""
    b, h, w, c = x.shape
    n = h * w
    y = nn.layer_norm(p["norm"], x).reshape(b, n, c)
    gd = c // groups
    qkv = nn.linear(p["qkv"], y)
    q = qkv[..., :c].reshape(b, n, groups, gd)
    k = qkv[..., c:2 * c].reshape(b, n, groups, gd)
    v = qkv[..., 2 * c:].reshape(b, n, groups, gd)
    q = q * (float(n) ** -0.5)
    attn = jnp.einsum("bngc,bngd->bgcd", q, k,
                      preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bgcd,bngd->bngc", attn, v).reshape(b, n, c)
    out = nn.linear(p["proj"], out)
    return x + out.reshape(b, h, w, c)


def _conv_embed(p, x, cfg: DaViTConfig, stage: int):
    """Patch embedding conv with pre/post LayerNorm placement matching the
    reference ConvEmbed (modeling_davit.py:102-148)."""
    if cfg.patch_prenorm[stage]:
        x = nn.layer_norm(p["norm"], x)
    x = _conv_nhwc(p["proj"], x, stride=cfg.patch_stride[stage],
                   padding=cfg.patch_padding[stage])
    if not cfg.patch_prenorm[stage]:
        x = nn.layer_norm(p["norm"], x)
    return x


# --------------------------------------------------------------- forward

def davit_forward(params: dict, cfg: DaViTConfig, images: jnp.ndarray):
    """images: [B, H, W, 3] channel-last.

    Returns a list of 4 stage feature maps, each [B, H_i, W_i, C_i]
    (reference forward_features returns the same maps in NCHW,
    modeling_davit.py:478-506).
    """
    x = images
    outs = []
    for i, stage in enumerate(params["stages"]):
        x = _conv_embed(stage["conv"], x, cfg, i)
        for blk in stage["blocks"]:
            sp = blk["spatial"]
            x = _depthwise_residual(sp["conv1"], x)
            x = _window_attention(sp["attn"], x, cfg.num_heads[i], cfg.window_size)
            x = _depthwise_residual(sp["conv2"], x)
            x = _ffn_residual(sp["ffn"], x)
            ch = blk["channel"]
            x = _depthwise_residual(ch["conv1"], x)
            x = _channel_attention(ch["attn"], x, cfg.num_groups[i])
            x = _depthwise_residual(ch["conv2"], x)
            x = _ffn_residual(ch["ffn"], x)
        outs.append(x)
    return outs
