"""Multimodal projectors (reference multimodal_projector/builder.py:39-115).

The released FO1 checkpoint uses `mlpNx_gelu` stacks (Sequential of Linear /
GELU); `linear` and `identity` are also supported, plus the two resampling
variants from the reference builder:

- CAbstractor ("cabstract", builder.py:44-56 / honeybee.py:37-127): learned
  pos-emb + RegNet-style bottleneck stage -> adaptive avg-pool to a
  sqrt(n_query) grid -> second stage -> SiLU-MLP readout. The conv blocks
  follow the timm RegStage Bottleneck recipe the reference instantiates
  (1x1 -> LN2d -> SiLU -> 3x3 depthwise -> LN2d -> SiLU -> SE(rd=0.25*in)
  -> 1x1 -> LN2d, residual add, SiLU) with stride 1.
- TokenPacker ("tokenpacker", builder.py:117-217): downsample queries by
  bilinear-resizing the single-level map, project multi-level features to
  keys/values with 2-layer GELU MLPs, then one cross-attention step where
  each query attends only to its scale_factor x scale_factor local window
  (torch nn.MultiheadAttention semantics: internal in/out projections),
  followed by a 2-layer GELU MLP readout.

TPU notes: adaptive average pooling is computed from a zero-padded 2D
cumulative sum with static gather indices (exact for any input/output grid,
no dynamic shapes); TokenPacker's window grouping is a pure reshape/transpose
so the attention runs as one dense batched [B*g*g, 1, sf*sf] MHA.
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp

from vlm_fo1_tpu import nn


def init_projector_params(key, projector_type: str, in_dim: int, out_dim: int,
                          dtype=jnp.float32, **kw) -> dict:
    if projector_type == "identity":
        return {}
    if projector_type == "linear":
        return {"layers": [nn.linear_init(key, in_dim, out_dim, dtype=dtype)]}
    if projector_type == "cabstract":
        # reference defaults: n_query 144, vokens (image_size/14)^2 with
        # image_size 336 (builder.py:44-56)
        return init_cabstractor_params(
            key, kw.get("num_input_tokens", 576), in_dim, out_dim,
            num_queries=kw.get("num_queries", 144), dtype=dtype)
    if projector_type == "tokenpacker":
        return init_tokenpacker_params(key, in_dim, out_dim, dtype=dtype)
    m = re.match(r"^mlp(\d+)x_gelu$", projector_type)
    if m:
        depth = int(m.group(1))
        keys = jax.random.split(key, depth)
        layers = [nn.linear_init(keys[0], in_dim, out_dim, dtype=dtype)]
        for i in range(1, depth):
            layers.append(nn.linear_init(keys[i], out_dim, out_dim, dtype=dtype))
        return {"layers": layers}
    raise ValueError(f"unknown projector type: {projector_type}")


def projector_forward(params: dict, projector_type: str, x, **kw):
    if projector_type == "identity":
        return x
    if projector_type == "cabstract":
        return cabstractor_forward(params, x,
                                   num_queries=kw.get("num_queries", 144))
    if projector_type == "tokenpacker":
        # reference forward takes [single_level, multi_level] (builder.py:187)
        x_single, x_multi = x
        return tokenpacker_forward(params, x_single, x_multi,
                                   raw_grid=kw["raw_grid"],
                                   scale_factor=kw.get("scale_factor", 2))
    layers = params["layers"]
    y = nn.linear(layers[0], x)
    for lp in layers[1:]:
        y = nn.linear(lp, jax.nn.gelu(y, approximate=False))
    return y


def convert_projector_params(sd: dict, projector_type: str) -> dict:
    """HF Sequential state dict ('0.weight', '2.weight', ...) -> pytree."""
    import numpy as np

    if projector_type == "identity":
        return {}
    if projector_type == "linear":
        p = {"w": np.ascontiguousarray(np.asarray(sd["weight"]).T)}
        if "bias" in sd:
            p["b"] = np.asarray(sd["bias"])
        return {"layers": [p]}
    if re.match(r"^mlp(\d+)x_gelu$", projector_type):
        idxs = sorted({int(k.split(".")[0]) for k in sd if k[0].isdigit()})
        layers = []
        for i in idxs:
            p = {"w": np.ascontiguousarray(np.asarray(sd[f"{i}.weight"]).T)}
            if f"{i}.bias" in sd:
                p["b"] = np.asarray(sd[f"{i}.bias"])
            layers.append(p)
        return {"layers": layers}
    if projector_type == "tokenpacker":
        return _convert_tokenpacker(sd)
    if projector_type == "cabstract":
        return _convert_cabstractor(sd)
    raise ValueError(f"unknown projector type: {projector_type}")


def _lin_t(sd, prefix):
    """torch Linear/Conv 'prefix.weight/.bias' -> {'w','b'} (weight.T for
    2D Linear, OIHW kept as-is for conv handled by caller)."""
    import numpy as np

    p = {"w": np.ascontiguousarray(np.asarray(sd[f"{prefix}.weight"]).T)}
    if f"{prefix}.bias" in sd:
        p["b"] = np.asarray(sd[f"{prefix}.bias"])
    return p


def _norm_t(sd, prefix):
    import numpy as np

    return {"scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _convert_tokenpacker(sd: dict) -> dict:
    """Reference TokenPacker state dict (builder.py:117-164): q/k/v pre-
    projections, LayerNorms, torch MultiheadAttention (packed in_proj_weight
    [3E, E] + out_proj) and the readout MLP."""
    import numpy as np

    inw = np.asarray(sd["clip_attn.in_proj_weight"])
    inb = np.asarray(sd.get("clip_attn.in_proj_bias",
                            np.zeros(inw.shape[0], inw.dtype)))
    e = inw.shape[0] // 3

    def packed(i):
        return {"w": np.ascontiguousarray(inw[i * e:(i + 1) * e].T),
                "b": inb[i * e:(i + 1) * e]}

    return {
        "q_proj": _lin_t(sd, "q_proj_1"),
        "k_proj": [_lin_t(sd, "k_proj_1.0"), _lin_t(sd, "k_proj_1.2")],
        "v_proj": [_lin_t(sd, "v_proj_1.0"), _lin_t(sd, "v_proj_1.2")],
        "ln_q": _norm_t(sd, "ln_q_1"),
        "ln_k": _norm_t(sd, "ln_k_1"),
        "ln_v": _norm_t(sd, "ln_v_1"),
        "attn": {"in_q": packed(0), "in_k": packed(1), "in_v": packed(2),
                 "out": _lin_t(sd, "clip_attn.out_proj")},
        "mlp": [_lin_t(sd, "mlp.0"), _lin_t(sd, "mlp.2")],
    }


def _convert_cabstractor(sd: dict) -> dict:
    """Reference CAbstractor state dict (honeybee.py): 'net.{0,2}.b{i}.*'
    timm RegStage blocks (ConvNormAct -> .conv/.bn), SE '.se.fc{1,2}',
    optional downsample, 'readout.{0,2}', optional 'pos_emb'/'prenorm'."""
    import numpy as np

    def conv_t(prefix):
        p = {"w": np.asarray(sd[f"{prefix}.weight"])}  # OIHW kept
        if f"{prefix}.bias" in sd:
            p["b"] = np.asarray(sd[f"{prefix}.bias"])
        return p

    def block(prefix):
        p = {
            "conv1": conv_t(f"{prefix}.conv1.conv"),
            "norm1": _norm_t(sd, f"{prefix}.conv1.bn"),
            "conv2": conv_t(f"{prefix}.conv2.conv"),
            "norm2": _norm_t(sd, f"{prefix}.conv2.bn"),
            "se_fc1": conv_t(f"{prefix}.se.fc1"),
            "se_fc2": conv_t(f"{prefix}.se.fc2"),
            "conv3": conv_t(f"{prefix}.conv3.conv"),
            "norm3": _norm_t(sd, f"{prefix}.conv3.bn"),
        }
        if f"{prefix}.downsample.conv.weight" in sd:
            p["down"] = conv_t(f"{prefix}.downsample.conv")
            p["down_norm"] = _norm_t(sd, f"{prefix}.downsample.bn")
        return p

    def stage(net_idx):
        blocks = []
        i = 1
        while f"net.{net_idx}.b{i}.conv1.conv.weight" in sd:
            blocks.append(block(f"net.{net_idx}.b{i}"))
            i += 1
        return blocks

    out = {"s1": stage(0), "s2": stage(2),
           "readout": [_lin_t(sd, "readout.0"), _lin_t(sd, "readout.2")]}
    if "pos_emb" in sd:
        out["pos_emb"] = np.asarray(sd["pos_emb"])
    if "prenorm.weight" in sd:
        out["prenorm"] = _norm_t(sd, "prenorm")
    return out


# ---------------------------------------------------------------------------
# CAbstractor (reference builder.py:44-56, honeybee.py:37-127)
# ---------------------------------------------------------------------------

def _ln2d(p, x):
    """timm LayerNorm2d: layer-norm over the channel dim of NCHW."""
    y = jnp.moveaxis(x, 1, -1)
    y = nn.layer_norm(p, y, eps=1e-6)
    return jnp.moveaxis(y, -1, 1)


def _init_reg_block(key, in_ch: int, out_ch: int, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 5)
    rd = int(round(in_ch * 0.25))
    p = {
        "conv1": nn.conv2d_init(ks[0], in_ch, out_ch, 1, dtype=dtype),
        "norm1": nn.layer_norm_init(out_ch, dtype),
        "conv2": nn.conv2d_init(ks[1], out_ch, out_ch, 3, groups=out_ch,
                                dtype=dtype),
        "norm2": nn.layer_norm_init(out_ch, dtype),
        "se_fc1": nn.conv2d_init(ks[2], out_ch, rd, 1, dtype=dtype),
        "se_fc2": nn.conv2d_init(ks[3], rd, out_ch, 1, dtype=dtype),
        "conv3": nn.conv2d_init(ks[4], out_ch, out_ch, 1, dtype=dtype),
        "norm3": nn.layer_norm_init(out_ch, dtype),
    }
    if in_ch != out_ch:
        kd = jax.random.fold_in(key, 99)
        p["down"] = nn.conv2d_init(kd, in_ch, out_ch, 1, dtype=dtype)
        p["down_norm"] = nn.layer_norm_init(out_ch, dtype)
    return p


def _reg_block(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """RegNet bottleneck (bottle_ratio 1, depthwise 3x3, SE 0.25, stride 1)."""
    out_ch = p["conv1"]["w"].shape[0]
    y = jax.nn.silu(_ln2d(p["norm1"], nn.conv2d(p["conv1"], x)))
    y = jax.nn.silu(_ln2d(p["norm2"],
                          nn.conv2d(p["conv2"], y, padding=1, groups=out_ch)))
    se = y.mean(axis=(2, 3), keepdims=True)
    se = nn.conv2d(p["se_fc2"], jax.nn.relu(nn.conv2d(p["se_fc1"], se)))
    y = y * jax.nn.sigmoid(se)
    y = _ln2d(p["norm3"], nn.conv2d(p["conv3"], y))
    shortcut = x
    if "down" in p:
        shortcut = _ln2d(p["down_norm"], nn.conv2d(p["down"], x))
    return jax.nn.silu(y + shortcut)


def adaptive_avg_pool_nchw(x: jnp.ndarray, out_hw: int) -> jnp.ndarray:
    """Exact torch AdaptiveAvgPool2d via a zero-padded 2D cumulative sum:
    bin (i,j) averages rows [floor(i*H/o), ceil((i+1)*H/o)) — four static
    gathers from the integral image instead of per-bin dynamic slices."""
    import numpy as np

    b, c, h, w = x.shape
    o = int(out_hw)
    y0 = np.floor(np.arange(o) * h / o).astype(np.int32)
    y1 = np.ceil((np.arange(o) + 1) * h / o).astype(np.int32)
    x0 = np.floor(np.arange(o) * w / o).astype(np.int32)
    x1 = np.ceil((np.arange(o) + 1) * w / o).astype(np.int32)
    s = jnp.cumsum(jnp.cumsum(x.astype(jnp.float32), axis=2), axis=3)
    s = jnp.pad(s, ((0, 0), (0, 0), (1, 0), (1, 0)))
    area = ((y1 - y0)[:, None] * (x1 - x0)[None, :]).astype(np.float32)
    total = (s[:, :, y1[:, None], x1[None, :]]
             - s[:, :, y0[:, None], x1[None, :]]
             - s[:, :, y1[:, None], x0[None, :]]
             + s[:, :, y0[:, None], x0[None, :]])
    return (total / area).astype(x.dtype)


def init_cabstractor_params(key, num_input_tokens: int, in_dim: int,
                            out_dim: int, hidden: int = 1024, depth: int = 3,
                            mlp_depth: int = 2, num_queries: int = 144,
                            pos_emb: bool = True, prenorm: bool = False,
                            dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 2 * depth + mlp_depth + 1)
    p = {
        "s1": [_init_reg_block(ks[i], in_dim if i == 0 else hidden, hidden,
                               dtype) for i in range(depth)],
        "s2": [_init_reg_block(ks[depth + i], hidden, hidden, dtype)
               for i in range(depth)],
        "readout": [nn.linear_init(ks[2 * depth], hidden, out_dim,
                                   dtype=dtype)]
                   + [nn.linear_init(ks[2 * depth + 1 + i], out_dim, out_dim,
                                     dtype=dtype)
                      for i in range(mlp_depth - 1)],
    }
    if pos_emb:
        kp = jax.random.fold_in(key, 7)
        p["pos_emb"] = (0.02 * jax.random.truncated_normal(
            kp, -2.0, 2.0, (1, num_input_tokens, in_dim))).astype(dtype)
    if prenorm:
        p["prenorm"] = nn.layer_norm_init(in_dim, dtype)
    return p


def cabstractor_forward(params: dict, x: jnp.ndarray,
                        num_queries: int = 144) -> jnp.ndarray:
    """x: [B, L, in_dim] (L a perfect square) -> [B, num_queries, out_dim]."""
    b, l, d = x.shape
    hw_in = int(round(l ** 0.5))
    hw_out = int(round(num_queries ** 0.5))
    assert hw_in * hw_in == l and hw_out * hw_out == num_queries
    if "prenorm" in params:
        x = nn.layer_norm(params["prenorm"], x, eps=1e-6)
    if "pos_emb" in params:
        x = x + params["pos_emb"].astype(x.dtype)
    y = jnp.moveaxis(x.reshape(b, hw_in, hw_in, d), -1, 1)  # NCHW
    for blk in params["s1"]:
        y = _reg_block(blk, y)
    y = adaptive_avg_pool_nchw(y, hw_out)
    for blk in params["s2"]:
        y = _reg_block(blk, y)
    y = jnp.moveaxis(y, 1, -1).reshape(b, num_queries, -1)
    out = nn.linear(params["readout"][0], y)
    for lp in params["readout"][1:]:
        out = nn.linear(lp, jax.nn.silu(out))
    return out


# ---------------------------------------------------------------------------
# TokenPacker (reference builder.py:117-217)
# ---------------------------------------------------------------------------

def init_tokenpacker_params(key, mm_hidden: int, hidden_size: int,
                            embed_dim: int = 1024, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 12)
    mlp2 = lambda k0, k1, i, h, o: [  # noqa: E731 — Linear/GELU/Linear stack
        nn.linear_init(k0, i, h, dtype=dtype),
        nn.linear_init(k1, h, o, dtype=dtype)]
    return {
        "q_proj": nn.linear_init(ks[0], mm_hidden, embed_dim, bias=False,
                                 dtype=dtype),
        "k_proj": mlp2(ks[1], ks[2], mm_hidden * 4, embed_dim, embed_dim),
        "v_proj": mlp2(ks[3], ks[4], mm_hidden * 4, embed_dim, embed_dim),
        "ln_q": nn.layer_norm_init(embed_dim, dtype),
        "ln_k": nn.layer_norm_init(embed_dim, dtype),
        "ln_v": nn.layer_norm_init(embed_dim, dtype),
        "attn": {  # torch nn.MultiheadAttention internal projections
            "in_q": nn.linear_init(ks[5], embed_dim, embed_dim, dtype=dtype),
            "in_k": nn.linear_init(ks[6], embed_dim, embed_dim, dtype=dtype),
            "in_v": nn.linear_init(ks[7], embed_dim, embed_dim, dtype=dtype),
            "out": nn.linear_init(ks[8], embed_dim, embed_dim, dtype=dtype),
        },
        "mlp": mlp2(ks[9], ks[10], embed_dim, hidden_size, hidden_size),
    }


def _gelu_mlp2(layers, x):
    return nn.linear(layers[1], jax.nn.gelu(nn.linear(layers[0], x),
                                            approximate=False))


def tokenpacker_forward(params: dict, x: jnp.ndarray, x_multi: jnp.ndarray,
                        raw_grid: int, scale_factor: int = 2,
                        num_heads: int = 8) -> jnp.ndarray:
    """x: [B, raw_grid^2, mm_hidden] single-level map; x_multi: same token
    order with 4x channels (multi-level concat). Returns
    [B, (raw_grid/scale_factor)^2, hidden_size]."""
    b, l, _ = x.shape
    g = raw_grid // scale_factor
    sf = scale_factor
    assert l == raw_grid * raw_grid and g * sf == raw_grid

    k = nn.layer_norm(params["ln_k"], _gelu_mlp2(params["k_proj"], x_multi),
                      eps=1e-6)
    v = nn.layer_norm(params["ln_v"], _gelu_mlp2(params["v_proj"], x_multi),
                      eps=1e-6)
    e = k.shape[-1]

    # bilinear downsample of the single-level map -> queries
    q_img = x.reshape(b, raw_grid, raw_grid, -1).astype(jnp.float32)
    q_img = jax.image.resize(q_img, (b, g, g, q_img.shape[-1]),
                             method="linear", antialias=False)
    q = nn.layer_norm(
        params["ln_q"],
        nn.linear(params["q_proj"], q_img.astype(x.dtype)).reshape(b, g * g, e),
        eps=1e-6)

    # group k/v into the sf x sf window under each query
    def windows(t):
        t = t.reshape(b, g, sf, g, sf, e).transpose(0, 1, 3, 2, 4, 5)
        return t.reshape(b * g * g, sf * sf, e)

    kw, vw = windows(k), windows(v)
    qw = q.reshape(b * g * g, 1, e)

    a = params["attn"]
    hd = e // num_heads
    qh = nn.linear(a["in_q"], qw).reshape(-1, 1, num_heads, hd)
    kh = nn.linear(a["in_k"], kw).reshape(-1, sf * sf, num_heads, hd)
    vh = nn.linear(a["in_v"], vw).reshape(-1, sf * sf, num_heads, hd)
    out = nn.sdpa(qh, kh, vh)  # [B*g*g, 1, heads, hd]
    out = nn.linear(a["out"], out.reshape(-1, 1, e)).reshape(b, g * g, e)
    return _gelu_mlp2(params["mlp"], out)
