"""UPN: universal proposal network (deformable-DETR-style), TPU-native.

Re-implementation of the reference UPN stack (detect_tools/upn/models/):
Swin-L backbone -> per-level 1x1 conv + GroupNorm projections (+1 extra
stride-2 level) -> 6-layer deformable encoder -> two-stage proposal selection
against a learnable fine/coarse granularity prompt -> 6-layer decoder with
iterative box refinement -> contrastive objectness + box heads.

TPU-first notes:
- all level spatial shapes are static per input bucket; the deformable
  attention is the vectorized gather kernel in ops/msda.py (replacing the
  CUDA extension)
- top-k proposal selection, gathers and refinement are plain XLA ops
- batch=1 with a full-valid mask is the serving path; padded batches use the
  same masked math (valid_ratios) as the reference
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from vlm_fo1_tpu import nn
from vlm_fo1_tpu.ops.msda import ms_deform_attn_core, msda_layer, msda_layer_init
from vlm_fo1_tpu.upn.swin import (
    SwinConfig,
    init_swin_params,
    swin_forward,
    swin_large_config,
)


@dataclass(frozen=True)
class UPNConfig:
    d_model: int = 256
    n_heads: int = 8
    n_points: int = 4
    num_feature_levels: int = 5
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    d_ffn: int = 2048
    num_queries: int = 900
    gn_groups: int = 32
    pos_feats: int = 128
    pos_temperature: float = 20.0

    @classmethod
    def from_config_dict(cls, model_cfg: dict) -> "UPNConfig":
        """Ingest the reference's declarative config structure (the
        `model=dict(...)` tree of configs/upn_large.py:1-73, which the
        reference instantiates through mmengine registries —
        builder.py:3-39). The nested type= dicts collapse into this typed
        config; unknown keys are ignored, matching mmengine's permissive
        build."""
        t = model_cfg.get("transformer_cfg", {})
        enc = t.get("encoder_cfg", {})
        dec = t.get("decoder_cfg", {})
        layer = enc.get("encoder_layer_cfg", {})
        pos = (model_cfg.get("vision_backbone_cfg", {})
               .get("position_embedding_cfg", {}))
        return cls(
            d_model=layer.get("d_model", cls.d_model),
            n_heads=layer.get("n_heads", cls.n_heads),
            num_feature_levels=t.get("num_feature_levels",
                                     layer.get("n_levels",
                                               cls.num_feature_levels)),
            num_encoder_layers=enc.get("num_layers", cls.num_encoder_layers),
            num_decoder_layers=dec.get("num_layers", cls.num_decoder_layers),
            d_ffn=layer.get("d_ffn", cls.d_ffn),
            num_queries=model_cfg.get("num_queries", cls.num_queries),
            pos_feats=pos.get("num_pos_feats", cls.pos_feats),
            pos_temperature=float(pos.get("temperatureH",
                                          cls.pos_temperature)),
        )

    @classmethod
    def from_config_file(cls, path: str) -> "UPNConfig":
        """Load a reference-style python config file (mmengine
        Config.fromfile equivalent): executes the file and reads its
        `model` dict."""
        ns: dict = {}
        with open(path) as f:
            exec(compile(f.read(), path, "exec"), ns)  # noqa: S102
        if "model" not in ns:
            raise ValueError(f"{path} defines no `model` dict")
        return cls.from_config_dict(ns["model"])


def inverse_sigmoid(x, eps=1e-3):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.log(jnp.clip(x, eps, None) / jnp.clip(1 - x, eps, None))


def _mlp3_init(key, d_in, d_h, d_out, dtype):
    k = jax.random.split(key, 3)
    return {"layers": [nn.linear_init(k[0], d_in, d_h, dtype=dtype),
                       nn.linear_init(k[1], d_h, d_h, dtype=dtype),
                       nn.linear_init(k[2], d_h, d_out, dtype=dtype)]}


def _mlp_forward(p, x):
    """Reference MLP: relu between layers, none at the end (module/mlp.py)."""
    layers = p["layers"]
    for lp in layers[:-1]:
        x = jax.nn.relu(nn.linear(lp, x))
    return nn.linear(layers[-1], x)


def init_upn_params(key, cfg: UPNConfig, swin_cfg: SwinConfig | None = None,
                    dtype=jnp.float32) -> dict:
    swin_cfg = swin_cfg or swin_large_config()
    keys = jax.random.split(key, 16)
    d = cfg.d_model

    # input projections: one per backbone level + extras
    nb = len(swin_cfg.out_indices)
    proj = []
    pk = jax.random.split(keys[1], cfg.num_feature_levels)
    for i in range(nb):
        proj.append({"conv": nn.conv2d_init(pk[i], swin_cfg.num_features[i],
                                            d, 1, dtype=dtype),
                     "gn": nn.group_norm_init(d, dtype)})
    in_ch = swin_cfg.num_features[-1]
    for i in range(nb, cfg.num_feature_levels):
        proj.append({"conv": nn.conv2d_init(pk[i], in_ch, d, 3, dtype=dtype),
                     "gn": nn.group_norm_init(d, dtype)})
        in_ch = d

    def enc_layer(k):
        kk = jax.random.split(k, 3)
        return {
            "self_attn": msda_layer_init(kk[0], d, cfg.num_feature_levels,
                                         cfg.n_heads, cfg.n_points, dtype),
            "norm1": nn.layer_norm_init(d, dtype),
            "linear1": nn.linear_init(kk[1], d, cfg.d_ffn, dtype=dtype),
            "linear2": nn.linear_init(kk[2], cfg.d_ffn, d, dtype=dtype),
            "norm2": nn.layer_norm_init(d, dtype),
        }

    def dec_layer(k):
        kk = jax.random.split(k, 5)
        return {
            "cross_attn": msda_layer_init(kk[0], d, cfg.num_feature_levels,
                                          cfg.n_heads, cfg.n_points, dtype),
            "norm1": nn.layer_norm_init(d, dtype),
            "self_attn": {
                "in_proj": nn.linear_init(kk[1], d, 3 * d, dtype=dtype),
                "out_proj": nn.linear_init(kk[2], d, d, dtype=dtype),
            },
            "norm2": nn.layer_norm_init(d, dtype),
            "linear1": nn.linear_init(kk[3], d, cfg.d_ffn, dtype=dtype),
            "linear2": nn.linear_init(kk[4], cfg.d_ffn, d, dtype=dtype),
            "norm3": nn.layer_norm_init(d, dtype),
        }

    ek = jax.random.split(keys[2], cfg.num_encoder_layers)
    dk = jax.random.split(keys[3], cfg.num_decoder_layers)

    bbox_embed = _mlp3_init(keys[4], d, d, 4, dtype)
    # reference zero-inits the last box layer (upn_model.py:300-301)
    bbox_embed["layers"][-1]["w"] = jnp.zeros_like(bbox_embed["layers"][-1]["w"])
    bbox_embed["layers"][-1]["b"] = jnp.zeros_like(bbox_embed["layers"][-1]["b"])
    enc_bbox_embed = _mlp3_init(keys[5], d, d, 4, dtype)
    enc_bbox_embed["layers"][-1]["w"] = jnp.zeros_like(
        enc_bbox_embed["layers"][-1]["w"])
    enc_bbox_embed["layers"][-1]["b"] = jnp.zeros_like(
        enc_bbox_embed["layers"][-1]["b"])

    return {
        "backbone": init_swin_params(keys[0], swin_cfg, dtype),
        "input_proj": proj,
        "level_embed": (jax.random.normal(keys[6], (cfg.num_feature_levels, d))
                        * 1.0).astype(dtype),
        "encoder": [enc_layer(k) for k in ek],
        "decoder": {
            "layers": [dec_layer(k) for k in dk],
            "norm": nn.layer_norm_init(d, dtype),
            "ref_point_head": {"layers": [
                nn.linear_init(keys[7], 2 * d, d, dtype=dtype),
                nn.linear_init(keys[8], d, d, dtype=dtype)]},
        },
        "tgt_embed": jax.random.normal(keys[9], (cfg.num_queries, d)).astype(dtype),
        "enc_output": nn.linear_init(keys[10], d, d, dtype=dtype),
        "enc_output_norm": nn.layer_norm_init(d, dtype),
        "bbox_embed": bbox_embed,
        "enc_out_bbox_embed": enc_bbox_embed,
        "fine_grained_prompt": jax.random.normal(keys[11], (1, d)).astype(dtype),
        "coarse_grained_prompt": jax.random.normal(keys[12], (1, d)).astype(dtype),
    }


# ------------------------------------------------------------------ pieces

def sine_position_embedding(h: int, w: int, valid_h, valid_w,
                            num_pos_feats=128, temperature=20.0,
                            dtype=jnp.float32):
    """PositionEmbeddingSineHW with normalize=True
    (reference detr_utils.py:79-149). valid_h/valid_w may be traced scalars.
    Returns [H, W, 2*num_pos_feats] in `dtype` (f64 under the full-scale
    oracle so the tables match the double-precision reference)."""
    ys = (jnp.arange(1, h + 1, dtype=dtype)[:, None]
          * jnp.ones((1, w), dtype))
    xs = (jnp.ones((h, 1), dtype)
          * jnp.arange(1, w + 1, dtype=dtype)[None, :])
    # zero out padding rows/cols like the reference's masked cumsum
    row_valid = (jnp.arange(h) < valid_h)[:, None]
    col_valid = (jnp.arange(w) < valid_w)[None, :]
    ys = jnp.where(row_valid & col_valid, ys, 0.0)
    xs = jnp.where(row_valid & col_valid, xs, 0.0)
    eps = 1e-6
    scale = 2 * np.pi
    # the reference normalizes by the last row/col of the cumsum (== max valid)
    y_embed = ys / (jnp.max(ys, axis=0, keepdims=True) + eps) * scale
    x_embed = xs / (jnp.max(xs, axis=1, keepdims=True) + eps) * scale

    dim_t = temperature ** (
        2 * (jnp.arange(num_pos_feats, dtype=dtype) // 2)
        / num_pos_feats)
    px = x_embed[:, :, None] / dim_t
    py = y_embed[:, :, None] / dim_t

    def interleave(v):
        return jnp.stack([jnp.sin(v[..., 0::2]), jnp.cos(v[..., 1::2])],
                         axis=-1).reshape(*v.shape[:-1], -1)

    return jnp.concatenate([interleave(py), interleave(px)], axis=-1)


def sineembed_512(pos, d=128):
    """gen_sineembed_for_position (detr_utils.py:276-310): 128 feats per
    coordinate, order (y, x, w, h). pos: [B, N, 4] -> [B, N, 512]."""
    scale = 2 * np.pi
    fdt = jnp.promote_types(pos.dtype, jnp.float32)
    dim_t = 10000.0 ** (2 * (jnp.arange(d, dtype=fdt) // 2) / d)

    def emb(c):
        f = c[..., None] * scale / dim_t
        return jnp.stack([jnp.sin(f[..., 0::2]), jnp.cos(f[..., 1::2])],
                         axis=-1).reshape(*c.shape, -1)

    return jnp.concatenate([emb(pos[..., 1]), emb(pos[..., 0]),
                            emb(pos[..., 2]), emb(pos[..., 3])], axis=-1)


def _ffn(p, x, act=jax.nn.relu):
    y = nn.linear(p["linear2"], act(nn.linear(p["linear1"], x)))
    return nn.layer_norm(p["norm2" if "norm3" not in p else "norm3"], x + y)


def _encoder_reference_points(spatial_shapes, valid_ratios,
                              dtype=jnp.float32):
    """[B, S, L, 2] normalized per-level grid reference points
    (reference upn_encoder.py:193-208). `dtype` is the coordinate compute
    dtype — f64 under the full-scale f64 oracle, where f32-rounded grid
    coordinates can flip bilinear floor() cells vs the double-precision
    reference."""
    pts = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        ry = (jnp.arange(h, dtype=dtype) + 0.5)
        rx = (jnp.arange(w, dtype=dtype) + 0.5)
        gy, gx = jnp.meshgrid(ry, rx, indexing="ij")
        vr = valid_ratios.astype(dtype)
        gy = gy.reshape(-1)[None] / (vr[:, None, lvl, 1] * h)
        gx = gx.reshape(-1)[None] / (vr[:, None, lvl, 0] * w)
        pts.append(jnp.stack([gx, gy], -1))
    ref = jnp.concatenate(pts, 1)                      # [B, S, 2]
    return ref[:, :, None] * valid_ratios.astype(dtype)[:, None]


def _mha(p, q, k, v, n_heads):
    """torch.nn.MultiheadAttention equivalent (packed in_proj)."""
    b, n, c = q.shape
    hd = c // n_heads
    w, bias = p["in_proj"]["w"], p["in_proj"]["b"]
    qp = q @ w[:, :c] + bias[:c]
    kp = k @ w[:, c:2 * c] + bias[c:2 * c]
    vp = v @ w[:, 2 * c:] + bias[2 * c:]
    qp = qp.reshape(b, n, n_heads, hd)
    kp = kp.reshape(b, -1, n_heads, hd)
    vp = vp.reshape(b, -1, n_heads, hd)
    out = nn.sdpa(qp, kp, vp).reshape(b, n, c)
    return nn.linear(p["out_proj"], out)


def gen_anchor_proposals(spatial_shapes, valid_ratios,
                         dtype=jnp.float32):
    """Per-pixel anchors (cx, cy, w, h) with wh = 0.05 * 2^lvl
    (reference detr_utils.py:351-415). Returns [B, S, 4] in [0,1]."""
    b = valid_ratios.shape[0]
    props = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        gy, gx = jnp.meshgrid(jnp.arange(h, dtype=dtype),
                              jnp.arange(w, dtype=dtype), indexing="ij")
        grid = jnp.stack([gx, gy], -1)[None]           # [1, H, W, 2]
        valid_wh = (valid_ratios.astype(dtype)[:, lvl]
                    * jnp.asarray([w, h], dtype))
        grid = (grid + 0.5) / valid_wh[:, None, None, :]
        wh = jnp.full_like(grid, 0.05 * 2.0**lvl)
        props.append(jnp.concatenate([grid, wh], -1).reshape(b, -1, 4))
    return jnp.concatenate(props, 1)


# ------------------------------------------------------------------ forward

def upn_forward(
    params: dict,
    cfg: UPNConfig,
    swin_cfg: SwinConfig,
    image: jnp.ndarray,         # [B, H, W, 3] padded
    valid_hw: jnp.ndarray,      # [B, 2] true (h, w) before padding
    prompt: str = "fine_grained_prompt",
):
    """Returns dict(pred_boxes [B, nq, 4] normalized cxcywh,
    pred_logits [B, nq, 1])."""
    b, img_h, img_w, _ = image.shape
    feats = swin_forward(params["backbone"], swin_cfg, image)

    # project + extra levels
    srcs = []
    for i, f in enumerate(feats):
        p = params["input_proj"][i]
        srcs.append(nn.group_norm(p["gn"], nn.conv2d(
            p["conv"], f.transpose(0, 3, 1, 2)).transpose(0, 2, 3, 1),
            cfg.gn_groups))
    extra_src = feats[-1]
    for i in range(len(feats), cfg.num_feature_levels):
        p = params["input_proj"][i]
        extra_src = nn.group_norm(p["gn"], nn.conv2d(
            p["conv"], extra_src.transpose(0, 3, 1, 2), stride=2,
            padding=1).transpose(0, 2, 3, 1), cfg.gn_groups)
        srcs.append(extra_src)

    spatial_shapes = tuple((s.shape[1], s.shape[2]) for s in srcs)
    # valid sizes per level (ceil of true size / stride)
    strides = [4 * 2**i for i in range(len(feats))]
    strides += [strides[-1] * 2**(i + 1)
                for i in range(cfg.num_feature_levels - len(feats))]
    vh = valid_hw[:, 0:1].astype(jnp.float32)
    vw = valid_hw[:, 1:2].astype(jnp.float32)

    src_flat, pos_flat, ratios = [], [], []
    for lvl, s in enumerate(srcs):
        h, w = spatial_shapes[lvl]
        lvh = jnp.ceil(vh / strides[lvl]).astype(jnp.int32)[:, 0]
        lvw = jnp.ceil(vw / strides[lvl]).astype(jnp.int32)[:, 0]
        pos = jax.vmap(lambda a, c: sine_position_embedding(
            h, w, a, c, cfg.pos_feats, cfg.pos_temperature,
            dtype=jnp.promote_types(s.dtype, jnp.float32)))(lvh, lvw)
        # pin to the feature dtype: the fp32 sine tables would otherwise
        # promote `memory + pos` (and with it the whole encoder) to fp32
        pos_flat.append((pos + params["level_embed"][lvl])
                        .astype(s.dtype).reshape(b, -1, cfg.d_model))
        src_flat.append(s.reshape(b, -1, cfg.d_model))
        ratios.append(jnp.stack([lvw.astype(jnp.float32) / w,
                                 lvh.astype(jnp.float32) / h], -1))
    src = jnp.concatenate(src_flat, 1)
    pos = jnp.concatenate(pos_flat, 1)
    valid_ratios = jnp.stack(ratios, 1)               # [B, L, 2]

    # key padding mask over flattened levels (True = pad)
    masks = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        lvh = jnp.ceil(vh / strides[lvl])[:, 0]
        lvw = jnp.ceil(vw / strides[lvl])[:, 0]
        mh = jnp.arange(h)[None, :] >= lvh[:, None]
        mw = jnp.arange(w)[None, :] >= lvw[:, None]
        masks.append((mh[:, :, None] | mw[:, None, :]).reshape(b, -1))
    key_pad = jnp.concatenate(masks, 1)               # [B, S]

    # ------------------------------------------------------------ encoder
    # lax.scan over stacked layer params: ONE traced/compiled layer body
    # instead of num_encoder_layers copies (the layers are structurally
    # identical; this is what cut the 200s+ first-compile — each encoder
    # layer contains a multi-pass Pallas MSDA program)
    memory = src
    coord_dt = jnp.promote_types(src.dtype, jnp.float32)
    enc_ref = _encoder_reference_points(spatial_shapes, valid_ratios,
                                        dtype=coord_dt)

    def enc_body(mem, layer):
        attn = msda_layer(layer["self_attn"], mem + pos, enc_ref, mem,
                          spatial_shapes, cfg.n_heads, cfg.n_points,
                          key_padding_mask=key_pad)
        mem = nn.layer_norm(layer["norm1"], mem + attn)
        return _ffn(layer, mem), None

    if params["encoder"]:  # empty = encoder ablated (layer-sliced profiling)
        enc_stack = jax.tree.map(lambda *xs: jnp.stack(xs),
                                 *params["encoder"])
        memory, _ = jax.lax.scan(enc_body, memory, enc_stack)

    # ------------------------------------------------- two-stage proposals
    proposals = gen_anchor_proposals(spatial_shapes, valid_ratios,
                                     dtype=coord_dt)
    prop_valid = jnp.all((proposals > 0.01) & (proposals < 0.99), -1)
    prop_valid = prop_valid & ~key_pad
    proposals_unsig = jnp.where(prop_valid[..., None],
                                inverse_sigmoid(proposals, eps=0.0), jnp.inf)
    out_mem = jnp.where(prop_valid[..., None], memory, 0.0)
    out_mem = nn.layer_norm(params["enc_output_norm"],
                            nn.linear(params["enc_output"], out_mem))

    prompt_emb = params[prompt][0] if prompt else jnp.zeros(
        (cfg.d_model,), memory.dtype)
    logits = (out_mem @ prompt_emb).astype(jnp.float32)  # [B, S] objectness
    # NO -inf masking of invalid anchors: the reference zeroes their MEMORY
    # but lets them compete in topk with the resulting constant
    # LN(Linear(0))@prompt score (gen_encoder_output_proposals,
    # detr_utils.py:404-415 + get_two_stage_proposal's unmasked topk,
    # deformable_transformer.py:300-309). Border anchors (cx or cy outside
    # [0.01, 0.99]) exist whenever a level map exceeds 50 px, so an -inf
    # exclusion here (r1-r4) silently diverged from the reference at real
    # 800/1333 sizes while matching it on small test maps — caught by the
    # full-scale f64 oracle (test_upn_oracle.py).
    topk_vals, topk_idx = jax.lax.top_k(logits, cfg.num_queries)

    # box-coordinate chain stays fp32 end to end: near 1.0 a bf16 coord
    # only resolves ~1/256 (≈5px at the 1333 long side)
    coords_unsig = _mlp_forward(params["enc_out_bbox_embed"],
                                out_mem).astype(jnp.float32) \
        + proposals_unsig
    refpoints_unsig = jnp.take_along_axis(coords_unsig, topk_idx[..., None],
                                          axis=1)
    tgt = jnp.broadcast_to(params["tgt_embed"][None],
                           (b, cfg.num_queries, cfg.d_model))

    # ------------------------------------------------------------ decoder
    ref = jax.nn.sigmoid(refpoints_unsig)
    vr4 = jnp.concatenate([valid_ratios, valid_ratios], -1)  # [B, L, 4]

    def dec_body(carry, layer):
        out, ref, _ = carry
        ref_input = ref[:, :, None] * vr4[:, None]           # [B, nq, L, 4]
        # 128 feats/coord at d_model=256 (reference detr_utils.py:276-310)
        qse = sineembed_512(ref_input[:, :, 0, :], d=cfg.d_model // 2)
        query_pos = _mlp2(params["decoder"]["ref_point_head"],
                          qse).astype(out.dtype)
        q = out + query_pos
        out = nn.layer_norm(layer["norm2"],
                            out + _mha(layer["self_attn"], q, q, out,
                                       cfg.n_heads))
        cross = msda_layer(layer["cross_attn"], out + query_pos, ref_input,
                           memory, spatial_shapes, cfg.n_heads, cfg.n_points,
                           key_padding_mask=key_pad)
        out = nn.layer_norm(layer["norm1"], out + cross)
        out = _ffn({"linear1": layer["linear1"], "linear2": layer["linear2"],
                    "norm3": layer["norm3"]}, out)
        # iterative refinement uses the raw layer output...
        delta = _mlp_forward(params["bbox_embed"], out).astype(jnp.float32)
        new_ref = jax.nn.sigmoid(delta + inverse_sigmoid(ref))
        return (out, new_ref, ref), None

    if params["decoder"]["layers"]:  # empty = decoder ablated (profiling)
        dec_stack = jax.tree.map(lambda *xs: jnp.stack(xs),
                                 *params["decoder"]["layers"])
        (out, ref, ref_before), _ = jax.lax.scan(
            dec_body, (tgt, ref, ref), dec_stack)
    else:
        out, ref_before = tgt, ref

    # ...but the reported boxes recompute the last refinement from the
    # LayerNormed hidden states (reference upn_model.py:110-122 applies
    # bbox_embed to the decoder's normed intermediates)
    hs = nn.layer_norm(params["decoder"]["norm"], out)
    pred_boxes = jax.nn.sigmoid(
        _mlp_forward(params["bbox_embed"], hs).astype(jnp.float32)
        + inverse_sigmoid(ref_before))
    pred_logits = (hs @ prompt_emb).astype(jnp.float32)[..., None]
    return {"pred_boxes": pred_boxes, "pred_logits": pred_logits}


def _mlp2(p, x):
    l0, l1 = p["layers"]
    return nn.linear(l1, jax.nn.relu(nn.linear(l0, x)))
