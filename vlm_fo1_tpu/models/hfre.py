"""Hybrid Fine-grained Region Encoder (HFRE) — the FO1 paper's core module.

Re-implementation of HFREModule (reference
hybrid_finegrained_region_encoder.py:106-469) for the configuration used by
the released checkpoint: dual-path ROI pooling

  aux path: DaViT stage maps -> bilinear upsample stages 1..3 to stage-0
            resolution -> channel concat [.., 3840] -> ROIAlign(7x7, 0.25)
            -> spatial mean -> [N, 3840]
  vt path:  4 captured ViT full-attention maps (channel-concat [.., 5120])
            -> ROIAlign(7x7, 1/14) -> mean -> [N, 5120]
  combine:  concat -> [N, 8960], + sine-cosine bbox position embedding of the
            normalized (cx, cy, w, h) box (strategy 'bbox_based').

All feature maps are channel-last; ROI numerics are fp32 (the reference
upcasts with .float(), hybrid...:250,264,319).

The less-common reference variants (mean combination, separate position
embeddings, SimpleFPN vt path, feature-map position embedding) are supported
where the released checkpoint can select them via config; unsupported combos
raise explicitly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vlm_fo1_tpu import nn
from vlm_fo1_tpu.config import HFREConfig
from vlm_fo1_tpu.models.simple_fpn import simple_fpn_forward
from vlm_fo1_tpu.ops.roi_align import roi_align_mean_separable

# SimpleFPN level strides for a 14px-patch ViT (reference hybrid...:245)
FPN_STRIDES = (3.5, 7.0, 14.0, 28.0)


def gen_sineembed_for_position(pos: jnp.ndarray, dim_feats: int) -> jnp.ndarray:
    """Sine/cos embedding of normalized box coords.

    pos: [N, 4] (cx, cy, w, h) in [0, 1]. Returns [N, 4*dim_feats] ordered
    (y, x, w, h) with interleaved sin/cos pairs — matches the reference
    gen_sineembed_for_position (hybrid...:55-103).
    """
    scale = 2 * jnp.pi
    dim_t = 10000.0 ** (2 * (jnp.arange(dim_feats, dtype=jnp.float32) // 2)
                        / dim_feats)

    def embed(coord):  # [N] -> [N, dim_feats]
        f = coord[:, None] * scale / dim_t
        s = jnp.sin(f[:, 0::2])
        c = jnp.cos(f[:, 1::2])
        return jnp.stack([s, c], axis=-1).reshape(coord.shape[0], -1)

    cx, cy, w, h = pos[:, 0], pos[:, 1], pos[:, 2], pos[:, 3]
    return jnp.concatenate([embed(cy), embed(cx), embed(w), embed(h)], axis=-1)


def generate_2d_position_embedding(height: int, width: int, dim: int):
    """2D sine/cos positional encoding [H, W, dim] (reference
    hybrid...:11-53): per axis, normalized coords scaled by 2*pi over a
    quarter-dim frequency bank, ordered (y-block, x-block)."""
    quarter = dim // 4
    y = jnp.arange(height, dtype=jnp.float32) / height
    x = jnp.arange(width, dtype=jnp.float32) / width
    yg, xg = jnp.meshgrid(y, x, indexing="ij")
    scale = 2 * jnp.pi
    if quarter > 0:
        dim_t = 10000.0 ** (2 * (jnp.arange(quarter, dtype=jnp.float32) // 2)
                            / quarter)
    else:
        dim_t = jnp.asarray([1.0], jnp.float32)

    def embed(grid):
        f = grid[..., None] * scale / dim_t
        return jnp.stack([jnp.sin(f), jnp.cos(f)], axis=-1).reshape(
            height, width, -1)

    return jnp.concatenate([embed(yg), embed(xg)], axis=-1)


def _apply_feature_map_pos(aux_maps: list, cfg: HFREConfig):
    """Add 2D positional encodings to each aux level (strategies
    feature_map_based / hybrid, reference hybrid...:205-228, 327-335)."""
    out = []
    for m in aux_maps:
        h, w, c = m.shape
        pe = generate_2d_position_embedding(h, w, c)
        out.append(m + pe[..., :c].astype(m.dtype))
    return out


def _xyxy_to_normalized_cxcywh(boxes: jnp.ndarray, img_w: float, img_h: float):
    x1 = boxes[:, 0] / img_w
    y1 = boxes[:, 1] / img_h
    x2 = boxes[:, 2] / img_w
    y2 = boxes[:, 3] / img_h
    w = x2 - x1
    h = y2 - y1
    return jnp.stack([x1 + w / 2, y1 + h / 2, w, h], axis=-1)


def upsample_concat_aux(aux_maps: list[jnp.ndarray]) -> jnp.ndarray:
    """Bilinear-upsample stages 1..3 to stage-0 size, concat channels.

    aux_maps: list of [B, Hi, Wi, Ci] channel-last. Returns [B, H0, W0, sum C].
    Half-pixel-center bilinear == torch F.interpolate(align_corners=False)
    (reference hybrid...:338-350).
    """
    h0, w0 = aux_maps[0].shape[1:3]
    outs = [aux_maps[0].astype(jnp.float32)]
    for m in aux_maps[1:]:
        b, _, _, c = m.shape
        outs.append(jax.image.resize(m.astype(jnp.float32), (b, h0, w0, c),
                                     method="bilinear"))
    return jnp.concatenate(outs, axis=-1)


def roi_align_aux_levels(aux_maps: list[jnp.ndarray], boxes, cfg: HFREConfig):
    """Aux-path pooling without materializing ANY upsampled map.

    Exactly equals ROIAlign over upsample_concat_aux (ROIAlign is independent
    per channel, and upsample-then-sample composes into one weight matrix —
    ops/roi_align.roi_align_mean_upsampled): each level is pooled at its
    NATIVE resolution with the composed bilinear weights. Removes >2GB of
    fp32 upsample traffic per 4-image batch on the DaViT [24,24,2048] stage.
    aux_maps: [Hi, Wi, Ci] (single image)."""
    h0, w0 = aux_maps[0].shape[:2]
    feats = []
    for m in aux_maps:
        mf = m.astype(jnp.float32)
        hi, wi = m.shape[:2]
        if h0 % hi == 0 and w0 % wi == 0 and h0 // hi == w0 // wi:
            feats.append(roi_align_mean_separable(
                mf, boxes, cfg.roi_output_size, cfg.aux_spatial_scale,
                sampling_ratio=cfg.roi_sampling_ratio, upsample=h0 // hi))
        else:  # non-integer ratio: materialize (never hit by DaViT stages)
            mf = jax.image.resize(mf, (h0, w0, m.shape[-1]), method="bilinear")
            feats.append(roi_align_mean_separable(
                mf, boxes, cfg.roi_output_size, cfg.aux_spatial_scale,
                sampling_ratio=cfg.roi_sampling_ratio))
    return jnp.concatenate(feats, axis=-1)


def hfre_forward(
    params: dict,
    cfg: HFREConfig,
    aux_maps,                    # list of [Hi, Wi, Ci] stage maps, or one
                                 # pre-concatenated [H0, W0, sumC] map
    aux_boxes: jnp.ndarray,      # [N, 4] xyxy in aux-input pixels
    vt_map: jnp.ndarray | None,  # [gh, gw, 4D] fp32
    vt_boxes: jnp.ndarray | None,  # [N, 4] xyxy in ViT-input pixels
) -> jnp.ndarray:
    """Region features [N, region_feature_dim] float32 for one image."""
    if cfg.use_vt_region_feature_only:
        out = _extract_vt_feature(params, cfg, vt_map, vt_boxes)
        if cfg.apply_position_embedding:
            out = out + _vt_pos_embed(vt_map, vt_boxes, cfg,
                                      cfg.region_feature_dim // 4)
        return out

    if isinstance(aux_maps, (list, tuple)):
        if (cfg.apply_position_embedding
                and cfg.pos_embedding_strategy in ("feature_map_based",
                                                   "hybrid")):
            aux_maps = _apply_feature_map_pos(list(aux_maps), cfg)
        h0, w0 = aux_maps[0].shape[:2]
        aux_feat = roi_align_aux_levels(aux_maps, aux_boxes, cfg)
    else:
        h0, w0 = aux_maps.shape[:2]
        aux_feat = roi_align_mean_separable(
            aux_maps, aux_boxes, cfg.roi_output_size, cfg.aux_spatial_scale,
            sampling_ratio=cfg.roi_sampling_ratio)
    if cfg.apply_region_layer_norm and "aux_region_norm" in params:
        aux_feat = nn.layer_norm(params["aux_region_norm"], aux_feat)

    if not cfg.use_vision_tower_region_feature:
        out = aux_feat
    else:
        vt_feat = _extract_vt_feature(params, cfg, vt_map, vt_boxes)
        if cfg.apply_region_layer_norm and "vt_region_norm" in params:
            vt_feat = nn.layer_norm(params["vt_region_norm"], vt_feat)
        comb = cfg.region_feature_combination
        if comb in ("concat", "concat_aux_pos"):
            out = jnp.concatenate([aux_feat, vt_feat], axis=-1)
        elif comb in ("mean", "mean_aux_pos"):
            out = (aux_feat + vt_feat) / 2
        elif comb in ("concat_sep_pos", "mean_sep_pos",
                      "concat_sep_no_vt_pos", "mean_sep_no_vt_pos"):
            # separate position embeddings per path (reference
            # hybrid...:384-432): aux uses aux boxes at 2880//4 feats; vt
            # (unless *_no_vt_pos) uses vt boxes at its own dim
            aux_img_w = w0 / cfg.aux_spatial_scale
            aux_img_h = h0 / cfg.aux_spatial_scale
            aux_pos = _xyxy_to_normalized_cxcywh(
                aux_boxes.astype(jnp.float32), aux_img_w, aux_img_h)
            aux_feat = aux_feat + gen_sineembed_for_position(
                aux_pos, aux_feat.shape[-1] // 4)
            if comb in ("concat_sep_pos", "mean_sep_pos"):
                vt_feat = vt_feat + _vt_pos_embed(vt_map, vt_boxes, cfg,
                                                  vt_feat.shape[-1] // 4)
            if comb.startswith("concat"):
                out = jnp.concatenate([aux_feat, vt_feat], axis=-1)
            else:
                out = (aux_feat + vt_feat) / 2
        else:
            raise NotImplementedError(
                f"region_feature_combination={comb!r} not supported yet")

    if cfg.apply_position_embedding and cfg.pos_embedding_strategy in (
            "bbox_based", "hybrid"):
        use_vt = (cfg.use_vision_tower_region_feature and vt_boxes is not None
                  and cfg.region_feature_combination
                  not in ("concat_aux_pos", "mean_aux_pos"))
        if use_vt:
            out = out + _vt_pos_embed(vt_map, vt_boxes, cfg,
                                      cfg.region_feature_dim // 4)
        else:
            img_w = w0 / cfg.aux_spatial_scale
            img_h = h0 / cfg.aux_spatial_scale
            pos = _xyxy_to_normalized_cxcywh(
                aux_boxes.astype(jnp.float32), img_w, img_h)
            out = out + gen_sineembed_for_position(
                pos, cfg.region_feature_dim // 4)
    return out


def _extract_vt_feature(params: dict, cfg: HFREConfig, vt_map, vt_boxes):
    """ViT-path region feature (reference extract_vt_region_feature,
    hybrid...:230-273): single ROIAlign on the concatenated captures, or a
    SimpleFPN pyramid with per-level strides when configured."""
    if cfg.use_simple_fpn_for_vt:
        levels = simple_fpn_forward(params["simple_fpn"],
                                    vt_map.astype(jnp.float32)[None])
        feats = [
            roi_align_mean_separable(lvl[0], vt_boxes, cfg.roi_output_size,
                                     1.0 / stride,
                                     sampling_ratio=cfg.roi_sampling_ratio)
            for lvl, stride in zip(levels, FPN_STRIDES)
        ]
        return jnp.concatenate(feats, axis=-1)
    return roi_align_mean_separable(vt_map.astype(jnp.float32), vt_boxes,
                                    cfg.roi_output_size, cfg.vt_spatial_scale,
                                    sampling_ratio=cfg.roi_sampling_ratio)


def _vt_pos_embed(vt_map, vt_boxes, cfg: HFREConfig, dim_feats: int):
    gh, gw = vt_map.shape[:2]
    img_w = gw / cfg.vt_spatial_scale
    img_h = gh / cfg.vt_spatial_scale
    pos = _xyxy_to_normalized_cxcywh(vt_boxes.astype(jnp.float32), img_w, img_h)
    return gen_sineembed_for_position(pos, dim_feats)
