"""UPN subsystem tests: Swin shapes/properties, NMS parity, end-to-end
proposal generation on a tiny config."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from vlm_fo1_tpu.ops.nms import nms_jax, nms_numpy
from vlm_fo1_tpu.upn.model import (
    UPNConfig,
    gen_anchor_proposals,
    init_upn_params,
    inverse_sigmoid,
    sine_position_embedding,
    upn_forward,
)
from vlm_fo1_tpu.upn.swin import SwinConfig, init_swin_params, swin_forward
from vlm_fo1_tpu.upn.wrapper import UPNWrapper

TINY_SWIN = SwinConfig(embed_dim=16, depths=(1, 1, 2, 1),
                       num_heads=(1, 2, 4, 8), window_size=4)
TINY_UPN = UPNConfig(d_model=32, n_heads=4, n_points=2,
                     num_encoder_layers=2, num_decoder_layers=2,
                     d_ffn=64, num_queries=20, gn_groups=8, pos_feats=16)


def test_swin_shapes(rng):
    params = init_swin_params(jax.random.PRNGKey(0), TINY_SWIN)
    x = jnp.asarray(rng.standard_normal((1, 64, 96, 3)).astype(np.float32))
    outs = swin_forward(params, TINY_SWIN, x)
    assert [tuple(o.shape) for o in outs] == [
        (1, 16, 24, 16), (1, 8, 12, 32), (1, 4, 6, 64), (1, 2, 3, 128)]
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()


def test_swin_shift_mask_locality(rng):
    """Swin blocks must produce different outputs for shifted vs non-shifted
    windows but remain finite and shape-stable with non-multiple sizes."""
    params = init_swin_params(jax.random.PRNGKey(0), TINY_SWIN)
    x = jnp.asarray(rng.standard_normal((1, 52, 68, 3)).astype(np.float32))
    outs = swin_forward(params, TINY_SWIN, x)
    assert outs[0].shape == (1, 13, 17, 16)
    assert np.isfinite(np.asarray(outs[-1])).all()


def test_nms_matches_torchvision_semantics(rng):
    boxes = rng.uniform(0, 100, size=(50, 2)).astype(np.float32)
    wh = rng.uniform(5, 40, size=(50, 2)).astype(np.float32)
    boxes = np.concatenate([boxes, boxes + wh], axis=1)
    scores = rng.uniform(0, 1, size=50).astype(np.float32)
    keep = nms_numpy(boxes, scores, 0.5)
    # kept boxes must be mutually below the IoU threshold
    def iou(a, b):
        x1, y1 = np.maximum(a[:2], b[:2])
        x2, y2 = np.minimum(a[2:], b[2:])
        inter = max(x2 - x1, 0) * max(y2 - y1, 0)
        area = lambda z: (z[2] - z[0]) * (z[3] - z[1])
        return inter / (area(a) + area(b) - inter)
    for i, a in enumerate(keep):
        for b in keep[i + 1:]:
            assert iou(boxes[a], boxes[b]) <= 0.5 + 1e-6
    # jax variant agrees
    mask = np.asarray(nms_jax(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    np.testing.assert_array_equal(np.sort(np.nonzero(mask)[0]), np.sort(keep))


def test_anchor_proposals_cover_grid():
    vr = jnp.ones((1, 2, 2))
    props = np.asarray(gen_anchor_proposals(((4, 4), (2, 2)), vr))
    assert props.shape == (1, 20, 4)
    np.testing.assert_allclose(props[0, 0], [0.125, 0.125, 0.05, 0.05])
    np.testing.assert_allclose(props[0, 16], [0.25, 0.25, 0.1, 0.1])


def test_inverse_sigmoid_roundtrip():
    x = jnp.asarray([0.1, 0.5, 0.9])
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(inverse_sigmoid(x))), np.asarray(x),
        atol=1e-6)


def test_sine_position_embedding_valid_region():
    emb = np.asarray(sine_position_embedding(8, 8, 4, 4, num_pos_feats=8))
    assert emb.shape == (8, 8, 16)
    # padding region embeds are driven by zeroed coords
    assert np.isfinite(emb).all()


def test_upn_end_to_end_proposals(rng):
    upn = UPNWrapper.random_init(cfg=TINY_UPN, swin_cfg=TINY_SWIN)
    img = Image.fromarray(rng.integers(0, 255, (96, 128, 3), dtype=np.uint8))
    # shrink transform for test speed
    arr, (nh, nw) = upn.transform_image(img, short_side=64, max_size=96)
    padded = upn._pad_to_bucket(arr)
    from vlm_fo1_tpu.upn.wrapper import _jit_forward

    out = _jit_forward(upn.params, upn.cfg, upn.swin_cfg,
                       jnp.asarray(padded[None]),
                       jnp.asarray([[nh, nw]], np.int32),
                       "fine_grained_prompt")
    boxes = np.asarray(out["pred_boxes"])
    logits = np.asarray(out["pred_logits"])
    assert boxes.shape == (1, TINY_UPN.num_queries, 4)
    assert logits.shape == (1, TINY_UPN.num_queries, 1)
    assert np.isfinite(boxes).all() and np.isfinite(logits).all()
    assert (boxes >= 0).all() and (boxes <= 1).all()


def test_upn_wrapper_inference_and_filter(rng):
    upn = UPNWrapper.random_init(cfg=TINY_UPN, swin_cfg=TINY_SWIN)
    # monkeypatch transform for speed
    orig = upn.transform_image
    upn.transform_image = lambda img: orig(img, short_side=64, max_size=96)
    img = Image.fromarray(rng.integers(0, 255, (96, 128, 3), dtype=np.uint8))
    raw = upn.inference(img)
    assert raw["original_xyxy_boxes"].shape == (1, TINY_UPN.num_queries, 4)
    s = raw["scores"][0, :, 0]
    assert (np.diff(s) <= 1e-6).all()  # score-sorted
    det = upn.filter(raw, min_score=0.0, nms_value=0.8)
    assert len(det["original_xyxy_boxes"]) == 1
    assert len(det["original_xyxy_boxes"][0]) >= 1
    det2 = upn.filter(raw, min_score=2.0)  # nothing survives
    assert det2["original_xyxy_boxes"] == [[]]  # empty row, not truncation


def test_upn_filter_multi_image_one_empty(rng):
    """Deliberate fix of the reference's truncation bug
    (inference_wrapper.py:209-210): an image with zero above-threshold
    boxes must yield an EMPTY row, not drop all remaining images."""
    upn = UPNWrapper.random_init(cfg=TINY_UPN, swin_cfg=TINY_SWIN)
    nq = TINY_UPN.num_queries
    boxes = rng.uniform(0, 64, (3, nq, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + 8  # valid xyxy
    scores = np.full((3, nq, 1), 0.9, np.float32)
    scores[1] = 0.01  # middle image: everything below threshold
    det = upn.filter({"original_xyxy_boxes": boxes, "scores": scores},
                     min_score=0.5, nms_value=0.8)
    assert len(det["original_xyxy_boxes"]) == 3
    assert len(det["original_xyxy_boxes"][0]) >= 1
    assert det["original_xyxy_boxes"][1] == []
    assert det["scores"][1] == []
    assert len(det["original_xyxy_boxes"][2]) >= 1


def test_upn_config_from_reference_config_dict(tmp_path):
    """The reference's declarative mmengine config (configs/upn_large.py)
    ingests into the typed UPNConfig — both as a dict and as a config .py
    file (Config.fromfile equivalent)."""
    model_cfg = {
        "type": "UPN",
        "num_queries": 900,
        "transformer_cfg": {
            "type": "DeformableTransformer",
            "num_queries": 900,
            "num_feature_levels": 5,
            "encoder_cfg": {
                "type": "UPNEncoder", "d_model": 256, "num_layers": 6,
                "encoder_layer_cfg": {"d_model": 256, "d_ffn": 2048,
                                      "n_heads": 8, "n_levels": 5},
            },
            "decoder_cfg": {"type": "UPNDecoder", "d_model": 256,
                            "num_layers": 6},
        },
        "vision_backbone_cfg": {
            "type": "SwinWrapper", "backbone_cfg": "swin_L_384_22k",
            "position_embedding_cfg": {"num_pos_feats": 128,
                                       "temperatureH": 20,
                                       "temperatureW": 20},
        },
    }
    cfg = UPNConfig.from_config_dict(model_cfg)
    assert cfg == UPNConfig()  # upn_large == our defaults

    py = tmp_path / "upn_large.py"
    py.write_text(f"model = {model_cfg!r}\n")
    assert UPNConfig.from_config_file(str(py)) == UPNConfig()

    # non-default hyperparameters flow through
    model_cfg["transformer_cfg"]["encoder_cfg"]["num_layers"] = 3
    model_cfg["num_queries"] = 300
    cfg2 = UPNConfig.from_config_dict(model_cfg)
    assert cfg2.num_encoder_layers == 3 and cfg2.num_queries == 300


def test_two_stage_proposal_oracle(rng):
    """gen_anchor_proposals + validity masking + inf-filled unsigmoid vs an
    independent numpy port of the reference's gen_encoder_output_proposals
    (detr_utils.py:352-415): grid (g+0.5)/(valid_W, valid_H), wh=0.05*2^lvl,
    valid iff all coords in (0.01, 0.99), inf where padded-or-invalid."""
    shapes = ((6, 8), (3, 4))
    b = 2
    valid_hw = np.array([[21, 29], [24, 32]], np.int32)  # stride-4 level 0
    strides = [4, 8]
    lv = np.stack([np.ceil(valid_hw / s) for s in strides], 1)  # [B, L, 2]
    # valid_ratios in (w, h) order like the model: lvw/W, lvh/H
    vr = np.stack([np.stack([lv[:, i, 1] / w, lv[:, i, 0] / h], -1)
                   for i, (h, w) in enumerate(shapes)], 1).astype(np.float32)
    key_pad = []
    for i, (h, w) in enumerate(shapes):
        mh = np.arange(h)[None, :] >= lv[:, i, 0:1]
        mw = np.arange(w)[None, :] >= lv[:, i, 1:2]
        key_pad.append((mh[:, :, None] | mw[:, None, :]).reshape(b, -1))
    key_pad = np.concatenate(key_pad, 1)

    # ---- numpy oracle (reference semantics)
    props = []
    for lvl, (h, w) in enumerate(shapes):
        gy, gx = np.meshgrid(np.arange(h, dtype=np.float32),
                             np.arange(w, dtype=np.float32), indexing="ij")
        grid = np.stack([gx, gy], -1)[None].repeat(b, 0)        # [B,H,W,2]
        scale = lv[:, lvl, ::-1].astype(np.float32)             # (W, H)
        grid = (grid + 0.5) / scale[:, None, None, :]
        wh = np.full_like(grid, 0.05 * 2.0**lvl)
        props.append(np.concatenate([grid, wh], -1).reshape(b, -1, 4))
    props = np.concatenate(props, 1)
    valid = ((props > 0.01) & (props < 0.99)).all(-1)
    unsig = np.log(props / (1 - props))
    unsig[key_pad | ~valid] = np.inf

    # ---- model composition (the two-stage block of upn_forward)
    got_props = np.asarray(gen_anchor_proposals(shapes, jnp.asarray(vr)))
    got_valid = np.asarray(
        jnp.all((jnp.asarray(got_props) > 0.01)
                & (jnp.asarray(got_props) < 0.99), -1)) & ~key_pad
    got_unsig = np.where(got_valid[..., None],
                         np.asarray(inverse_sigmoid(jnp.asarray(got_props),
                                                    eps=0.0)), np.inf)
    np.testing.assert_allclose(got_props, props, atol=1e-6)
    np.testing.assert_array_equal(got_valid, valid & ~key_pad)
    np.testing.assert_allclose(got_unsig, unsig, atol=1e-5)


def test_ref_point_head_sine_oracle(rng):
    """sineembed_512 vs an independent numpy port of the reference's
    gen_sineembed_for_position (detr_utils.py:276-310): per coordinate,
    128 feats at temperature 10000, sin on even / cos on odd lanes
    interleaved, concatenated in (y, x, w, h) order."""
    from vlm_fo1_tpu.upn.model import sineembed_512

    b, n = 2, 7
    pos = rng.uniform(0.01, 0.99, (b, n, 4)).astype(np.float32)

    def np_emb(c):  # [B, N] -> [B, N, 128]
        dim_t = 10000.0 ** (2 * (np.arange(128) // 2) / 128.0)
        f = c[..., None] * (2 * np.pi) / dim_t
        return np.stack([np.sin(f[..., 0::2]), np.cos(f[..., 1::2])],
                        -1).reshape(b, n, -1)

    want = np.concatenate([np_emb(pos[..., 1]), np_emb(pos[..., 0]),
                           np_emb(pos[..., 2]), np_emb(pos[..., 3])], -1)
    got = np.asarray(sineembed_512(jnp.asarray(pos), d=128))
    assert got.shape == (b, n, 512)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_encoder_reference_points_oracle(rng):
    """_encoder_reference_points vs a numpy port of the reference's
    get_reference_points (upn_encoder.py:194-208): per-level centered grid
    normalized by valid_ratio*size, then scaled per target level."""
    from vlm_fo1_tpu.upn.model import _encoder_reference_points

    shapes = ((4, 6), (2, 3))
    vr = rng.uniform(0.5, 1.0, (2, len(shapes), 2)).astype(np.float32)

    pts = []
    for lvl, (h, w) in enumerate(shapes):
        ry = np.linspace(0.5, h - 0.5, h, dtype=np.float32)
        rx = np.linspace(0.5, w - 0.5, w, dtype=np.float32)
        gy, gx = np.meshgrid(ry, rx, indexing="ij")
        gy = gy.reshape(-1)[None] / (vr[:, None, lvl, 1] * h)
        gx = gx.reshape(-1)[None] / (vr[:, None, lvl, 0] * w)
        pts.append(np.stack([gx, gy], -1))
    ref = np.concatenate(pts, 1)
    want = ref[:, :, None] * vr[:, None]

    got = np.asarray(_encoder_reference_points(shapes, jnp.asarray(vr)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_upn_uint8_bucket_pad_is_zero_in_normalized_space(rng):
    """The reference pads with 0.0 AFTER ImageNet normalization
    (nested_tensor.py nested_tensor_from_tensor_list); the uint8 device
    path must match — a zero uint8 pad would normalize to ~-2 (black) and
    shift boundary-window Swin features on every bucket-padded image."""
    from vlm_fo1_tpu.upn.wrapper import (
        IMAGENET_MEAN,
        IMAGENET_STD,
        _jit_forward,
    )

    upn = UPNWrapper.random_init(cfg=TINY_UPN, swin_cfg=TINY_SWIN)
    arr = rng.integers(0, 255, (70, 90, 3), dtype=np.uint8)
    padded_u8 = upn._pad_to_bucket(arr)          # 128x128 bucket
    assert padded_u8.shape[:2] != arr.shape[:2]  # padding actually happens
    hw = jnp.asarray([[70, 90]], np.int32)
    out_u8 = _jit_forward(upn.params, upn.cfg, upn.swin_cfg,
                          jnp.asarray(padded_u8[None]), hw,
                          "fine_grained_prompt")

    # fp32 oracle: normalize on host, THEN zero-pad (the reference order)
    norm = (arr.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    padded_f = np.zeros(padded_u8.shape, np.float32)
    padded_f[:70, :90] = norm
    out_f = _jit_forward(upn.params, upn.cfg, upn.swin_cfg,
                         jnp.asarray(padded_f[None]), hw,
                         "fine_grained_prompt")
    np.testing.assert_allclose(np.asarray(out_u8["pred_boxes"]),
                               np.asarray(out_f["pred_boxes"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_u8["pred_logits"]),
                               np.asarray(out_f["pred_logits"]),
                               rtol=1e-3, atol=1e-3)


def test_upn_batched_inference_matches_single(rng):
    """Multi-image inference (same-bucket batching + async dispatch) must
    reproduce the per-image results; mixed buckets group correctly."""
    upn = UPNWrapper.random_init(cfg=TINY_UPN, swin_cfg=TINY_SWIN)
    orig = upn.transform_image
    upn.transform_image = lambda img: orig(img, short_side=64, max_size=96)
    imgs = [
        Image.fromarray(rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)),
        Image.fromarray(rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)),
        Image.fromarray(rng.integers(0, 255, (60, 200, 3), dtype=np.uint8)),
        Image.fromarray(rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)),
    ]
    batched = upn.inference(imgs, batch_size=2)
    assert batched["original_xyxy_boxes"].shape == (4, TINY_UPN.num_queries, 4)
    for i, img in enumerate(imgs):
        single = upn.inference(img)
        np.testing.assert_allclose(batched["original_xyxy_boxes"][i],
                                   single["original_xyxy_boxes"][0],
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(batched["scores"][i],
                                   single["scores"][0],
                                   rtol=1e-4, atol=1e-4)
