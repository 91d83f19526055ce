"""Preprocessing parity vs the installed HuggingFace processors (oracle)."""

import numpy as np
import pytest
from PIL import Image

from vlm_fo1_tpu.preprocess.image import (
    adjust_bbox,
    aux_image_preprocess,
    qwen_image_preprocess,
    resize_shortest_edge_images_and_bboxes,
    smart_resize,
)


def _rand_image(rng, w, h):
    arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
    return Image.fromarray(arr)


@pytest.mark.parametrize("w,h", [(640, 480), (333, 517), (56, 56), (900, 120)])
def test_qwen_preprocess_matches_hf(rng, w, h):
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        Qwen2VLImageProcessor,
    )

    img = _rand_image(rng, w, h)
    proc = Qwen2VLImageProcessor(min_pixels=56 * 56, max_pixels=2048 * 2048)
    ref = proc(images=img, videos=None, return_tensors="np")
    pv, grid = qwen_image_preprocess(img)

    assert tuple(ref["image_grid_thw"][0]) == grid
    ref_pv = np.asarray(ref["pixel_values"], np.float32)
    np.testing.assert_allclose(pv, ref_pv, atol=2e-2, rtol=0)
    # the bulk of values must match almost exactly (resampling edge wobble ok)
    frac_close = np.mean(np.abs(pv - ref_pv) < 1e-3)
    assert frac_close > 0.99


def test_aux_preprocess_shape_and_stats(rng):
    img = _rand_image(rng, 640, 480)
    out = aux_image_preprocess(img, image_size=768)
    assert out.shape == (3, 768, 768)
    # uniform random uint8 image: normalised means should sit near
    # (0.5 - mean)/std per channel
    exp = (127.5 / 255.0 - np.array([0.485, 0.456, 0.406])) / np.array(
        [0.229, 0.224, 0.225])
    np.testing.assert_allclose(out.mean(axis=(1, 2)), exp, atol=0.05)


def test_smart_resize_bounds():
    for h, w in [(480, 640), (5000, 5000), (28, 28), (100, 3000)]:
        nh, nw = smart_resize(h, w)
        assert nh % 28 == 0 and nw % 28 == 0
        assert 56 * 56 <= nh * nw <= 2048 * 2048


def test_shortest_edge_resize_caps_long_side(rng):
    img = _rand_image(rng, 4096, 1024)
    boxes = [[0.0, 0.0, 4096.0, 1024.0], [100.0, 100.0, 200.0, 300.0]]
    out_imgs, out_boxes = resize_shortest_edge_images_and_bboxes([img], boxes)
    assert max(out_imgs[0].size) <= 2048
    sx = out_imgs[0].size[0] / 4096
    np.testing.assert_allclose(out_boxes[0], [0, 0, 4096 * sx, 1024 * sx],
                               rtol=1e-3, atol=2)


def test_small_image_not_resized(rng):
    img = _rand_image(rng, 640, 480)
    out_imgs, out_boxes = resize_shortest_edge_images_and_bboxes(
        [img], [[1.0, 2.0, 3.0, 4.0]])
    assert out_imgs[0].size == (640, 480)
    assert out_boxes == [[1.0, 2.0, 3.0, 4.0]]


def test_adjust_bbox_clamps_and_scales():
    boxes = [[-10, 5, 700, 500]]
    out = adjust_bbox(boxes, original_h=480, original_w=640,
                      resize_h=768, resize_w=768)
    x1, y1, x2, y2 = out[0]
    assert x1 == 0
    assert abs(x2 - 768) < 1e-6
    assert abs(y2 - 768) < 1e-6
    assert abs(y1 - 5 * 768 / 480) < 1e-6


def test_u8_patchify_plus_device_normalize_matches_host(rng):
    """qwen_image_patchify_u8 + the on-device /255-mean-std affine must
    reproduce qwen_image_preprocess (host fp32 normalize) exactly."""
    from PIL import Image

    import jax.numpy as jnp

    from vlm_fo1_tpu.preprocess.image import (
        AUX_IMAGE_MEAN,
        AUX_IMAGE_STD,
        aux_image_preprocess,
        aux_image_u8,
        qwen_image_patchify_u8,
        qwen_image_preprocess,
        qwen_patch_norm_vectors,
    )

    img = Image.fromarray(rng.integers(0, 255, (90, 130, 3), dtype=np.uint8))
    want, grid_w = qwen_image_preprocess(img, max_pixels=128 * 128)
    u8, grid_u = qwen_image_patchify_u8(img, max_pixels=128 * 128)
    assert grid_w == grid_u and u8.dtype == np.uint8
    mean, std = qwen_patch_norm_vectors()
    got = (np.asarray(u8, np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(got, want, atol=1e-6)

    aux_w = aux_image_preprocess(img, 96)           # [C, H, W] fp32
    aux_u = aux_image_u8(img, 96)                   # [H, W, C] uint8
    got = ((aux_u.astype(np.float32) / 255.0 - AUX_IMAGE_MEAN)
           / AUX_IMAGE_STD).transpose(2, 0, 1)
    np.testing.assert_allclose(got, aux_w, atol=1e-6)
