"""Native C++ preprocessing vs the numpy reference (bit-level parity)."""

import numpy as np
import pytest

from vlm_fo1_tpu.native import (
    get_lib,
    normalize_chw_native,
    qwen_patchify_native,
)
from vlm_fo1_tpu.preprocess.image import (
    AUX_IMAGE_MEAN,
    AUX_IMAGE_STD,
    QWEN_IMAGE_MEAN,
    QWEN_IMAGE_STD,
    _normalize,
)

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native toolchain unavailable")


def _numpy_patchify(raw, patch, merge, temporal, mean, std):
    arr = _normalize(raw, mean, std)
    chw = arr.transpose(2, 0, 1)
    frames = np.broadcast_to(chw, (temporal, *chw.shape))
    h, w = raw.shape[:2]
    gh, gw = h // patch, w // patch
    c = 3
    p = frames.reshape(1, temporal, c, gh // merge, merge, patch,
                       gw // merge, merge, patch)
    p = p.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    return np.ascontiguousarray(p).reshape(gh * gw,
                                           c * temporal * patch * patch)


def test_patchify_matches_numpy(rng):
    raw = rng.integers(0, 255, size=(56, 84, 3), dtype=np.uint8)
    ref = _numpy_patchify(raw, 14, 2, 2, QWEN_IMAGE_MEAN, QWEN_IMAGE_STD)
    out = qwen_patchify_native(raw, 14, 2, 2, QWEN_IMAGE_MEAN, QWEN_IMAGE_STD)
    assert out is not None
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_normalize_chw_matches_numpy(rng):
    raw = rng.integers(0, 255, size=(32, 48, 3), dtype=np.uint8)
    ref = _normalize(raw, AUX_IMAGE_MEAN, AUX_IMAGE_STD).transpose(2, 0, 1)
    out = normalize_chw_native(raw, AUX_IMAGE_MEAN, AUX_IMAGE_STD)
    assert out is not None
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_pipeline_uses_native(rng):
    """qwen_image_preprocess output unchanged with the native path active."""
    from PIL import Image

    from vlm_fo1_tpu.preprocess.image import qwen_image_preprocess

    img = Image.fromarray(rng.integers(0, 255, (100, 130, 3), dtype=np.uint8))
    pv, grid = qwen_image_preprocess(img)
    assert pv.dtype == np.float32
    assert pv.shape[0] == grid[1] * grid[2]


def test_raw_patchify_native_matches_numpy(rng):
    """The C++ raw-u8 patchify (device-normalize path) must be bit-exact
    vs the numpy layout transform."""
    from PIL import Image

    import vlm_fo1_tpu.native as native
    from vlm_fo1_tpu.preprocess.image import qwen_image_patchify_u8

    if native.get_lib() is None:
        pytest.skip("no native toolchain")

    img = Image.fromarray(rng.integers(0, 255, (112, 140, 3), dtype=np.uint8))
    got, grid = qwen_image_patchify_u8(img, max_pixels=512 * 512)
    assert got.dtype == np.uint8

    raw = np.asarray(img.resize((140, 112), Image.Resampling.BICUBIC),
                     np.uint8)
    chw = raw.transpose(2, 0, 1)
    frames = np.broadcast_to(chw, (2, *chw.shape))
    gh, gw = 112 // 14, 140 // 14
    patches = frames.reshape(1, 2, 3, gh // 2, 2, 14, gw // 2, 2, 14
                             ).transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    want = np.ascontiguousarray(patches).reshape(gh * gw, 3 * 2 * 14 * 14)
    np.testing.assert_array_equal(got, want)
