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
