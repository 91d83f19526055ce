"""Video preprocessing + temporal ViT plan tests."""

import numpy as np
import pytest
from PIL import Image

from vlm_fo1_tpu.config import ViTConfig
from vlm_fo1_tpu.preprocess.image import qwen_video_preprocess
from vlm_fo1_tpu.preprocess.windowing import build_vit_plan


def _frames(rng, n, w=112, h=84):
    return [Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
            for _ in range(n)]


def test_video_preprocess_matches_hf(rng):
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        Qwen2VLImageProcessor,
    )

    frames = _frames(rng, 4)
    proc = Qwen2VLImageProcessor(min_pixels=56 * 56, max_pixels=1024 * 1024)
    ref = proc(images=None, videos=[frames], return_tensors="np")
    pv, grid = qwen_video_preprocess(frames)
    assert tuple(ref["video_grid_thw"][0]) == grid
    ref_pv = np.asarray(ref["pixel_values_videos"], np.float32)
    assert np.mean(np.abs(pv - ref_pv) < 1e-3) > 0.99


def test_video_odd_frames_padded(rng):
    pv, grid = qwen_video_preprocess(_frames(rng, 3))
    assert grid[0] == 2  # 3 frames -> repeat last -> 2 temporal patches


def test_temporal_plan(rng):
    cfg = ViTConfig(depth=2, hidden_size=32, intermediate_size=64,
                    num_heads=2, out_hidden_size=16,
                    fullatt_block_indexes=(1,))
    frames = _frames(rng, 4)
    pv, grid = qwen_video_preprocess(frames)
    plan = build_vit_plan(grid, cfg)
    assert plan.seq == grid[0] * grid[1] * grid[2]
    assert plan.valid.sum() == plan.seq
    x = np.arange(plan.seq)
    np.testing.assert_array_equal(x[plan.gather_idx][plan.inv_token_idx], x)
