"""M-RoPE position-id computation vs the HF implementation (oracle)."""

import numpy as np
import pytest

from vlm_fo1_tpu.preprocess.mrope import get_rope_index


def _hf_rope_index(input_ids, image_grid_thw, attention_mask=None):
    torch = pytest.importorskip("torch")
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLConfig,
    )
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VLForConditionalGeneration,
    )

    cfg = Qwen2_5_VLConfig(
        vocab_size=1000, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        vision_config=dict(depth=1, hidden_size=32, intermediate_size=64,
                           num_heads=2, out_hidden_size=32),
        rope_scaling={"type": "mrope", "mrope_section": [2, 1, 1]},
    )
    model = Qwen2_5_VLForConditionalGeneration(cfg)
    ids = torch.tensor(input_ids)
    grid = (torch.tensor(image_grid_thw) if image_grid_thw is not None else None)
    mask = torch.tensor(attention_mask) if attention_mask is not None else None
    obj = model if hasattr(model, "get_rope_index") else model.model
    pos, deltas = obj.get_rope_index(ids, grid, None, attention_mask=mask)
    return pos.numpy(), deltas.numpy()


IMG = 151655
VSTART = 151652


def _seq_with_image(grid, n_pre=5, n_post=7):
    t, gh, gw = grid
    span = t * (gh // 2) * (gw // 2)
    return ([100 + i for i in range(n_pre)] + [VSTART] + [IMG] * span
            + [151653] + [200 + i for i in range(n_post)])


@pytest.mark.parametrize("grid", [(1, 4, 6), (1, 8, 8)])
def test_rope_index_matches_hf_single_image(grid):
    ids = [_seq_with_image(grid)]
    ref_pos, ref_deltas = _hf_rope_index(ids, [list(grid)])
    pos, deltas = get_rope_index(np.asarray(ids), [grid])
    np.testing.assert_array_equal(pos, ref_pos)
    np.testing.assert_array_equal(deltas, ref_deltas)


def test_rope_index_matches_hf_two_images():
    g1, g2 = (1, 4, 4), (1, 2, 6)
    ids = [_seq_with_image(g1) + _seq_with_image(g2, n_pre=2, n_post=3)]
    ref_pos, ref_deltas = _hf_rope_index(ids, [list(g1), list(g2)])
    pos, deltas = get_rope_index(np.asarray(ids), [g1, g2])
    np.testing.assert_array_equal(pos, ref_pos)
    np.testing.assert_array_equal(deltas, ref_deltas)


def test_rope_index_text_only():
    ids = np.arange(100, 112)[None]
    ref_pos, ref_deltas = _hf_rope_index(ids.tolist(), None)
    pos, deltas = get_rope_index(ids, None)
    np.testing.assert_array_equal(pos, ref_pos)
    np.testing.assert_array_equal(deltas, ref_deltas)


def test_rope_index_with_left_padding():
    grid = (1, 4, 4)
    core = _seq_with_image(grid)
    pad = 4
    ids = [[0] * pad + core]
    mask = [[0] * pad + [1] * len(core)]
    ref_pos, ref_deltas = _hf_rope_index(ids, [list(grid)], mask)
    pos, deltas = get_rope_index(np.asarray(ids), [grid],
                                 attention_mask=np.asarray(mask))
    np.testing.assert_array_equal(pos, ref_pos)
    np.testing.assert_array_equal(deltas, ref_deltas)
