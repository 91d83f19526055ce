"""ViT window-plan invariants + equivalence with the HF implementation's
window ordering (oracle: installed transformers, tiny config)."""

import numpy as np
import pytest

from vlm_fo1_tpu.config import ViTConfig
from vlm_fo1_tpu.preprocess.windowing import build_vit_plan, pad_pixel_values


CFG = ViTConfig(depth=2, hidden_size=32, intermediate_size=64, num_heads=2,
                out_hidden_size=16, fullatt_block_indexes=(1,))


@pytest.mark.parametrize("grid", [(1, 16, 16), (1, 18, 26), (1, 2, 2), (2, 8, 10)])
def test_plan_roundtrip(grid):
    plan = build_vit_plan(grid, CFG)
    t, gh, gw = grid
    seq = t * gh * gw
    assert plan.seq == seq
    assert plan.valid.sum() == seq
    assert plan.seq_pad == plan.num_windows * plan.window_tokens
    # gather then inverse-gather is the identity on real tokens
    x = np.arange(seq)
    padded = x[plan.gather_idx]
    recovered = padded[plan.inv_token_idx]
    np.testing.assert_array_equal(recovered, x)
    # every real token appears exactly once among valid slots
    vals = padded[plan.valid]
    assert sorted(vals.tolist()) == list(range(seq))


def _hf_vision_model():
    import torch  # noqa: F401
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLVisionConfig,
    )
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VisionTransformerPretrainedModel,
    )

    cfg = Qwen2_5_VLVisionConfig(
        depth=1, hidden_size=32, intermediate_size=64, num_heads=2,
        out_hidden_size=16, fullatt_block_indexes=[0],
    )
    cfg._attn_implementation = "eager"
    return Qwen2_5_VisionTransformerPretrainedModel(cfg)


@pytest.mark.parametrize("grid", [(1, 16, 16), (1, 18, 26), (2, 8, 10)])
def test_window_order_matches_hf(grid):
    """Our padded-window layout visits merge units in exactly the HF window
    order once padding slots are removed."""
    torch = pytest.importorskip("torch")
    model = _hf_vision_model()
    grid_thw = torch.tensor([list(grid)])
    hf_index, hf_cu = model.get_window_index(grid_thw)

    plan = build_vit_plan(grid, CFG)
    mu = 4
    padded_units = plan.gather_idx.reshape(-1, mu)[:, 0] // mu
    valid_units = plan.valid.reshape(-1, mu)[:, 0]
    ours = padded_units[valid_units]
    np.testing.assert_array_equal(ours, hf_index.numpy())

    # HF per-window real-token counts == our per-window valid counts
    hf_cu = np.unique(np.asarray(hf_cu))
    hf_lens = np.diff(hf_cu)
    ours_lens = plan.valid.reshape(plan.num_windows, plan.window_tokens).sum(1)
    np.testing.assert_array_equal(ours_lens[ours_lens > 0],
                                  hf_lens[hf_lens > 0])


@pytest.mark.parametrize("grid", [(1, 16, 16), (1, 6, 10)])
def test_rotary_matches_hf(grid):
    torch = pytest.importorskip("torch")
    model = _hf_vision_model()
    grid_thw = torch.tensor([list(grid)])
    rot = model.rot_pos_emb(grid_thw)  # [S, head_dim/2] in original order
    emb = torch.cat([rot, rot], dim=-1)
    hf_cos = emb.cos().numpy()

    plan = build_vit_plan(grid, CFG)
    # ours is stored in padded-window order; map back to original order
    ours_cos = plan.rot_cos[plan.inv_token_idx]
    np.testing.assert_allclose(ours_cos, hf_cos, atol=1e-5)


def test_pad_pixel_values_layout(rng):
    plan = build_vit_plan((1, 6, 10), CFG)
    pv = rng.standard_normal((plan.seq, 12)).astype(np.float32)
    padded = pad_pixel_values(pv, plan)
    assert padded.shape == (plan.seq_pad, 12)
    np.testing.assert_array_equal(padded[plan.inv_token_idx], pv)
