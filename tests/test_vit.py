"""Numerical parity of the padded-window ViT vs the HF Qwen2.5-VL ViT
(oracle: installed transformers, tiny config, shared random weights)."""

import numpy as np
import pytest

from vlm_fo1_tpu.checkpoint import convert_vision_tower, to_device_tree
from vlm_fo1_tpu.config import ViTConfig
from vlm_fo1_tpu.models.vit import captures_to_feature_map, vit_forward
from vlm_fo1_tpu.preprocess.windowing import build_vit_plan, pad_pixel_values

CFG = ViTConfig(depth=4, hidden_size=32, intermediate_size=48, num_heads=2,
                out_hidden_size=24, fullatt_block_indexes=(1, 3))


def _hf_model():
    torch = pytest.importorskip("torch")
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLVisionConfig,
    )
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VisionTransformerPretrainedModel,
    )

    cfg = Qwen2_5_VLVisionConfig(
        depth=CFG.depth, hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size, num_heads=CFG.num_heads,
        out_hidden_size=CFG.out_hidden_size,
        fullatt_block_indexes=list(CFG.fullatt_block_indexes),
    )
    cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    model = Qwen2_5_VisionTransformerPretrainedModel(cfg)
    model.eval()
    return model


@pytest.mark.parametrize("grid", [(1, 6, 10), (1, 8, 8), (1, 2, 14)])
def test_vit_matches_hf(grid, rng):
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    model = _hf_model()
    t, gh, gw = grid
    seq = t * gh * gw
    pv = rng.standard_normal((seq, CFG.patch_dim)).astype(np.float32)

    with torch.no_grad():
        hf_out = model(torch.tensor(pv), grid_thw=torch.tensor([list(grid)]))
    hf_out = hf_out.numpy()  # [S/4, out] original unit order

    # capture full-attention block outputs via hooks (reference captures the
    # same tensors with its GATHER monkey patch, qwen2_5_vl_encoder.py:148-152)
    hf_caps = []
    hooks = [
        model.blocks[i].register_forward_hook(
            lambda m, args, out: hf_caps.append(out.detach().numpy()))
        for i in CFG.fullatt_block_indexes
    ]
    with torch.no_grad():
        model(torch.tensor(pv), grid_thw=torch.tensor([list(grid)]))
    for h in hooks:
        h.remove()

    params = to_device_tree(
        convert_vision_tower(
            {k: v.numpy() for k, v in model.state_dict().items()}, CFG),
        dtype=jnp.float32)
    plan = build_vit_plan(grid, CFG)
    padded = pad_pixel_values(pv, plan)[None]  # [1, P, patch_dim]

    import jax
    fwd = jax.jit(vit_forward, static_argnames=("cfg", "num_windows",
                                                "capture_multi_level"))
    tokens, captures = fwd(
        params, CFG, jnp.asarray(padded),
        jnp.asarray(plan.rot_cos), jnp.asarray(plan.rot_sin),
        jnp.asarray(plan.valid), num_windows=plan.num_windows,
        inv_unit_idx=jnp.asarray(plan.inv_unit_idx))

    np.testing.assert_allclose(np.asarray(tokens[0]), hf_out,
                               atol=2e-4, rtol=1e-3)

    # multi-level capture parity: compare in original token order
    ours = np.concatenate([np.asarray(c[0]) for c in captures], axis=-1)
    ours = ours[plan.inv_token_idx]
    # HF captures are window-packed (no pads); un-permute via plan mapping:
    # valid padded slots list real tokens in HF's packed order
    hf_cat = np.concatenate(hf_caps, axis=-1)
    hf_orig = np.empty_like(hf_cat)
    packed_order = plan.gather_idx[plan.valid]  # source token per packed slot
    hf_orig[packed_order] = hf_cat
    np.testing.assert_allclose(ours, hf_orig, atol=2e-4, rtol=1e-3)


def test_captures_to_feature_map_layout():
    import jax.numpy as jnp

    grid = (1, 4, 6)
    plan = build_vit_plan(grid, CFG)
    # encode each token's (h, w) position as its feature value
    t, gh, gw = grid
    h = np.arange(gh).repeat(gw).astype(np.float32)
    w = np.tile(np.arange(gw), gh).astype(np.float32)
    # original token order is (h_block, w_block, mh, mw)
    hb = (np.arange(gh // 2).repeat(gw // 2))
    wb = np.tile(np.arange(gw // 2), gh // 2)
    feats = np.zeros((plan.seq, 2), np.float32)
    k = 0
    for b in range(len(hb)):
        for mh in range(2):
            for mw in range(2):
                feats[b * 4 + mh * 2 + mw] = [hb[b] * 2 + mh, wb[b] * 2 + mw]
                k += 1
    padded = feats[plan.gather_idx][None]
    fmap = captures_to_feature_map([jnp.asarray(padded)],
                                   jnp.asarray(plan.inv_token_idx), grid)
    fmap = np.asarray(fmap[0])  # [gh, gw, 2]
    exp_h, exp_w = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
    np.testing.assert_array_equal(fmap[..., 0], exp_h)
    np.testing.assert_array_equal(fmap[..., 1], exp_w)
