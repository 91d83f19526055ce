"""HFRE region encoder: sine embedding semantics, upsample parity with
torch, end-to-end shapes and combination layout."""

import numpy as np
import pytest

import jax.numpy as jnp

from vlm_fo1_tpu.config import HFREConfig
from vlm_fo1_tpu.models.hfre import (
    gen_sineembed_for_position,
    hfre_forward,
    upsample_concat_aux,
)


def _sineembed_scalar(pos, dim):
    """Independent scalar recompute of the reference formula
    (hybrid...:55-103): per coord, interleaved (sin even / cos odd) over
    dim_t = 10000^(2*(i//2)/dim), concatenated (y, x, w, h)."""
    n = pos.shape[0]
    out = np.zeros((n, 4 * dim), np.float64)
    dim_t = 10000.0 ** (2 * (np.arange(dim) // 2) / dim)
    order = [1, 0, 2, 3]  # y, x, w, h
    for i in range(n):
        for oi, c in enumerate(order):
            f = pos[i, c] * 2 * np.pi / dim_t
            vals = []
            for j in range(0, dim, 2):
                vals.append(np.sin(f[j]))
                vals.append(np.cos(f[j + 1]))
            out[i, oi * dim:(oi + 1) * dim] = vals
    return out.astype(np.float32)


def test_sineembed_matches_scalar_reference(rng):
    pos = rng.uniform(0, 1, size=(3, 4)).astype(np.float32)
    ref = _sineembed_scalar(pos, 8)
    out = np.asarray(gen_sineembed_for_position(jnp.asarray(pos), 8))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_upsample_matches_torch_interpolate(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    maps = [rng.standard_normal((1, s, s, 3)).astype(np.float32)
            for s in (16, 8, 4, 2)]
    ours = np.asarray(upsample_concat_aux([jnp.asarray(m) for m in maps]))
    refs = [maps[0]]
    for m in maps[1:]:
        t = torch.tensor(m.transpose(0, 3, 1, 2))
        r = F.interpolate(t, size=(16, 16), mode="bilinear",
                          align_corners=False)
        refs.append(r.numpy().transpose(0, 2, 3, 1))
    ref = np.concatenate(refs, axis=-1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def _toy_cfg():
    return HFREConfig(
        roi_output_size=7,
        region_feature_dim=16 + 8,  # aux 16 + vt 8; //4 must stay even
        vt_region_feature_dim=8,
        vt_spatial_scale=1.0 / 14,
        aux_region_feature_dims=(4, 12),
        aux_spatial_scale=0.25,
    )


def test_hfre_concat_layout(rng):
    """aux features occupy the leading channels, vt the trailing ones."""
    cfg = _toy_cfg()
    aux = jnp.asarray(np.full((24, 24, 16), 3.0, np.float32))
    vt = jnp.asarray(np.full((10, 12, 8), 7.0, np.float32))
    boxes_aux = jnp.asarray(np.array([[4.0, 4.0, 40.0, 40.0]], np.float32))
    boxes_vt = jnp.asarray(np.array([[10.0, 10.0, 80.0, 80.0]], np.float32))
    cfg_nopos = HFREConfig(**{**cfg.__dict__, "apply_position_embedding": False})
    out = np.asarray(hfre_forward({}, cfg_nopos, aux, boxes_aux, vt, boxes_vt))
    assert out.shape == (1, 24)
    np.testing.assert_allclose(out[0, :16], 3.0, atol=1e-5)
    np.testing.assert_allclose(out[0, 16:], 7.0, atol=1e-5)


def test_hfre_position_embedding_added(rng):
    cfg = _toy_cfg()
    aux = jnp.asarray(rng.standard_normal((24, 24, 16)).astype(np.float32))
    vt = jnp.asarray(rng.standard_normal((10, 12, 8)).astype(np.float32))
    ba = jnp.asarray(np.array([[4.0, 4.0, 40.0, 40.0]], np.float32))
    bv = jnp.asarray(np.array([[10.0, 10.0, 80.0, 80.0]], np.float32))
    cfg_nopos = HFREConfig(**{**cfg.__dict__, "apply_position_embedding": False})
    base = np.asarray(hfre_forward({}, cfg_nopos, aux, ba, vt, bv))
    out = np.asarray(hfre_forward({}, cfg, aux, ba, vt, bv))
    # difference must equal the sine embedding of the vt box
    gh, gw = 10, 12
    img_w, img_h = gw / cfg.vt_spatial_scale, gh / cfg.vt_spatial_scale
    b = np.asarray(bv)[0]
    w, h = (b[2] - b[0]) / img_w, (b[3] - b[1]) / img_h
    cx, cy = b[0] / img_w + w / 2, b[1] / img_h + h / 2
    emb = np.asarray(gen_sineembed_for_position(
        jnp.asarray(np.array([[cx, cy, w, h]], np.float32)),
        cfg.region_feature_dim // 4))
    np.testing.assert_allclose(out - base, emb, atol=1e-5)


def test_hfre_mean_combination(rng):
    cfg = _toy_cfg()
    cfg = HFREConfig(**{**cfg.__dict__, "apply_position_embedding": False,
                        "region_feature_combination": "mean",
                        "vt_region_feature_dim": 16,
                        "region_feature_dim": 16})
    aux = jnp.asarray(np.full((24, 24, 16), 2.0, np.float32))
    vt = jnp.asarray(np.full((10, 12, 16), 4.0, np.float32))
    ba = jnp.asarray(np.array([[4.0, 4.0, 40.0, 40.0]], np.float32))
    bv = jnp.asarray(np.array([[10.0, 10.0, 80.0, 80.0]], np.float32))
    out = np.asarray(hfre_forward({}, cfg, aux, ba, vt, bv))
    np.testing.assert_allclose(out, 3.0, atol=1e-5)


def test_simple_fpn_shapes(rng):
    import jax

    from vlm_fo1_tpu.models.simple_fpn import (
        init_simple_fpn_params,
        simple_fpn_forward,
    )

    params = init_simple_fpn_params(jax.random.PRNGKey(0), dim=32,
                                    out_channels=16)
    x = jnp.asarray(rng.standard_normal((1, 8, 12, 32)).astype(np.float32))
    outs = simple_fpn_forward(params, x)
    assert [tuple(o.shape) for o in outs] == [
        (1, 32, 48, 16), (1, 16, 24, 16), (1, 8, 12, 16), (1, 4, 6, 16)]
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()


def test_hfre_simple_fpn_path(rng):
    import jax

    from vlm_fo1_tpu.models.simple_fpn import init_simple_fpn_params

    cfg = HFREConfig(
        roi_output_size=7,
        region_feature_dim=16 + 4 * 16,
        vt_region_feature_dim=4 * 16,
        use_simple_fpn_for_vt=True,
        apply_position_embedding=False,
        aux_region_feature_dims=(4, 12),
        aux_spatial_scale=0.25,
    )
    params = {"simple_fpn": init_simple_fpn_params(jax.random.PRNGKey(0),
                                                   dim=32, out_channels=16)}
    aux = jnp.asarray(rng.standard_normal((24, 24, 16)).astype(np.float32))
    vt = jnp.asarray(rng.standard_normal((8, 12, 32)).astype(np.float32))
    ba = jnp.asarray(np.array([[4.0, 4.0, 40.0, 40.0]], np.float32))
    bv = jnp.asarray(np.array([[10.0, 10.0, 80.0, 80.0]], np.float32))
    out = hfre_forward(params, cfg, aux, ba, vt, bv)
    assert out.shape == (1, 16 + 64)
    assert np.isfinite(np.asarray(out)).all()


def test_per_level_roi_equals_concat_roi(rng):
    """roi_align_aux_levels must equal ROIAlign over the concatenated
    upsampled map (channel independence of ROIAlign)."""
    from vlm_fo1_tpu.models.hfre import roi_align_aux_levels
    from vlm_fo1_tpu.ops.roi_align import roi_align_mean_separable

    cfg = _toy_cfg()
    maps = [jnp.asarray(rng.standard_normal((16 // (2 ** i), 16 // (2 ** i),
                                             4 * (i + 1))).astype(np.float32))
            for i in range(3)]
    boxes = jnp.asarray(np.array([[3.0, 5.0, 50.0, 40.0],
                                  [0.0, 0.0, 64.0, 64.0]], np.float32))
    per_level = np.asarray(roi_align_aux_levels(maps, boxes, cfg))
    concat = upsample_concat_aux([m[None] for m in maps])[0]
    ref = np.asarray(roi_align_mean_separable(
        concat, boxes, cfg.roi_output_size, cfg.aux_spatial_scale,
        sampling_ratio=cfg.roi_sampling_ratio))
    np.testing.assert_allclose(per_level, ref, atol=1e-5)


def test_feature_map_pos_embedding(rng):
    cfg = HFREConfig(**{**_toy_cfg().__dict__,
                        "pos_embedding_strategy": "feature_map_based"})
    maps = [jnp.asarray(rng.standard_normal((24, 24, 4)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((12, 12, 12)).astype(np.float32))]
    vt = jnp.asarray(rng.standard_normal((10, 12, 8)).astype(np.float32))
    ba = jnp.asarray(np.array([[4.0, 4.0, 40.0, 40.0]], np.float32))
    bv = jnp.asarray(np.array([[10.0, 10.0, 80.0, 80.0]], np.float32))
    out = hfre_forward({}, cfg, maps, ba, vt, bv)
    assert out.shape == (1, 24)
    assert np.isfinite(np.asarray(out)).all()
    # differs from the no-pos path
    cfg_np = HFREConfig(**{**cfg.__dict__, "apply_position_embedding": False})
    base = hfre_forward({}, cfg_np, maps, ba, vt, bv)
    assert np.abs(np.asarray(out) - np.asarray(base)).max() > 1e-5


def test_sep_pos_combination(rng):
    cfg = HFREConfig(**{**_toy_cfg().__dict__,
                        "region_feature_combination": "concat_sep_pos"})
    maps = [jnp.asarray(rng.standard_normal((24, 24, 16)).astype(np.float32))]
    vt = jnp.asarray(rng.standard_normal((10, 12, 8)).astype(np.float32))
    ba = jnp.asarray(np.array([[4.0, 4.0, 40.0, 40.0]], np.float32))
    bv = jnp.asarray(np.array([[10.0, 10.0, 80.0, 80.0]], np.float32))
    out = hfre_forward({}, cfg, maps, ba, vt, bv)
    assert out.shape == (1, 24)
    assert np.isfinite(np.asarray(out)).all()
