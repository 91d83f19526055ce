"""ROIAlign numerics: jit kernel vs scalar adaptive reference, plus
analytic cases."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlm_fo1_tpu.ops.roi_align import (
    roi_align,
    roi_align_adaptive,
    roi_align_mean,
)


def test_matches_adaptive_reference_when_ratios_agree(rng):
    """Boxes sized so torchvision's adaptive ratio == our static ratio (2):
    outputs must agree to float precision."""
    feat = rng.standard_normal((16, 16, 5)).astype(np.float32)
    # scaled roi extent in (7, 14] -> ceil(roi/7) == 2 taps per bin
    boxes = np.array([
        [1.0, 2.0, 11.0, 13.0],
        [0.0, 0.0, 13.9, 8.1],
        [3.3, 4.4, 12.2, 12.4],
    ], np.float32)
    ref = roi_align_adaptive(feat, boxes, 7, spatial_scale=1.0)
    out = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes), 7, 1.0,
                               sampling_ratio=2))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_close_to_adaptive_for_larger_boxes(rng):
    """For larger boxes adaptive uses more taps; the 7x7-pooled means must
    still agree closely (this bounds the static-ratio approximation)."""
    feat = rng.standard_normal((32, 32, 4)).astype(np.float32)
    boxes = np.array([[2.0, 2.0, 60.0, 50.0], [0.0, 0.0, 127.0, 100.0]],
                     np.float32)
    scale = 0.25
    ref = roi_align_adaptive(feat, boxes, 7, scale).mean(axis=(1, 2))
    out = np.asarray(roi_align_mean(jnp.asarray(feat), jnp.asarray(boxes),
                                    7, scale, sampling_ratio=2))
    np.testing.assert_allclose(out, ref, atol=0.05, rtol=0.12)


def test_constant_map_gives_constant(rng):
    feat = np.full((10, 12, 3), 2.5, np.float32)
    boxes = np.array([[1.0, 1.0, 8.0, 6.0]], np.float32)
    out = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes), 7, 1.0))
    np.testing.assert_allclose(out, 2.5, atol=1e-6)


def test_linear_ramp_analytic():
    """On f(x,y) = x, bilinear sampling is exact; each bin's average equals
    the bin-centre x coordinate (feature coords = pixel centres)."""
    h = w = 16
    x = np.arange(w, dtype=np.float32)
    feat = np.broadcast_to(x[None, :, None], (h, w, 1)).copy()
    boxes = np.array([[2.0, 2.0, 9.0, 9.0]], np.float32)  # roi_w = 7 -> bin 1px
    out = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes), 7, 1.0))
    exp = 2.0 + np.arange(7) + 0.5  # bin centres at x = 2.5 .. 8.5
    np.testing.assert_allclose(out[0, 3, :, 0], exp, atol=1e-5)


def test_degenerate_box_min_size():
    """Zero-area boxes behave like the reference (roi extent floored at 1)."""
    feat = np.arange(25, dtype=np.float32).reshape(5, 5, 1)
    boxes = np.array([[2.0, 2.0, 2.0, 2.0]], np.float32)
    out = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes), 7, 1.0))
    ref = roi_align_adaptive(feat, boxes, 7, 1.0)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_grad_flows(rng):
    import jax

    feat = jnp.asarray(rng.standard_normal((8, 8, 3)).astype(np.float32))
    boxes = jnp.asarray(np.array([[1.0, 1.0, 6.0, 6.0]], np.float32))

    def loss(f):
        return roi_align_mean(f, boxes, 7, 1.0).sum()

    g = jax.grad(loss)(feat)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_matmul_formulation_equals_gather_oracle(rng):
    """roi_align_mean (scatter-weights + MXU matmul) must match the
    gather-formulation oracle bit-for-bit up to fp32 summation order,
    including out-of-bounds and border-clamped boxes."""
    from vlm_fo1_tpu.ops.roi_align import roi_align_mean_reference

    feat = rng.standard_normal((24, 20, 16)).astype(np.float32)
    boxes = np.array([
        [2.0, 3.0, 15.0, 21.0],
        [0.0, 0.0, 20.0, 24.0],      # full map
        [-5.0, -5.0, 3.0, 3.0],      # partially out of bounds
        [18.0, 22.0, 30.0, 30.0],    # mostly out of bounds
        [5.0, 5.0, 5.4, 5.4],        # degenerate (min 1px)
    ], np.float32)
    got = np.asarray(roi_align_mean(jnp.asarray(feat), jnp.asarray(boxes),
                                    7, 0.5, sampling_ratio=2))
    want = np.asarray(roi_align_mean_reference(
        jnp.asarray(feat), jnp.asarray(boxes), 7, 0.5, sampling_ratio=2))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_matmul_formulation_grad(rng):
    feat = jnp.asarray(rng.standard_normal((12, 12, 8)).astype(np.float32))
    boxes = jnp.asarray(np.array([[1.0, 1.0, 9.0, 10.0]], np.float32))

    g = jax.grad(lambda f: roi_align_mean(f, boxes, 7, 1.0).sum())(feat)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_upsampled_pooling_matches_materialized_resize(rng):
    """roi_align_mean_upsampled composes upsample+sample exactly: must match
    pooling over an actually-materialized jax.image.resize bilinear map."""
    from vlm_fo1_tpu.ops.roi_align import roi_align_mean_upsampled

    for h, w, c, f in [(24, 24, 16, 8), (48, 48, 8, 4), (13, 17, 5, 2)]:
        feat = jnp.asarray(rng.standard_normal((h, w, c)).astype(np.float32))
        up = jax.image.resize(feat, (h * f, w * f, c), method="bilinear")
        boxes = jnp.asarray(np.array([
            [1.0, 1.0, w * f * 2.0, h * f * 2.0],
            [-5.0, -5.0, 9.0, 9.0],
            [0.25 * w * f, 0.25 * h * f, 0.7 * w * f, 0.9 * h * f],
        ], np.float32))
        ref = roi_align_mean(up, boxes, 7, 0.25, sampling_ratio=2)
        got = roi_align_mean_upsampled(feat, boxes, 7, 0.25, upsample=f,
                                       sampling_ratio=2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-6, rtol=1e-5)


def test_separable_exact_adaptive_ratio(rng):
    """roi_align_mean_separable(sampling_ratio=-1) must reproduce
    torchvision's ADAPTIVE sampling ratio exactly (the reference's default:
    roi_align called with no sampling_ratio) — including boxes large enough
    that the adaptive ratio is 4+ taps/bin, where the static-ratio kernel
    only approximates."""
    from vlm_fo1_tpu.ops.roi_align import roi_align_mean_separable

    feat = rng.standard_normal((32, 28, 6)).astype(np.float32)
    scale = 0.25
    boxes = np.array([
        [2.0, 3.0, 40.0, 50.0],        # ratio 2
        [0.0, 0.0, 112.0, 128.0],      # full map: ratio 4
        [-8.0, -8.0, 6.0, 6.0],        # partially out of bounds
        [100.0, 120.0, 140.0, 140.0],  # mostly out of bounds
        [5.0, 5.0, 5.5, 5.5],          # degenerate (min 1 grid unit)
        [1.0, 1.0, 30.0, 126.0],       # anisotropic: ratio (1, 4)
    ], np.float32)
    ref = roi_align_adaptive(feat, boxes, 7, scale).mean(axis=(1, 2))
    got = np.asarray(roi_align_mean_separable(
        jnp.asarray(feat), jnp.asarray(boxes), 7, scale, sampling_ratio=-1))
    np.testing.assert_allclose(got, ref, atol=2e-6, rtol=1e-5)


def test_separable_static_ratio_matches_roi_align_mean(rng):
    from vlm_fo1_tpu.ops.roi_align import roi_align_mean_separable

    feat = rng.standard_normal((24, 20, 16)).astype(np.float32)
    boxes = np.array([
        [2.0, 3.0, 15.0, 21.0],
        [0.0, 0.0, 20.0, 24.0],
        [-5.0, -5.0, 3.0, 3.0],
        [18.0, 22.0, 30.0, 30.0],
    ], np.float32)
    ref = np.asarray(roi_align_mean(jnp.asarray(feat), jnp.asarray(boxes),
                                    7, 0.5, sampling_ratio=2))
    got = np.asarray(roi_align_mean_separable(
        jnp.asarray(feat), jnp.asarray(boxes), 7, 0.5, sampling_ratio=2))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_separable_upsampled_adaptive_matches_materialized(rng):
    """Virtual upsample + adaptive ratio == adaptive-ratio pooling over an
    actually-materialized bilinear resize (the reference aux path:
    F.interpolate then roi_align with default sampling_ratio)."""
    from vlm_fo1_tpu.ops.roi_align import roi_align_mean_separable

    for h, w, c, f in [(24, 24, 5, 8), (12, 16, 3, 2)]:
        feat = rng.standard_normal((h, w, c)).astype(np.float32)
        up = np.asarray(jax.image.resize(jnp.asarray(feat),
                                         (h * f, w * f, c),
                                         method="bilinear"))
        boxes = np.array([
            [1.0, 1.0, w * f * 2.0, h * f * 2.0],
            [-5.0, -5.0, 9.0, 9.0],
            [0.1 * w * f, 0.2 * h * f, 3.1 * w * f, 3.7 * h * f],
        ], np.float32)
        ref = roi_align_adaptive(up, boxes, 7, 0.25).mean(axis=(1, 2))
        got = np.asarray(roi_align_mean_separable(
            jnp.asarray(feat), jnp.asarray(boxes), 7, 0.25,
            sampling_ratio=-1, upsample=f))
        np.testing.assert_allclose(got, ref, atol=2e-6, rtol=2e-5)


def test_separable_grad_flows(rng):
    from vlm_fo1_tpu.ops.roi_align import roi_align_mean_separable

    feat = jnp.asarray(rng.standard_normal((12, 12, 8)).astype(np.float32))
    boxes = jnp.asarray(np.array([[1.0, 1.0, 9.0, 10.0],
                                  [0.0, 0.0, 12.0, 12.0]], np.float32))

    g = jax.grad(lambda f: roi_align_mean_separable(
        f, boxes, 7, 1.0, sampling_ratio=-1).sum())(feat)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_upsampled_pooling_grad_matches_materialized(rng):
    """d(pool over virtual upsample)/d(feat) == d(pool over materialized
    resize)/d(feat) — the composed weights must be the true linearization."""
    from vlm_fo1_tpu.ops.roi_align import roi_align_mean_upsampled

    h, w, c, f = 16, 16, 4, 4
    feat = jnp.asarray(rng.standard_normal((h, w, c)).astype(np.float32))
    boxes = jnp.asarray(np.array([[2.0, 2.0, 50.0, 58.0],
                                  [10.0, 0.0, 63.0, 40.0]], np.float32))

    def via_resize(x):
        up = jax.image.resize(x, (h * f, w * f, c), method="bilinear")
        return roi_align_mean(up, boxes, 7, 0.25, sampling_ratio=2).sum()

    def via_virtual(x):
        return roi_align_mean_upsampled(x, boxes, 7, 0.25, upsample=f,
                                        sampling_ratio=2).sum()

    g_ref = jax.grad(via_resize)(feat)
    g_got = jax.grad(via_virtual)(feat)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               atol=2e-6, rtol=1e-5)
