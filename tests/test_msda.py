"""Multi-scale deformable attention vs a torch grid_sample oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlm_fo1_tpu.ops.msda import ms_deform_attn_core, msda_layer, msda_layer_init

SHAPES = ((6, 8), (3, 4), (2, 2))


def _oracle(value, shapes, loc, weights):
    """Torch bilinear-sample implementation of the MSDA contract: per level,
    grid_sample(align_corners=False, zeros padding) at 2*loc-1, weighted sum
    over (level, point)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    v = torch.tensor(value)     # [B, S, M, D]
    b, s, m, d = v.shape
    locs = torch.tensor(loc)    # [B, Lq, M, L, P, 2]
    w = torch.tensor(weights)   # [B, Lq, M, L, P]
    _, lq, _, nl, p, _ = locs.shape
    out = torch.zeros(b, lq, m, d, dtype=torch.float64)
    start = 0
    for li, (h, wd) in enumerate(shapes):
        lv = v[:, start:start + h * wd]  # [B, HW, M, D]
        start += h * wd
        img = lv.permute(0, 2, 3, 1).reshape(b * m, d, h, wd)
        grid = (2 * locs[:, :, :, li] - 1).permute(0, 2, 1, 3, 4)
        grid = grid.reshape(b * m, lq, p, 2)
        sam = F.grid_sample(img.double(), grid.double(), mode="bilinear",
                            padding_mode="zeros", align_corners=False)
        sam = sam.reshape(b, m, d, lq, p)
        out += torch.einsum("bmdqp,bqmp->bqmd", sam, w[:, :, :, li].double())
    return out.reshape(b, lq, m * d).numpy()


def test_core_matches_grid_sample_oracle(rng):
    b, m, d, lq, p = 2, 2, 4, 5, 3
    s = sum(h * w for h, w in SHAPES)
    value = rng.standard_normal((b, s, m, d)).astype(np.float32)
    loc = rng.uniform(-0.1, 1.1, size=(b, lq, m, len(SHAPES), p, 2)).astype(
        np.float32)  # include out-of-bounds samples
    w = rng.uniform(0, 1, size=(b, lq, m, len(SHAPES), p)).astype(np.float32)
    w = w / w.sum(axis=(-2, -1), keepdims=True)

    ref = _oracle(value, SHAPES, loc, w)
    out = np.asarray(ms_deform_attn_core(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(w)))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_core_grad_finite(rng):
    b, m, d, lq, p = 1, 2, 4, 3, 2
    s = sum(h * w for h, w in SHAPES)
    value = jnp.asarray(rng.standard_normal((b, s, m, d)).astype(np.float32))
    loc = jnp.asarray(rng.uniform(0, 1, (b, lq, m, len(SHAPES), p, 2))
                      .astype(np.float32))
    w = jnp.asarray(np.full((b, lq, m, len(SHAPES), p),
                            1.0 / (len(SHAPES) * p), np.float32))

    def loss(v, l, a):
        return ms_deform_attn_core(v, SHAPES, l, a).sum()

    gv, gl, ga = jax.grad(loss, argnums=(0, 1, 2))(value, loc, w)
    for g in (gv, gl, ga):
        assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(gv)).sum() > 0


def test_msda_layer_shapes_and_reference_points(rng):
    d_model, heads, points = 32, 4, 4
    p = msda_layer_init(jax.random.PRNGKey(0), d_model, len(SHAPES), heads,
                        points)
    b, lq = 2, 7
    s = sum(h * w for h, w in SHAPES)
    q = jnp.asarray(rng.standard_normal((b, lq, d_model)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, d_model)).astype(np.float32))
    # 2d reference points
    ref2 = jnp.asarray(rng.uniform(0, 1, (b, lq, len(SHAPES), 2))
                       .astype(np.float32))
    out2 = msda_layer(p, q, ref2, v, SHAPES, heads, points)
    assert out2.shape == (b, lq, d_model)
    # 4d reference boxes
    ref4 = jnp.asarray(rng.uniform(0.2, 0.5, (b, lq, len(SHAPES), 4))
                       .astype(np.float32))
    out4 = msda_layer(p, q, ref4, v, SHAPES, heads, points)
    assert out4.shape == (b, lq, d_model)
    assert np.isfinite(np.asarray(out2)).all()
    assert np.isfinite(np.asarray(out4)).all()
    # zero-init offsets/weights -> offsets equal the compass bias pattern;
    # masking all values must zero the output (pre output_proj bias)
    mask = jnp.ones((b, s), bool)
    out_masked = msda_layer(p, q, ref2, v, SHAPES, heads, points,
                            key_padding_mask=mask)
    bias = np.asarray(p["output_proj"]["b"])
    np.testing.assert_allclose(np.asarray(out_masked),
                               np.broadcast_to(bias, out_masked.shape),
                               atol=1e-6)


def test_patch_gather_core_matches_row_gather_oracle(rng):
    """The production 2x2-patch-gather core vs the 4x row-gather oracle,
    including out-of-bounds and border windows."""
    from vlm_fo1_tpu.ops.msda import (
        ms_deform_attn_core,
        ms_deform_attn_core_reference,
    )

    shapes = ((6, 8), (3, 4))
    s = sum(h * w for h, w in shapes)
    b, lq, m, p, d = 2, 10, 2, 3, 4
    value = jnp.asarray(rng.standard_normal((b, s, m, d)).astype(np.float32))
    loc = jnp.asarray(rng.uniform(-0.3, 1.3, (b, lq, m, len(shapes), p, 2))
                      .astype(np.float32))
    w = jax.nn.softmax(jnp.asarray(
        rng.standard_normal((b, lq, m, len(shapes) * p)).astype(np.float32))
    ).reshape(b, lq, m, len(shapes), p)
    got = np.asarray(ms_deform_attn_core(value, shapes, loc, w))
    want = np.asarray(ms_deform_attn_core_reference(value, shapes, loc, w))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    # gradients flow through the patch gather (scatter-add transpose)
    g = jax.grad(lambda v: ms_deform_attn_core(v, shapes, loc, w).sum())(value)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
