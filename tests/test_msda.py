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


def _interp():
    """Interpret on CPU; compile for real when the suite runs on the chip
    (VLM_FO1_TEST_ON_TPU=1). The pallas interpreter's dots on the TPU
    backend do NOT honor the kernel's pinned precisions, so interpret-mode
    parity at f32 tolerance only holds on CPU."""
    return jax.default_backend() == "cpu"


def test_pallas_core_matches_xla_core(rng):
    """The Pallas TPU kernel (interpret mode on CPU) vs the XLA gather core,
    including out-of-bounds windows, D=32 quad packing, and query counts that
    don't divide the block size."""
    from vlm_fo1_tpu.ops.msda_pallas import ms_deform_attn_core_fast

    shapes = ((6, 8), (3, 4), (2, 2))
    s = sum(h * w for h, w in shapes)
    b, lq, m, p, d = 2, 37, 2, 4, 32
    value = rng.standard_normal((b, s, m, d)).astype(np.float32)
    loc = rng.uniform(-0.3, 1.3, (b, lq, m, len(shapes), p, 2)).astype(
        np.float32)
    w = np.asarray(jax.nn.softmax(jnp.asarray(
        rng.standard_normal((b, lq, m, len(shapes) * p)).astype(np.float32))
    ).reshape(b, lq, m, len(shapes), p))

    want = np.asarray(ms_deform_attn_core(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w)))
    got = np.asarray(ms_deform_attn_core_fast(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w),
        _interp(), 16))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    # bf16 values (the production UPN dtype)
    want_b = np.asarray(ms_deform_attn_core(
        jnp.asarray(value, jnp.bfloat16), shapes, jnp.asarray(loc),
        jnp.asarray(w)))
    got_b = np.asarray(ms_deform_attn_core_fast(
        jnp.asarray(value, jnp.bfloat16), shapes, jnp.asarray(loc),
        jnp.asarray(w), _interp(), 16))
    np.testing.assert_allclose(got_b, want_b, atol=1e-5, rtol=1e-5)


def test_pallas_core_grad_falls_back_to_xla(rng):
    """custom_vjp backward = autodiff of the XLA core; grads match."""
    from vlm_fo1_tpu.ops.msda_pallas import ms_deform_attn_core_fast

    shapes = ((4, 6), (2, 3))
    s = sum(h * w for h, w in shapes)
    b, lq, m, p, d = 1, 5, 1, 2, 32
    value = jnp.asarray(rng.standard_normal((b, s, m, d)).astype(np.float32))
    loc = jnp.asarray(rng.uniform(0.1, 0.9, (b, lq, m, len(shapes), p, 2))
                      .astype(np.float32))
    w = jnp.asarray(np.full((b, lq, m, len(shapes), p),
                            1.0 / (len(shapes) * p), np.float32))

    g_fast = jax.grad(
        lambda v, l, a: ms_deform_attn_core_fast(
            v, shapes, l, a, _interp(), 8).sum(), argnums=(0, 1, 2))(value, loc, w)
    g_ref = jax.grad(
        lambda v, l, a: ms_deform_attn_core(
            v, shapes, l, a).sum(), argnums=(0, 1, 2))(value, loc, w)
    for gf, gr in zip(g_fast, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=1e-5, rtol=1e-5)


def test_pallas_backward_matches_autodiff(rng):
    """The TPU-native col2im backward (ops/msda_pallas_bwd.py, VERDICT r4
    #5) vs jax.vjp of the XLA gather core: all three grads (value /
    sampling locations / attention weights), on a geometry mixing the
    supergroup fast path (grid-structured queries), the per-sample miss
    path (random locations) and out-of-bounds samples."""
    from vlm_fo1_tpu.ops.msda import ms_deform_attn_core
    from vlm_fo1_tpu.ops.msda_pallas_bwd import msda_backward_pallas

    shapes = ((10, 12), (5, 6))
    s = sum(h * w for h, w in shapes)
    b, m, p, d = 1, 2, 2, 32
    L = len(shapes)

    for case in ("grid", "random"):
        lq = 131
        if case == "grid":
            # row-major near-grid queries -> supergroup windows hit
            xs = (np.arange(lq) % 12 + 0.5) / 12
            ys = (np.arange(lq) // 12 + 0.5) / 10
            base = np.stack([xs, ys], -1)[None, :, None, None, None]
            loc = np.broadcast_to(
                base, (b, lq, m, L, p, 2)).astype(np.float32).copy()
            loc += rng.uniform(-0.02, 0.02, loc.shape).astype(np.float32)
        else:
            loc = rng.uniform(-0.2, 1.2, (b, lq, m, L, p, 2)).astype(
                np.float32)
        aw = np.asarray(jax.nn.softmax(jnp.asarray(
            rng.standard_normal((b, lq, m, L * p)).astype(np.float32))
        ).reshape(b, lq, m, L, p))
        value = rng.standard_normal((b, s, m, d)).astype(np.float32)
        g = rng.standard_normal((b, lq, m * d)).astype(np.float32)

        loc_flat = loc.transpose(0, 1, 3, 2, 4, 5).reshape(b, lq, -1)
        aw_flat = aw.transpose(0, 1, 3, 2, 4).reshape(b, lq, -1)

        def ref(v, lf, af):
            locr = lf.reshape(b, lq, L, m, p, 2).transpose(0, 1, 3, 2, 4, 5)
            awr = af.reshape(b, lq, L, m, p).transpose(0, 1, 3, 2, 4)
            return ms_deform_attn_core(v, shapes, locr, awr)

        _, vjp = jax.vjp(ref, jnp.asarray(value), jnp.asarray(loc_flat),
                         jnp.asarray(aw_flat))
        want_v, want_l, want_a = vjp(jnp.asarray(g))

        got_v, got_l, got_a = msda_backward_pallas(
            jnp.asarray(value), shapes, jnp.asarray(loc_flat),
            jnp.asarray(aw_flat), jnp.asarray(g), n_heads=m,
            interpret=_interp())
        np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                                   atol=2e-4, rtol=1e-4,
                                   err_msg=f"{case}: grad_value")
        np.testing.assert_allclose(np.asarray(got_a), np.asarray(want_a),
                                   atol=2e-4, rtol=1e-4,
                                   err_msg=f"{case}: grad_aw")
        np.testing.assert_allclose(np.asarray(got_l), np.asarray(want_l),
                                   atol=2e-4, rtol=1e-4,
                                   err_msg=f"{case}: grad_loc")


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="compiled-backward timing needs the chip "
                           "(VLM_FO1_TEST_ON_TPU=1)")
def test_pallas_backward_compiled_on_tpu(rng):
    """The col2im backward must COMPILE and run on-chip in seconds — the
    whole point of replacing the autodiff-of-gather path, whose serial
    scatter lowering made UPN training impractical (VERDICT r4 #5)."""
    import time

    from vlm_fo1_tpu.ops.msda_pallas_bwd import msda_backward_pallas

    shapes = ((56, 64), (28, 32), (14, 16))
    s = sum(h * w for h, w in shapes)
    b, m, p, d = 1, 8, 4, 32
    lq = s
    value = jnp.asarray(rng.standard_normal((b, s, m, d)), jnp.bfloat16)
    loc = jnp.asarray(rng.uniform(0, 1, (b, lq, len(shapes) * m * p * 2)),
                      jnp.float32)
    aw = jnp.asarray(rng.uniform(0.01, 1, (b, lq, len(shapes) * m * p)),
                     jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, lq, m * d)), jnp.float32)
    out = jax.block_until_ready(msda_backward_pallas(
        value, shapes, loc, aw, g, n_heads=m))
    t0 = time.time()
    out = jax.block_until_ready(msda_backward_pallas(
        value, shapes, loc, aw, g, n_heads=m))
    dt = time.time() - t0
    assert all(np.isfinite(np.asarray(o)).all() for o in out)
    # seconds, not minutes: the autodiff path at this geometry never
    # finished a single step on-chip
    assert dt < 5.0, dt


def test_msda_layer_backend_dispatch(rng):
    """msda_layer(backend="pallas") (interpret on CPU via env) matches the
    default XLA path."""
    import os

    d_model, heads, points = 256, 8, 4
    p = msda_layer_init(jax.random.PRNGKey(0), d_model, len(SHAPES), heads,
                        points)
    # non-zero offsets/weights so the test exercises real sampling spread
    p["sampling_offsets"]["w"] = 0.1 * jnp.asarray(
        rng.standard_normal(p["sampling_offsets"]["w"].shape), jnp.float32)
    p["attention_weights"]["w"] = jnp.asarray(
        rng.standard_normal(p["attention_weights"]["w"].shape), jnp.float32)
    b, lq = 1, 9
    s = sum(h * w for h, w in SHAPES)
    q = jnp.asarray(rng.standard_normal((b, lq, d_model)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, d_model)).astype(np.float32))
    ref2 = jnp.asarray(rng.uniform(0, 1, (b, lq, len(SHAPES), 2))
                       .astype(np.float32))
    want = msda_layer(p, q, ref2, v, SHAPES, heads, points, backend="xla")
    if _interp():
        os.environ["VLM_FO1_MSDA_INTERPRET"] = "1"
    try:
        got = msda_layer(p, q, ref2, v, SHAPES, heads, points,
                         backend="pallas")
    finally:
        os.environ.pop("VLM_FO1_MSDA_INTERPRET", None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_pallas_core_chunked_levels_match(rng):
    """Large level maps are processed in row bands (VMEM chunking);
    band-split output must equal the single-pass result."""
    from vlm_fo1_tpu.ops.msda_pallas import _msda_pallas

    shapes = ((10, 12), (5, 6))
    s = sum(h * w for h, w in shapes)
    b, lq, m, p, d = 1, 50, 2, 4, 32
    value = jnp.asarray(rng.standard_normal((b, s, m, d)).astype(np.float32))
    loc = jnp.asarray(rng.uniform(-0.2, 1.2, (b, lq, m, len(shapes), p, 2))
                      .astype(np.float32))
    w = jax.nn.softmax(jnp.asarray(
        rng.standard_normal((b, lq, m, len(shapes) * p)).astype(np.float32)),
        -1).reshape(b, lq, m, len(shapes), p)
    want = np.asarray(ms_deform_attn_core(value, shapes, loc, w))
    loc_flat = loc.transpose(0, 1, 3, 2, 4, 5).reshape(b, lq, -1)
    aw_flat = w.transpose(0, 1, 3, 2, 4).reshape(b, lq, -1)
    got = np.asarray(_msda_pallas(value, shapes, loc_flat, aw_flat,
                                  n_heads=m, interpret=_interp(), qb=256,
                                  chunk_rows=48))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("force", ["fast8", "slow"])
def test_pallas_forced_per8_paths_match_xla(rng, force, monkeypatch):
    """The per-8 patch paths (fast8 16-row window matmul / slow8
    rotate-merge) and the any_miss merge, forced via VLM_FO1_MSDA_FORCE —
    the natural CPU tests always take the 64-query supergroup fast path,
    leaving these hot fallbacks unexercised (ADVICE r2 medium)."""
    from vlm_fo1_tpu.ops.msda_pallas import ms_deform_attn_core_fast

    monkeypatch.setenv("VLM_FO1_MSDA_FORCE", force)
    shapes = ((6, 8), (3, 4))
    s = sum(h * w for h, w in shapes)
    b, lq, m, p, d = 2, 70, 2, 4, 32
    value = rng.standard_normal((b, s, m, d)).astype(np.float32)
    if force == "fast8":
        # clustered: each 8-query group samples one shared location per
        # slot, so its rows share a 16-row window -> the fast8 branch
        base = rng.uniform(0.1, 0.9, (b, -(-lq // 8), m, len(shapes), p, 2))
        loc = np.repeat(base, 8, axis=1)[:, :lq].astype(np.float32)
    else:
        loc = rng.uniform(-0.3, 1.3, (b, lq, m, len(shapes), p, 2)).astype(
            np.float32)
    w = np.array(jax.nn.softmax(jnp.asarray(
        rng.standard_normal((b, lq, m, len(shapes) * p)).astype(np.float32))
    ).reshape(b, lq, m, len(shapes), p))
    # zero a whole 8-group's weights on slot 0 -> the gb=-2 occupancy
    # sentinel (skip) must not change the (zero) contribution
    w[:, 8:16, :, 0, 0] = 0.0

    want = np.asarray(ms_deform_attn_core(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w)))
    got = np.asarray(ms_deform_attn_core_fast(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w),
        _interp(), 256))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_pallas_large_unchunked_level_mixes_paths(rng):
    """A >128-quad-row level below the chunking threshold: random locations
    overflow the 128-row supergroup window, so the kernel mixes the
    straight-line fast path with per-8 patches and the any_miss merge."""
    from vlm_fo1_tpu.ops.msda_pallas import ms_deform_attn_core_fast

    shapes = ((16, 16), (4, 4))  # level 0 quad-packs to 18*18 = 324 rows
    s = sum(h * w for h, w in shapes)
    b, lq, m, p, d = 1, 130, 2, 4, 32
    value = rng.standard_normal((b, s, m, d)).astype(np.float32)
    loc = rng.uniform(-0.2, 1.2, (b, lq, m, len(shapes), p, 2)).astype(
        np.float32)
    w = np.asarray(jax.nn.softmax(jnp.asarray(
        rng.standard_normal((b, lq, m, len(shapes) * p)).astype(np.float32))
    ).reshape(b, lq, m, len(shapes), p))
    want = np.asarray(ms_deform_attn_core(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w)))
    got = np.asarray(ms_deform_attn_core_fast(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w),
        _interp(), 256))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_fit_qb_degrades_instead_of_asserting():
    """Configs whose P*glen can't fit one SMEM row must downsize qb or
    split the level group, not assert (ADVICE r2 low)."""
    from vlm_fo1_tpu.ops.msda_pallas import _fit_qb

    assert _fit_qb(256, 20) == 256          # UPN default (P=4, 5 levels)
    assert _fit_qb(256, 24) == 256          # 6 packed levels still fit
    assert _fit_qb(256, 64) == 256          # (256//128)*64 = 128, fits
    # SMEM-row overflow cases degrade to a smaller qb or split
    assert _fit_qb(256, 65) is None         # odd count -> caller splits
    assert _fit_qb(256, 128) == 128         # halves to fit the SMEM row


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="compiled-kernel check needs a real TPU")
def test_pallas_compiled_matches_reference_on_tpu(rng):
    """The COMPILED kernel (not interpret mode) vs the XLA core on device.
    Interpret mode hides compiled-only numerics hazards: the round-1 kernel
    shipped a ~0.4% weight error because default-precision MXU f32 matmuls
    round operands to bf16 — only an on-device oracle check caught it."""
    from vlm_fo1_tpu.ops.msda_pallas import ms_deform_attn_core_fast

    shapes = ((57, 63), (29, 32), (15, 16))
    s = sum(h * w for h, w in shapes)
    b, lq, m, p, d = 1, 200, 8, 4, 32
    value = jnp.asarray(rng.standard_normal((b, s, m, d)), jnp.bfloat16)
    loc = jnp.asarray(rng.uniform(0, 1, (b, lq, m, len(shapes), p, 2)),
                      jnp.float32)
    w = jax.nn.softmax(jnp.asarray(
        rng.standard_normal((b, lq, m, len(shapes) * p)), jnp.float32),
        -1).reshape(b, lq, m, len(shapes), p)
    want = np.asarray(ms_deform_attn_core(value, shapes, loc, w))
    got = np.asarray(ms_deform_attn_core_fast(value, shapes, loc, w))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
