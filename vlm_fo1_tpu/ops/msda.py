"""Multi-scale deformable attention (MSDA), TPU-native.

Replaces the reference's 1.5k-line CUDA extension
(detect_tools/upn/ops/src/cuda/ms_deform_im2col_cuda.cuh) with a vectorized
gather/bilinear formulation whose semantics exactly match the reference's
pure-torch oracle `ms_deform_attn_core_pytorch`
(ops/functions/ms_deform_attn_func.py:41-61): sampling locations are
normalized [0,1] over each (padded) level, converted to grid_sample
align_corners=False coordinates, bilinear-sampled with zero padding, and
reduced with softmaxed attention weights.

Layout: TPU gathers are throughput-bound on the NUMBER of gathered slices,
not bytes, so the production core fetches each bilinear neighborhood as ONE
2x2xD patch (lax.gather slice_sizes=(2,2,1,D) over a zero-padded level map)
instead of 4 separate row-gathers — 4x fewer gather rows, measured 1.6x
end-to-end on the 800x1333 encoder workload. Zero-padding + a whole-window
validity mask reproduce grid_sample's zeros padding exactly (the row-gather
formulation is kept as `ms_deform_attn_core_reference`, equivalence-tested
to 1e-6). Gradients come free via JAX autodiff (gather transposes to
scatter-add, replacing the 6 hand-written CUDA col2im kernels). The level
loop is static (5 levels).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ms_deform_attn_core(
    value: jnp.ndarray,              # [B, S, M, D] (S = sum of level H*W)
    spatial_shapes: tuple[tuple[int, int], ...],  # static ((H0,W0),...)
    sampling_locations: jnp.ndarray,  # [B, Lq, M, L, P, 2] in [0, 1]
    attention_weights: jnp.ndarray,   # [B, Lq, M, L, P] (softmaxed)
) -> jnp.ndarray:
    """Returns [B, Lq, M*D]. 2x2-patch-gather formulation (see module doc)."""
    from jax import lax

    b, s, m, d = value.shape
    _, lq, _, nlvl, npts, _ = sampling_locations.shape
    assert nlvl == len(spatial_shapes)

    # promote (not force) the compute dtype: f64 inputs (the full-scale
    # UPN f64 oracle) keep f64 location math — an f32 pin there can flip
    # floor() cells vs a double-precision reference; bf16/f32 stay f32
    cdt = jnp.promote_types(jnp.promote_types(value.dtype, jnp.float32),
                            sampling_locations.dtype)
    out = jnp.zeros((b, lq, m, d), cdt)
    start = 0
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(2,),
        start_index_map=(0, 1, 2))
    for lvl, (h, w) in enumerate(spatial_shapes):
        val = value[:, start:start + h * w].reshape(b, h, w, m, d)
        start += h * w
        val = jnp.pad(val, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
        loc = sampling_locations[:, :, :, lvl].astype(cdt)
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        lx = (x - x0)[..., None]
        ly = (y - y0)[..., None]
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        # window fully outside -> zero (per-corner zeros are handled by the
        # padded border inside the window)
        okv = ((y0i >= -1) & (y0i <= h - 1)
               & (x0i >= -1) & (x0i <= w - 1))
        sy = jnp.clip(y0i + 1, 0, h)
        sx = jnp.clip(x0i + 1, 0, w)
        m_ids = jnp.broadcast_to(
            jnp.arange(m, dtype=jnp.int32)[None, None, :, None], sy.shape)

        def one_batch(vb, syb, sxb, mb):
            starts = jnp.stack([syb, sxb, mb], -1).reshape(lq * m * npts, 3)
            return lax.gather(vb, starts, dn, slice_sizes=(2, 2, 1, d))

        patch = jax.vmap(one_batch)(val, sy, sx, m_ids)
        patch = patch.reshape(b, lq, m, npts, 2, 2, d).astype(cdt)
        wts = jnp.stack([
            jnp.stack([(1 - ly) * (1 - lx), (1 - ly) * lx], -2),
            jnp.stack([ly * (1 - lx), ly * lx], -2)], -3)
        samp = (patch * wts).sum((-3, -2))              # [B, Lq, M, P, D]
        samp = jnp.where(okv[..., None], samp, 0.0)
        aw = attention_weights[:, :, :, lvl].astype(cdt)
        out = out + jnp.einsum("blmpd,blmp->blmd", samp, aw)
    return out.reshape(b, lq, m * d)


def ms_deform_attn_core_reference(
    value: jnp.ndarray,              # [B, S, M, D] (S = sum of level H*W)
    spatial_shapes: tuple[tuple[int, int], ...],  # static ((H0,W0),...)
    sampling_locations: jnp.ndarray,  # [B, Lq, M, L, P, 2] in [0, 1]
    attention_weights: jnp.ndarray,   # [B, Lq, M, L, P] (softmaxed)
) -> jnp.ndarray:
    """Row-gather oracle (4 separate corner gathers). Returns [B, Lq, M*D]."""
    b, s, m, d = value.shape
    _, lq, _, nlvl, npts, _ = sampling_locations.shape
    assert nlvl == len(spatial_shapes)

    out = jnp.zeros((b, lq, m, d), jnp.float32)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        val = value[:, start:start + h * w].astype(jnp.float32)  # [B,HW,M,D]
        start += h * w
        loc = sampling_locations[:, :, :, lvl].astype(jnp.float32)  # [B,Lq,M,P,2]
        # grid_sample(align_corners=False): pixel x = loc*W - 0.5
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        lx = x - x0
        ly = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        def corner(yi, xi, wgt):
            inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            yc = jnp.clip(yi, 0, h - 1)
            xc = jnp.clip(xi, 0, w - 1)
            idx = yc * w + xc  # [B, Lq, M, P]
            # gather per (batch, head): take_along_axis over the HW axis
            idx_flat = idx.transpose(0, 2, 1, 3).reshape(b, m, lq * npts)
            v = jnp.take_along_axis(
                val.transpose(0, 2, 1, 3),            # [B, M, HW, D]
                idx_flat[..., None], axis=2)          # [B, M, Lq*P, D]
            v = v.reshape(b, m, lq, npts, d).transpose(0, 2, 1, 3, 4)
            wz = jnp.where(inb, wgt, 0.0)
            return v * wz[..., None]

        sampled = (corner(y0i, x0i, (1 - ly) * (1 - lx))
                   + corner(y0i, x0i + 1, (1 - ly) * lx)
                   + corner(y0i + 1, x0i, ly * (1 - lx))
                   + corner(y0i + 1, x0i + 1, ly * lx))  # [B,Lq,M,P,D]
        aw = attention_weights[:, :, :, lvl].astype(jnp.float32)  # [B,Lq,M,P]
        out = out + jnp.einsum("blmpd,blmp->blmd", sampled, aw)
    return out.reshape(b, lq, m * d)


def offsets_lane_perm(n_heads: int, n_levels: int, n_points: int):
    """Output-lane permutation for the sampling_offsets projection: the
    reference orders lanes (head, level, point, coord)
    (ms_deform_attn.py:142-147 view); the TPU build stores them
    (level, head, point, coord) so level slices are contiguous lane ranges
    in the flat Pallas layout (ops/msda_pallas.py module doc). Applied to
    checkpoint columns at load (upn/convert.py) and to the init bias."""
    import numpy as np

    src = np.arange(n_heads * n_levels * n_points * 2).reshape(
        n_heads, n_levels, n_points, 2)
    return src.transpose(1, 0, 2, 3).reshape(-1)


def msda_layer_init(key, d_model: int, n_levels: int, n_heads: int,
                    n_points: int, dtype=jnp.float32) -> dict:
    """Parameters for a full MSDeformAttn layer (projections + offset heads),
    with the reference's compass-direction offset-bias init
    (ops/modules/ms_deform_attn.py:77-97). The offsets projection's output
    lanes are stored level-major (see offsets_lane_perm)."""
    import numpy as np

    from vlm_fo1_tpu import nn

    k = jax.random.split(key, 4)
    thetas = np.arange(n_heads, dtype=np.float64) * (2 * np.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1
    grid = grid.transpose(1, 0, 2, 3)  # (m,l,p,c) -> (l,m,p,c) lane order

    p = {
        "sampling_offsets": {
            "w": jnp.zeros((d_model, n_heads * n_levels * n_points * 2), dtype),
            "b": jnp.asarray(grid.reshape(-1), dtype),
        },
        "attention_weights": {
            "w": jnp.zeros((d_model, n_heads * n_levels * n_points), dtype),
            "b": jnp.zeros((n_heads * n_levels * n_points,), dtype),
        },
        "value_proj": nn.linear_init(k[2], d_model, d_model, dtype=dtype),
        "output_proj": nn.linear_init(k[3], d_model, d_model, dtype=dtype),
    }
    return p


def msda_layer(
    p: dict,
    query: jnp.ndarray,            # [B, Lq, C]
    reference_points: jnp.ndarray,  # [B, Lq, L, 2] or [B, Lq, L, 4], in [0,1]
    value_flatten: jnp.ndarray,     # [B, S, C]
    spatial_shapes: tuple[tuple[int, int], ...],
    n_heads: int,
    n_points: int,
    key_padding_mask: jnp.ndarray | None = None,  # [B, S] True = pad
    use_4d_normalizer: bool = False,
    backend: str | None = None,  # None/"auto" | "pallas" | "xla"
) -> jnp.ndarray:
    """Full MSDeformAttn module forward (reference ms_deform_attn.py:100-204).
    fp32 compute path (the reference disables autocast).

    This also covers the repo's "key-aware" variant
    (ms_deform_attn_key_aware.py:33-130, never exported —
    ops/modules/__init__.py:9): that class accepts a `key` argument but its
    forward never reads it — the same query-driven offsets/weights
    computation as here. Its one real delta, `use_4D_normalizer`
    (key_aware:118-125: normalize 4-dim-reference offsets by the level W/H
    instead of /n_points), is exposed as `use_4d_normalizer`."""
    from vlm_fo1_tpu import nn

    b, lq, c = query.shape
    nlvl = len(spatial_shapes)
    m, d = n_heads, c // n_heads

    import numpy as np

    value = nn.linear(p["value_proj"], value_flatten)
    if key_padding_mask is not None:
        value = jnp.where(key_padding_mask[..., None], 0.0, value)
    value = value.reshape(b, -1, m, d)

    # All per-sample tensors stay FLAT [B, Lq, lanes] (lane order
    # level-major (l, m, p[, c]); the projection weights are stored in that
    # order, see offsets_lane_perm): 6-D [B,Lq,M,L,P,2] intermediates get
    # (8,128)-tiled layouts on TPU whose thin minor dims waste ~97% of
    # every pass and force layout-conversion copies — profiled at over
    # half the per-layer UPN encoder time in round 1.
    offsets = nn.linear(p["sampling_offsets"], query)    # [B,Lq,L*M*P*2]
    aw = nn.linear(p["attention_weights"], query)        # [B,Lq,M*L*P]
    cdt = jnp.promote_types(query.dtype, jnp.float32)
    aw = jax.nn.softmax(
        aw.reshape(b, lq, m, nlvl * n_points).astype(cdt),
        axis=-1).reshape(b, lq, -1)
    # (m, l, p) -> (l, m, p): constant lane permutation
    perm = np.arange(m * nlvl * n_points).reshape(
        m, nlvl, n_points).transpose(1, 0, 2).reshape(-1)
    aw_flat = jnp.take(aw, jnp.asarray(perm), axis=-1)

    mp2 = m * n_points * 2
    # constants in f64, cast to the compute dtype: under the f64 oracle a
    # f32-rounded 1/W shifts locations by ~1e-8, enough to flip floor()
    # cells vs the double-precision reference at ~1-per-run rates
    wv = np.array([w for h, w in spatial_shapes], np.float64)
    hv = np.array([h for h, w in spatial_shapes], np.float64)
    inv_wh = np.empty(nlvl * mp2, np.float64)
    inv_wh[0::2] = np.repeat(1.0 / wv, m * n_points)
    inv_wh[1::2] = np.repeat(1.0 / hv, m * n_points)
    inv_wh = inv_wh.astype(cdt)

    def bcast_ref(r):  # [B, Lq, L, k] -> [B, Lq, L*M*P*k] (l, m, p, c)
        k = r.shape[-1]
        return jnp.broadcast_to(
            r[:, :, :, None, :], (b, lq, nlvl, m * n_points, k)).reshape(
            b, lq, -1)

    offsets = offsets.astype(cdt)
    if reference_points.shape[-1] == 2:
        loc_flat = bcast_ref(reference_points) + offsets * jnp.asarray(
            inv_wh)
    elif reference_points.shape[-1] == 4:
        norm = (jnp.asarray(inv_wh) if use_4d_normalizer
                else 1.0 / jnp.asarray(n_points, cdt))
        loc_flat = (bcast_ref(reference_points[..., :2])
                    + offsets * norm
                    * bcast_ref(reference_points[..., 2:]) * 0.5)
    else:
        raise ValueError("reference_points last dim must be 2 or 4")

    out = _dispatch_core(value, spatial_shapes, loc_flat, aw_flat, m,
                         backend)
    return nn.linear(p["output_proj"], out.astype(query.dtype))


def _dispatch_core(value, spatial_shapes, loc_flat, aw_flat, n_heads,
                   backend=None):
    """Pick the MSDA sampling core (flat-layout inputs, see msda_pallas).
    On TPU the Pallas kernel replaces the XLA gather formulation — XLA:TPU
    lowers the gather to a serial slice loop that is ~1000x slower at the
    800x1333 encoder workload. Env override: VLM_FO1_MSDA_BACKEND."""
    import os

    backend = backend or os.environ.get("VLM_FO1_MSDA_BACKEND", "auto")
    d = value.shape[-1]
    if backend == "auto":
        backend = ("pallas" if jax.default_backend() == "tpu"
                   and (4 * d) % 128 == 0 else "xla")
    if backend == "pallas":
        from vlm_fo1_tpu.ops.msda_pallas import ms_deform_attn_core_flat

        interpret = os.environ.get("VLM_FO1_MSDA_INTERPRET") == "1"
        return ms_deform_attn_core_flat(value, tuple(spatial_shapes),
                                        loc_flat, aw_flat, n_heads,
                                        interpret)
    from vlm_fo1_tpu.ops.msda_pallas import _flat_to_6d

    loc, aw = _flat_to_6d(spatial_shapes, loc_flat, aw_flat, n_heads)
    return ms_deform_attn_core(value, spatial_shapes, loc, aw)
