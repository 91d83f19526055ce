"""Pallas TPU kernel for multi-scale deformable attention.

The XLA formulation in `ops/msda.py` expresses the bilinear sampling as
`lax.gather` with (2,2,1,D) slices; XLA:TPU lowers arbitrary gathers to a
serial HBM-latency-bound slice loop, which makes the UPN encoder (several
million samples per layer at 800x1333) minutes-slow. This kernel replaces the
gather with dynamic VMEM vector loads, the TPU-native way to do
data-dependent addressing (reference CUDA equivalent: the im2col forward
kernel at detect_tools/upn/ops/src/cuda/ms_deform_im2col_cuda.cuh:237-299).

Design:

- **Quad packing.** For each padded level map [Hp*Wp, D] we precompute, with
  cheap vectorized XLA shifts, a map

      val4[r] = concat(val[r], val[r+1], val[r+Wp], val[r+Wp+1])  # [R, 4D]

  so a sample's whole 2x2 bilinear neighborhood is ONE row of 4*D = 128
  lanes (D = 32 for UPN's d_model 256 / 8 heads) — a single dynamic VMEM
  load per sample, fully using the vector unit's lane width. (In VMEM this
  packing is free: a [R, 32] map would be lane-padded to 128 anyway.)

- **Aligned loads.** Mosaic requires dynamic sublane offsets to be provably
  8-aligned, so the kernel fetches the aligned (8, 4D) block containing the
  row and selects the target row with an iota mask + sublane reduction; the
  select/reduce runs in the value dtype (exact: the 7 other lanes are exact
  zeros), converting only the selected row to f32.

- **Weight expansion.** The four bilinear corner weights (already folded
  with the softmaxed attention weight and grid_sample's zero-padding
  validity) are expanded to the quad lane layout by one small MXU matmul per
  query block against a constant [4P, P*4D] expansion matrix.

- **Level chunking.** A level map must fit in VMEM; stride-4 level-0 maps
  (e.g. 224x256 at the 896x1024 bucket, ~15 MB quad-packed bf16) do not,
  double-buffered. Large levels are split into row bands of at most
  `_CHUNK_ROWS`; each band's kernel invocation zeroes the weights of
  out-of-band samples, and a per-8-query-group occupancy flag (in SMEM)
  skips groups with no in-band samples, so total work stays ~one pass over
  the samples regardless of chunk count.

Numerics match `ms_deform_attn_core` exactly up to the dtype of the packed
map (the production UPN path runs bf16 values; accumulation is f32, like the
reference's fp16->fp32 upcast path ms_deform_attn.py:181-193).

Gradients: the kernel is forward-only; `ms_deform_attn_core_fast` wraps it in
a custom_vjp whose backward differentiates the XLA reference formulation —
UPN is inference-only (SURVEY §2.2), so that path only serves `jax.grad`
parity tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vlm_fo1_tpu.ops.msda import ms_deform_attn_core

_LANES = 128
# bytes per VMEM-resident band of a level map (doubled by pipelining buffers;
# a 200x336 stride-4 level-0 map splits into ~4 bands at bf16)
_CHUNK_BYTES = 5 * 1024 * 1024


def _expansion_matrix(n_points: int, d: int) -> np.ndarray:
    """[4*P, P*4*D] matrix: row (p*4+c) has ones in lanes
    [p*4D + c*D, p*4D + (c+1)*D) — expands per-corner scalars to the
    quad-packed lane layout."""
    ex = np.zeros((4 * n_points, n_points * 4 * d), np.float32)
    for p in range(n_points):
        for c in range(4):
            ex[p * 4 + c, p * 4 * d + c * d:p * 4 * d + (c + 1) * d] = 1.0
    return ex


def _msda_level_kernel(starts_ref, gflag_ref, w4_ref, ex_ref, val4_ref,
                       out_ref, w128_ref, *, n_points: int, d: int, qb: int):
    # starts: [1, QB, P] int32 SMEM   gflag: [1, QB//8, 1] int32 SMEM
    # w4: [1, QB, 4P] f32   ex: [4P, P*4D] f32   val4: [1, R, 4D]
    # out: [1, QB, D] f32
    # w128 (scratch): [QB, P*4D] f32
    w128_ref[:] = jnp.dot(w4_ref[0], ex_ref[:],
                          preferred_element_type=jnp.float32)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 4 * d), 0)

    def body(q8, _):
        q0 = pl.multiple_of(q8 * 8, 8)

        @pl.when(gflag_ref[0, q8, 0] == 0)
        def _skip():
            out_ref[0, pl.ds(q0, 8), :] = jnp.zeros((8, d), jnp.float32)

        @pl.when(gflag_ref[0, q8, 0] != 0)
        def _compute():
            wblk = w128_ref[pl.ds(q0, 8), :]              # (8, P*4D)
            rows = []
            for i in range(8):
                # accumulate per-sublane: each sample's row lands on its own
                # sublane of acc8 (weight already applied via the iota mask),
                # one fold per query instead of one reduce per sample
                acc8 = jnp.zeros((8, 4 * d), jnp.float32)
                for p in range(n_points):
                    r = starts_ref[0, q0 + i, p]
                    r0 = pl.multiple_of((r // 8) * 8, 8)
                    blk = val4_ref[0, pl.ds(r0, 8), :]    # (8, 4D)
                    wrow = jnp.broadcast_to(
                        wblk[i:i + 1, p * 4 * d:(p + 1) * 4 * d], (8, 4 * d))
                    selw = jnp.where(sub_iota == r - r0, wrow, 0.0)
                    acc8 = acc8 + blk * selw
                acc = jnp.sum(acc8, 0, keepdims=True)     # (1, 4D)
                rows.append(acc[:, 0:d] + acc[:, d:2 * d]
                            + acc[:, 2 * d:3 * d] + acc[:, 3 * d:4 * d])
            out_ref[0, pl.ds(q0, 8), :] = jnp.concatenate(rows, 0)

        return 0

    jax.lax.fori_loop(0, qb // 8, body, 0)


def _quad_pack(val_level: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """[BM, H*W, D] -> padded quad-packed [BM, (H+2)*(W+2) (8-aligned), 4D]."""
    bm, _, dd = val_level.shape
    vp = jnp.pad(val_level.reshape(bm, h, w, dd),
                 ((0, 0), (1, 1), (1, 1), (0, 0)))
    wp = w + 2
    flat = vp.reshape(bm, (h + 2) * wp, dd)
    r1 = jnp.roll(flat, -1, axis=1)
    rw = jnp.roll(flat, -wp, axis=1)
    rw1 = jnp.roll(flat, -(wp + 1), axis=1)
    packed = jnp.concatenate([flat, r1, rw, rw1], axis=-1)
    # pad rows to a multiple of 8: the kernel fetches aligned (8, 4D) blocks
    rpad = -(-packed.shape[1] // 8) * 8 - packed.shape[1]
    return jnp.pad(packed, ((0, 0), (0, rpad), (0, 0)))


def _level_call(starts, w4, ex, val4, *, n_points, d, qb, interpret):
    """One pallas_call over one row band of one level.
    starts [BM, Lq_pad, P] (band-local), w4 [BM, Lq_pad, 4P] (zeroed outside
    the band), val4 [BM, Rband, 4D]."""
    bm, lq_pad, _ = starts.shape
    nqb = lq_pad // qb
    rband = val4.shape[1]
    gflag = (w4.reshape(bm, lq_pad // 8, 8 * 4 * n_points) != 0).any(
        -1).astype(jnp.int32)[..., None]
    return pl.pallas_call(
        functools.partial(_msda_level_kernel, n_points=n_points, d=d, qb=qb),
        grid=(bm, nqb),
        in_specs=[
            pl.BlockSpec((1, qb, n_points), lambda i, j: (i, j, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, qb // 8, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, qb, 4 * n_points), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * n_points, n_points * 4 * d),
                         lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rband, 4 * d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, qb, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bm, lq_pad, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((qb, n_points * 4 * d), jnp.float32)],
        interpret=interpret,
    )(starts, gflag, w4, ex, val4)


@functools.partial(
    jax.jit,
    static_argnames=("spatial_shapes", "n_points", "interpret", "qb",
                     "chunk_rows"))
def _msda_pallas(value, spatial_shapes, sampling_locations,
                 attention_weights, *, n_points, interpret=False, qb=256,
                 chunk_rows=None):
    if chunk_rows is None:
        row_bytes = 4 * value.shape[-1] * value.dtype.itemsize
        chunk_rows = _CHUNK_BYTES // row_bytes // 8 * 8
    b, s, m, d = value.shape
    _, lq, _, nlvl, npts, _ = sampling_locations.shape
    assert npts == n_points and nlvl == len(spatial_shapes)

    bm = b * m
    lq_pad = -(-lq // qb) * qb

    # [B, Lq, M, ...] -> [BM, Lq_pad, ...]
    def to_bm(x, fill=0):
        x = jnp.moveaxis(x, 2, 1).reshape((bm, lq) + x.shape[3:])
        return jnp.pad(x, ((0, 0), (0, lq_pad - lq))
                       + ((0, 0),) * (x.ndim - 2), constant_values=fill)

    # sampling math for ALL levels in one vectorized pass (one transpose of
    # loc/weights instead of 3 per level), then contiguous per-level slices
    hv = jnp.asarray([h for h, _ in spatial_shapes], jnp.float32)  # [L]
    wv = jnp.asarray([w for _, w in spatial_shapes], jnp.float32)
    loc = sampling_locations.astype(jnp.float32)       # [B,Lq,M,L,P,2]
    x = loc[..., 0] * wv[:, None] - 0.5
    y = loc[..., 1] * hv[:, None] - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    hvi = hv.astype(jnp.int32)[:, None]
    wvi = wv.astype(jnp.int32)[:, None]
    okv = ((y0i >= -1) & (y0i <= hvi - 1) & (x0i >= -1) & (x0i <= wvi - 1))
    sy = jnp.clip(y0i + 1, 0, hvi)
    sx = jnp.clip(x0i + 1, 0, wvi)
    starts_all = sy * (wvi + 2) + sx                   # [B,Lq,M,L,P]
    aw = jnp.where(okv, attention_weights.astype(jnp.float32), 0.0)
    # corner weights, quad order (r, r+1, r+W, r+W+1)
    w4_all = jnp.stack([(1 - ly) * (1 - lx), (1 - ly) * lx,
                        ly * (1 - lx), ly * lx], -1) * aw[..., None]
    starts_all = to_bm(starts_all)                     # [BM,Lqp,L,P]
    w4_all = to_bm(w4_all.reshape(b, lq, m, nlvl, n_points * 4))

    # per level: quad-packed map + its slice of starts/weights
    level_data = []
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        val = value[:, start:start + h * w]                    # [B,HW,M,D]
        start += h * w
        val4 = _quad_pack(
            jnp.moveaxis(val, 2, 1).reshape(bm, h * w, d), h, w)
        level_data.append((val4, lvl))

    # pack levels into kernel passes: each pass owns one VMEM-resident map
    # of at most chunk_rows rows. Levels small enough to share a map are
    # CONCATENATED (one query pass samples all of them: n_samp = P * glen);
    # oversized levels are band-split, with out-of-band samples masked to
    # weight zero and skipped via the per-8-query-group occupancy flag.
    out = jnp.zeros((bm, lq_pad, d), jnp.float32)
    group = []          # [(val4, lvl)] pending small (consecutive) levels
    group_rows = 0

    def flush(out, group):
        if not group:
            return out
        offs = np.cumsum([0] + [g[0].shape[1] for g in group[:-1]])
        gval = jnp.concatenate([g[0] for g in group], 1)
        lvls = [g[1] for g in group]
        l0, l1 = lvls[0], lvls[-1] + 1
        off = jnp.asarray(offs, jnp.int32)[:, None]    # [glen, 1]
        gstarts = (starts_all[:, :, l0:l1] + off).reshape(
            bm, lq_pad, -1)
        gw4 = w4_all[:, :, l0:l1].reshape(bm, lq_pad, -1)
        n_samp = n_points * len(group)
        ex = jnp.asarray(_expansion_matrix(n_samp, d))
        return out + _level_call(gstarts, gw4, ex, gval, n_points=n_samp,
                                 d=d, qb=qb, interpret=interpret)

    ex1 = jnp.asarray(_expansion_matrix(n_points, d))
    for val4, lvl in level_data:
        rtot = val4.shape[1]
        if rtot > chunk_rows:
            # flush first: grouped levels must stay consecutive (the group
            # reads one contiguous [l0:l1] slice of starts/weights)
            out = flush(out, group)
            group, group_rows = [], 0
            # band-split; a sample's aligned (8, 4D) block lives in the band
            # holding its r0, so bands carry 8 extra rows
            starts = starts_all[:, :, lvl]
            w4 = w4_all[:, :, lvl]
            cid = (starts // 8) * 8 // chunk_rows
            for c in range(-(-rtot // chunk_rows)):
                in_band = cid == c
                starts_c = jnp.where(in_band, starts - c * chunk_rows, 0)
                w4_c = jnp.where(jnp.repeat(in_band, 4, axis=-1), w4, 0.0)
                hi = min(c * chunk_rows + chunk_rows + 8, rtot)
                band = val4[:, c * chunk_rows:hi]
                if band.shape[1] % 8:
                    band = jnp.pad(
                        band, ((0, 0), (0, 8 - band.shape[1] % 8), (0, 0)))
                out = out + _level_call(starts_c, w4_c, ex1, band,
                                        n_points=n_points, d=d, qb=qb,
                                        interpret=interpret)
            continue
        if group_rows + rtot > chunk_rows:
            out = flush(out, group)
            group, group_rows = [], 0
        group.append((val4, lvl))
        group_rows += rtot
    out = flush(out, group)

    out = out[:, :lq].reshape(b, m, lq, d)
    return jnp.moveaxis(out, 1, 2).reshape(b, lq, m * d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4, 5))
def ms_deform_attn_core_fast(value, spatial_shapes, sampling_locations,
                             attention_weights, interpret=False, qb=256):
    """Drop-in for `ms_deform_attn_core` ([B,Lq,M*D] out), Pallas forward.

    `interpret=True` runs the kernel in interpreter mode (CPU tests).
    Backward falls back to autodiff of the XLA formulation (inference never
    takes it)."""
    n_points = sampling_locations.shape[4]
    return _msda_pallas(value, tuple(spatial_shapes), sampling_locations,
                        attention_weights, n_points=n_points,
                        interpret=interpret, qb=qb)


def _fast_fwd(value, spatial_shapes, sampling_locations, attention_weights,
              interpret, qb):
    out = ms_deform_attn_core_fast(value, spatial_shapes, sampling_locations,
                                   attention_weights, interpret, qb)
    return out, (value, sampling_locations, attention_weights)


def _fast_bwd(spatial_shapes, interpret, qb, res, g):
    value, sampling_locations, attention_weights = res
    _, vjp = jax.vjp(
        lambda v, l, a: ms_deform_attn_core(v, spatial_shapes, l, a),
        value, sampling_locations, attention_weights)
    return vjp(g.astype(jnp.float32))


ms_deform_attn_core_fast.defvjp(_fast_fwd, _fast_bwd)
