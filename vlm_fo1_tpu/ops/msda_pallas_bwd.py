"""Pallas TPU backward (col2im) for multi-scale deformable attention.

The reference ships six hand-tuned CUDA col2im backward kernels
(detect_tools/upn/ops/src/cuda/ms_deform_im2col_cuda.cuh:301-922, selected
by channel count in the launchers :923-1330). r1-r4 of this repo instead
differentiated the XLA gather formulation — correct, but XLA:TPU lowers the
transposed gather to a serial scatter loop, so the UPN training extension
could not practically run on-chip (VERDICT r4 #5).

This kernel is the TPU-native col2im: it mirrors the forward kernel's pass
structure (ops/msda_pallas.py — same quad-packed value maps, supergroup
windows, level grouping and row banding, driven by the same XLA-side
geometry) and per (supergroup, slot) computes all three gradients in one
visit:

- grad wrt attention weights / sampling locations (the GATHER side): the
  forward's one-hot selection matmul re-gathers the 2x2 corner rows, the
  products <g, v_corner> reduce per corner lane-block, and the bilinear
  chain rule runs on (SG, 1) columns.
- grad wrt value (the SCATTER side): a TRANSPOSED one-hot matmul
  (WIN, SG) @ (SG, 4D) accumulates w*g into the quad-packed rows of a
  VMEM-resident gradient map — the MXU replacement for the CUDA kernels'
  shared-memory column reductions. The output band block is revisited
  across the query grid (index map ignores the query index), so the
  accumulation never leaves VMEM until the head changes.

Samples that miss the supergroup window fall back to a per-sample path
(aligned 8-row load + masked row select / add), mirroring the forward's
slow path. The quad-packed gradient map folds back to per-pixel gradients
with four shift-adds (the exact transpose of the forward's quad packing).

Numerics: everything accumulates in f32; grad-parity vs jax.grad of the
XLA reference formulation is asserted in tests/test_msda.py (interpret mode
on CPU; compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vlm_fo1_tpu.ops.msda_pallas import (
    _SG,
    _WIN,
    _corner_perm,
    _fit_qb,
    _lane_perm,
    _quad_pack,
    _to_slab2,
    _to_slab3,
)

# Backward VMEM budgets: a pass holds the bf16 value band AND an f32
# gradient band (2x the bytes) plus the forward-style scratch, so bands
# are ~3x smaller than the forward's.
_CHUNK_BYTES_BWD = 2 * 1024 * 1024
_BAND_BYTES_BWD = 2560 * 1024


def _bwd_kernel(code_ref, dvm_ref, dvmt_ref, stp_ref, w4_ref, awf_ref,
                fxy_ref, g4_ref, val4_ref, gval_ref, gscal_ref, *,
                n_samp: int, d: int, qb: int):
    # code: [1, 8, 128] SMEM supergroup codes (-2 skip / -1 miss / >=0
    #     window base) — same as the forward kernel
    # dvm:  [1, QB, S] i32 in-window deltas (-1 = miss)
    # dvmt: [1, S, QB] i32 the SAME deltas transposed (lane-major queries)
    #     for the scatter's transposed one-hot
    # stp:  [1, QB*S/128, 128] i32 absolute pass-local start row per
    #     sample, -1 where the sample has zero weight (miss fallback)
    # w4:   [1, QB, 4S] f32 forward weights a*cw (slot-major s*4+corner)
    # awf:  [1, QB, S] f32 attention weights (OOB-masked)
    # fxy:  [1, QB, 2S] f32 bilinear fractions (lx, ly) per slot
    # g4:   [1, QB, 4D] f32 output grad, corner-tiled (g, g, g, g)
    # val4: [1, R, 4D] value map (quad-packed)
    # gval: [1, R, 4D] f32 OUT - accumulated across the query grid
    # gscal:[1, QB, 4S] f32 OUT - (ga, glx, gly, 0) per slot
    vdt = val4_ref.dtype
    dots = functools.partial(
        jnp.dot, preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.HIGHEST if vdt == jnp.float32
                   else jax.lax.Precision.DEFAULT))
    dotf = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    iota_win = jax.lax.broadcasted_iota(jnp.int32, (_SG, _WIN), 1)
    iota_winT = jax.lax.broadcasted_iota(jnp.int32, (_WIN, _SG), 0)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    jrow = jax.lax.rem(pl.program_id(1), 8)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        gval_ref[0] = jnp.zeros(gval_ref.shape[1:], jnp.float32)

    def idx(ref, k):
        return ref[0, k >> 7, k & 127]

    def body(g, _):
        q0 = pl.multiple_of(g * _SG, _SG)
        codes = [code_ref[0, jrow, g * n_samp + s] for s in range(n_samp)]
        act = codes[0]
        for s in range(1, n_samp):
            act = jnp.maximum(act, codes[s])

        @pl.when(act == -2)
        def _skip():
            gscal_ref[0, pl.ds(q0, _SG), :] = jnp.zeros((_SG, 4 * n_samp),
                                                        jnp.float32)

        @pl.when(act > -2)
        def _active():
            dmat = dvm_ref[0, pl.ds(q0, _SG), :]           # (SG, S)
            g4b = g4_ref[0, pl.ds(q0, _SG), :]             # (SG, 4D) f32
            w4b = w4_ref[0, pl.ds(q0, _SG), :]             # (SG, 4S)
            awb = awf_ref[0, pl.ds(q0, _SG), :]            # (SG, S)
            fxyb = fxy_ref[0, pl.ds(q0, _SG), :]           # (SG, 2S)
            scal = jnp.zeros((_SG, 4 * n_samp), jnp.float32)
            for s in range(n_samp):
                base = pl.multiple_of(jnp.maximum(codes[s], 0), 8)
                delta = jax.lax.slice(dmat, (0, s), (_SG, s + 1))
                oh = (iota_win == delta).astype(vdt)       # miss -> zeros
                blk = val4_ref[0, pl.ds(base, _WIN), :]
                sel = dots(oh, blk)                        # (SG, 4D)
                t = sel * g4b
                s00 = jnp.sum(t[:, 0:d], -1, keepdims=True)
                s01 = jnp.sum(t[:, d:2 * d], -1, keepdims=True)
                s10 = jnp.sum(t[:, 2 * d:3 * d], -1, keepdims=True)
                s11 = jnp.sum(t[:, 3 * d:4 * d], -1, keepdims=True)
                lx = jax.lax.slice(fxyb, (0, 2 * s), (_SG, 2 * s + 1))
                ly = jax.lax.slice(fxyb, (0, 2 * s + 1), (_SG, 2 * s + 2))
                a = jax.lax.slice(awb, (0, s), (_SG, s + 1))
                ga = ((1 - ly) * ((1 - lx) * s00 + lx * s01)
                      + ly * ((1 - lx) * s10 + lx * s11))
                glx = a * ((1 - ly) * (s01 - s00) + ly * (s11 - s10))
                gly = a * ((1 - lx) * (s10 - s00) + lx * (s11 - s01))
                scal = scal.at[:, 4 * s:4 * s + 1].set(ga)
                scal = scal.at[:, 4 * s + 1:4 * s + 2].set(glx)
                scal = scal.at[:, 4 * s + 2:4 * s + 3].set(gly)

                # scatter: gval[base + delta[q]] += w(q) * g(q) via the
                # transposed one-hot (misses contribute zero)
                gw = (jax.lax.slice(w4b, (0, 4 * s), (_SG, 4 * s + 1))
                      * g4b[:, 0:d])
                gw = jnp.concatenate([
                    gw,
                    jax.lax.slice(w4b, (0, 4 * s + 1), (_SG, 4 * s + 2))
                    * g4b[:, d:2 * d],
                    jax.lax.slice(w4b, (0, 4 * s + 2), (_SG, 4 * s + 3))
                    * g4b[:, 2 * d:3 * d],
                    jax.lax.slice(w4b, (0, 4 * s + 3), (_SG, 4 * s + 4))
                    * g4b[:, 3 * d:4 * d]], axis=1)        # (SG, 4D)
                deltaT = dvmt_ref[0, s:s + 1, pl.ds(q0, _SG)]  # (1, SG)
                ohT = (iota_winT == deltaT).astype(jnp.float32)
                gval_ref[0, pl.ds(base, _WIN), :] += dotf(ohT, gw)

            gscal_ref[0, pl.ds(q0, _SG), :] = scal

            # per-sample fallback for slots that missed the window
            for s in range(n_samp):
                @pl.when(codes[s] == -1)
                def _slow():
                    for sub in range(_SG // 8):
                        q8 = q0 + sub * 8
                        for i in range(8):
                            e = (q8 + i) * n_samp + s
                            st = idx(stp_ref, e)

                            @pl.when(st >= 0)
                            def _one():
                                rb = pl.multiple_of(st & -8, 8)
                                d8 = st & 7
                                blk8 = val4_ref[0, pl.ds(rb, 8), :]
                                sel8 = jnp.sum(
                                    jnp.where(row_ids == d8,
                                              blk8.astype(jnp.float32),
                                              0.0), axis=0, keepdims=True)
                                gq = g4_ref[0, pl.ds(q8 + i, 1), :]  # (1,4D)
                                t = sel8 * gq
                                s00 = jnp.sum(t[:, 0:d], -1, keepdims=True)
                                s01 = jnp.sum(t[:, d:2 * d], -1,
                                              keepdims=True)
                                s10 = jnp.sum(t[:, 2 * d:3 * d], -1,
                                              keepdims=True)
                                s11 = jnp.sum(t[:, 3 * d:4 * d], -1,
                                              keepdims=True)
                                lx = fxy_ref[0, pl.ds(q8 + i, 1),
                                             2 * s:2 * s + 1]
                                ly = fxy_ref[0, pl.ds(q8 + i, 1),
                                             2 * s + 1:2 * s + 2]
                                a = awf_ref[0, pl.ds(q8 + i, 1), s:s + 1]
                                ga = ((1 - ly) * ((1 - lx) * s00 + lx * s01)
                                      + ly * ((1 - lx) * s10 + lx * s11))
                                glx = a * ((1 - ly) * (s01 - s00)
                                           + ly * (s11 - s10))
                                gly = a * ((1 - lx) * (s10 - s00)
                                           + lx * (s11 - s01))
                                gscal_ref[0, pl.ds(q8 + i, 1),
                                          4 * s:4 * s + 1] = ga
                                gscal_ref[0, pl.ds(q8 + i, 1),
                                          4 * s + 1:4 * s + 2] = glx
                                gscal_ref[0, pl.ds(q8 + i, 1),
                                          4 * s + 2:4 * s + 3] = gly
                                w4q = w4_ref[0, pl.ds(q8 + i, 1), :]
                                gwq = jnp.concatenate([
                                    w4q[:, 4 * s + c:4 * s + c + 1]
                                    * gq[:, c * d:(c + 1) * d]
                                    for c in range(4)], axis=1)   # (1, 4D)
                                gval_ref[0, pl.ds(rb, 8), :] += jnp.where(
                                    row_ids == d8, gwq, 0.0)

        return 0

    jax.lax.fori_loop(0, qb // _SG, body, 0)


def _bwd_pass_call(starts_p, w4_p, aw_p, fxy_p, g4, val4, *, b, m, n_samp,
                   d, qb, interpret):
    """One backward pass. starts_p [B, Lqp, M*S] pass-local rows (-1 where
    the sample has zero weight), w4_p [B, Lqp, M*4S], aw_p [B, Lqp, M*S],
    fxy_p [B, Lqp, M*2S], g4 [BM, Lqp, 4D], val4 [BM, Rband, 4D].
    Returns (gval4 [BM, Rband, 4D] f32, gscal [BM, Lqp, 4S] f32)."""
    from vlm_fo1_tpu.ops.msda_pallas import _group_meta

    lq_pad = starts_p.shape[1]
    nqb = lq_pad // qb
    rband = val4.shape[1]
    assert (qb * n_samp) % 1024 == 0 and qb % _SG == 0
    assert (qb // _SG) * n_samp <= 128
    # reuse the forward's supergroup analysis; the backward only uses the
    # supergroup codes + deltas (miss samples go per-sample via stp)
    _, _, _, code, dvm = _group_meta(starts_p, w4_p, b, m, lq_pad, n_samp)
    rows = lq_pad * n_samp // 128

    def dense128(x):
        return _to_slab2(x, m, n_samp).reshape(b * m, rows, 128)

    # absolute start rows, -1 where weight-zero (mirrors occupancy)
    occ = (w4_p != 0).reshape(*w4_p.shape[:-1], m * n_samp, 4).any(-1)
    stp = dense128(jnp.where(occ, starts_p, -1))
    brows = qb * n_samp // 128
    gcodes = (qb // _SG) * n_samp
    code = _to_slab3(code, m, n_samp).reshape(b * m, nqb, gcodes)
    code = jnp.pad(code, ((0, 0), (0, (-nqb) % 8), (0, 128 - gcodes)),
                   constant_values=-2)
    dvm = _to_slab3(dvm, m, n_samp)
    dvmt = jnp.swapaxes(dvm, 1, 2)                      # (BM, S, Lqp)
    w4s = _to_slab3(w4_p, m, 4 * n_samp)
    aws = _to_slab3(aw_p, m, n_samp)
    fxys = _to_slab3(fxy_p, m, 2 * n_samp)
    sp = -(-n_samp // 8) * 8                            # 8-row SMEM pad
    dvmt = jnp.pad(dvmt, ((0, 0), (0, sp - n_samp), (0, 0)))
    return pl.pallas_call(
        functools.partial(_bwd_kernel, n_samp=n_samp, d=d, qb=qb),
        grid=(b * m, nqb),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda i, j: (i, j // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, qb, n_samp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, qb), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, brows, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, qb, 4 * n_samp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qb, n_samp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qb, 2 * n_samp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qb, 4 * d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rband, 4 * d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rband, 4 * d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qb, 4 * n_samp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * m, rband, 4 * d), jnp.float32),
            jax.ShapeDtypeStruct((b * m, lq_pad, 4 * n_samp), jnp.float32),
        ],
        interpret=interpret,
    )(code, dvm, dvmt, stp, w4s, aws, fxys, g4, val4)


def _quad_unpack(gp: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Transpose of msda_pallas._quad_pack: quad-packed row grads
    [BM, R(+slack), 4D] -> per-pixel grads [BM, H*W, D]."""
    bm = gp.shape[0]
    d = gp.shape[-1] // 4
    wp = w + 2
    n = (h + 2) * wp

    def shifted(x, k):  # inverse of roll(-k): contributions move DOWN k
        return jnp.pad(x[:, :max(n - k, 0)], ((0, 0), (k, 0), (0, 0)))

    g0 = gp[:, :n, 0 * d:1 * d]
    g1 = shifted(gp[:, :, 1 * d:2 * d], 1)
    g2 = shifted(gp[:, :, 2 * d:3 * d], wp)
    g3 = shifted(gp[:, :, 3 * d:4 * d], wp + 1)
    flat = g0 + g1[:, :n] + g2[:, :n] + g3[:, :n]
    grid = flat.reshape(bm, h + 2, wp, d)[:, 1:h + 1, 1:w + 1]
    return grid.reshape(bm, h * w, d)


@functools.partial(
    jax.jit, static_argnames=("spatial_shapes", "n_heads", "interpret",
                              "qb"))
def msda_backward_pallas(value, spatial_shapes, loc_flat, aw_flat, g, *,
                         n_heads, interpret=False, qb=256):
    """Backward of the flat-layout MSDA forward: given g = dL/dout
    [B, Lq, M*D], returns (grad_value [B, S, M, D], grad_loc_flat,
    grad_aw_flat) with the same flat lane layouts as the inputs."""
    import math

    b, s, m, d = value.shape
    assert m == n_heads
    L = len(spatial_shapes)
    lq = loc_flat.shape[1]
    P = loc_flat.shape[2] // (L * m * 2)
    MP = m * P
    bm = b * m
    qmin = 1024 // math.gcd(P, 1024)
    qb = -(-qb // qmin) * qmin
    lq_pad = -(-lq // qb) * qb

    # ---- identical geometry to the forward (msda_pallas._msda_pallas)
    wv = np.array([w for h, w in spatial_shapes], np.float32)
    hv = np.array([h for h, w in spatial_shapes], np.float32)
    w_l = np.repeat(wv, MP)
    h_l = np.repeat(hv, MP)
    wh = np.empty(2 * L * MP, np.float32)
    wh[0::2] = w_l
    wh[1::2] = h_l
    t = loc_flat.astype(jnp.float32) * jnp.asarray(wh) - 0.5
    t0 = jnp.floor(t)
    fr = t - t0
    t0i = t0.astype(jnp.int32)
    x0i = t0i[..., 0::2]
    y0i = t0i[..., 1::2]
    lx = fr[..., 0::2]
    ly = fr[..., 1::2]
    wi = jnp.asarray(w_l.astype(np.int32))
    hi = jnp.asarray(h_l.astype(np.int32))
    ok = ((y0i >= -1) & (y0i <= hi - 1) & (x0i >= -1) & (x0i <= wi - 1))
    starts_all = (jnp.clip(y0i + 1, 0, hi) * (wi + 2)
                  + jnp.clip(x0i + 1, 0, wi))
    aw = jnp.where(ok, aw_flat.astype(jnp.float32), 0.0)
    w00 = (1 - ly) * (1 - lx) * aw
    w01 = (1 - ly) * lx * aw
    w10 = ly * (1 - lx) * aw
    w11 = ly * lx * aw

    def padq(x):
        return jnp.pad(x, ((0, 0), (0, lq_pad - lq), (0, 0)))

    starts_all = padq(starts_all)
    corners = [padq(x) for x in (w00, w01, w10, w11)]
    aw_all = padq(aw)
    fxy_all = padq(jnp.stack([lx, ly], -1).reshape(b, lq, -1))

    # g tiled over the 4 corner lane-blocks, per-head slabs
    g4 = jnp.moveaxis(g.reshape(b, lq, m, d), 2, 1).reshape(bm, lq, d)
    g4 = jnp.pad(jnp.tile(g4.astype(jnp.float32), (1, 1, 4)),
                 ((0, 0), (0, lq_pad - lq), (0, 0)))

    def level_slices(lvls):
        glen = len(lvls)
        l0 = lvls[0]
        sl = slice(l0 * MP, (l0 + glen) * MP)
        st = starts_all[:, :, sl]
        awp = aw_all[:, :, sl]
        w4 = jnp.concatenate(
            [c[:, :, l0 * MP + j * MP:(l0 + j + 1) * MP]
             for j in range(glen) for c in corners], axis=-1)
        fxy = fxy_all[:, :, 2 * l0 * MP:2 * (l0 + glen) * MP]
        if glen > 1:
            st = jnp.take(st, jnp.asarray(_lane_perm(m, glen, P)), axis=-1)
            awp = jnp.take(awp, jnp.asarray(_lane_perm(m, glen, P)),
                           axis=-1)
            fxy = jnp.take(fxy, jnp.asarray(_lane_perm(m, glen, P, per=2)),
                           axis=-1)
        w4 = jnp.take(w4, jnp.asarray(_corner_perm(m, glen, P)), axis=-1)
        return st, w4, awp, fxy

    level_data = []
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        val = value[:, start:start + h * w]
        start += h * w
        val4 = _quad_pack(
            jnp.moveaxis(val, 2, 1).reshape(bm, h * w, d), h, w)
        level_data.append((val4, lvl, h, w))

    row_bytes = 4 * d * value.dtype.itemsize
    chunk_rows = _CHUNK_BYTES_BWD // row_bytes // 8 * 8
    band_rows_max = _BAND_BYTES_BWD // row_bytes // 8 * 8

    gval_levels: dict = {}      # lvl -> gval4 [BM, R, 4D]
    gscal_levels: dict = {}     # lvl -> gscal [B, Lqp, M*4P] head-major

    def unslab_scal(gscal, n_samp):
        # (BM, Lqp, 4S) -> [B, Lqp, M, 4S]
        return gscal.reshape(b, m, lq_pad, 4 * n_samp).transpose(0, 2, 1, 3)

    def run_group(group):
        glen = len(group)
        if glen == 0:
            return
        qb_p = _fit_qb(qb, P * glen)
        if qb_p is not None and P * glen > 8:
            qb_p = min(qb_p, _fit_qb(128, P * glen) or qb_p)
        if qb_p is None:
            half = glen // 2
            run_group(group[:half])
            run_group(group[half:])
            return
        offs = np.cumsum([0] + [gg[0].shape[1] for gg in group[:-1]])
        gval = jnp.concatenate([gg[0] for gg in group], 1)
        lvls = [gg[1] for gg in group]
        st, w4, awp, fxy = level_slices(lvls)
        if glen > 1:
            off_lane = np.repeat(np.tile(offs.astype(np.int32), m), P)
            st = st + jnp.asarray(off_lane)
        gv, gs = _bwd_pass_call(st, w4, awp, fxy, g4, gval, b=b, m=m,
                                n_samp=P * glen, d=d, qb=qb_p,
                                interpret=interpret)
        gsl = unslab_scal(gs, P * glen)
        for j, (v4, lvl, h, w) in enumerate(group):
            r = v4.shape[1]
            o = int(offs[j]) if glen > 1 else 0
            gval_levels[lvl] = gv[:, o:o + r]
            # per-head slot j*P+p -> the level's [.., M, 4P] block
            gscal_levels[lvl] = gsl[..., 4 * j * P:4 * (j + 1) * P]

    group: list = []
    group_rows = 0
    for v4, lvl, h, w in level_data:
        rtot = v4.shape[1]
        if rtot > chunk_rows:
            run_group(group)
            group, group_rows = [], 0
            st, w4, awp, fxy = level_slices([lvl])
            nbands = -(-rtot // band_rows_max)
            per_band = -(-rtot // nbands)
            brows = -(-per_band // 8) * 8
            cid = (st // 8) * 8 // brows
            gv_parts = []
            gs_total = None
            for c in range(nbands):
                in_band = cid == c
                st_c = jnp.where(in_band, st - c * brows, -1)
                w4_c = jnp.where(jnp.repeat(in_band, 4, axis=-1), w4, 0.0)
                hi_r = min(c * brows + brows + _WIN, rtot)
                band = v4[:, c * brows:hi_r]
                rpad = (-band.shape[1]) % 8 + _WIN
                band = jnp.pad(band, ((0, 0), (0, rpad), (0, 0)))
                gv, gs = _bwd_pass_call(
                    jnp.where(in_band, st_c, 0), w4_c, awp, fxy, g4, band,
                    b=b, m=m, n_samp=P, d=d, qb=_fit_qb(qb, P),
                    interpret=interpret)
                # out-of-band samples carry clamped starts (row 0), so the
                # kernel's gather side computes spurious scalars for them:
                # keep only this band's samples
                ibm = jnp.repeat(_to_slab3(in_band.astype(jnp.float32),
                                           m, P), 4, axis=-1)
                gs = gs * ibm
                gv_parts.append(gv[:, :min(brows, rtot - c * brows)])
                gs_total = gs if gs_total is None else gs_total + gs
            gval_levels[lvl] = jnp.concatenate(gv_parts, axis=1)
            gscal_levels[lvl] = unslab_scal(gs_total, P)
            continue
        if group_rows + rtot > chunk_rows:
            run_group(group)
            group, group_rows = [], 0
        group.append((v4, lvl, h, w))
        group_rows += rtot
    run_group(group)

    # ---- assemble flat-layout grads
    gvals = []
    ga_lanes = []
    gx_lanes = []
    gy_lanes = []
    for v4, lvl, h, w in level_data:
        gu = _quad_unpack(gval_levels[lvl], h, w)          # [BM, HW, D]
        gvals.append(jnp.moveaxis(gu.reshape(b, m, h * w, d), 1, 2))
        gsl = gscal_levels[lvl][:, :lq]                    # [B,Lq,M,4P]
        gsl = gsl.reshape(b, lq, m, P, 4)
        ga_lanes.append(gsl[..., 0].reshape(b, lq, MP))
        gx_lanes.append((gsl[..., 1] * np.float32(w)).reshape(b, lq, MP))
        gy_lanes.append((gsl[..., 2] * np.float32(h)).reshape(b, lq, MP))
    grad_value = jnp.concatenate(gvals, axis=1).astype(value.dtype)
    grad_aw = jnp.concatenate(ga_lanes, axis=-1)
    okf = ok.astype(jnp.float32)
    grad_aw = (grad_aw * okf).astype(aw_flat.dtype)
    gx = jnp.concatenate(gx_lanes, axis=-1) * okf
    gy = jnp.concatenate(gy_lanes, axis=-1) * okf
    grad_loc = jnp.stack([gx, gy], -1).reshape(b, lq, -1)
    grad_loc = grad_loc.astype(loc_flat.dtype)
    return grad_value, grad_loc, grad_aw
