"""Pallas TPU kernel for multi-scale deformable attention.

The XLA formulation in `ops/msda.py` expresses the bilinear sampling as
`lax.gather` with (2,2,1,D) slices; XLA:TPU lowers arbitrary gathers to a
serial HBM-latency-bound slice loop, which makes the UPN encoder (several
million samples per layer at 800x1333) minutes-slow. This kernel replaces the
gather with dynamic VMEM vector loads, the TPU-native way to do
data-dependent addressing (reference CUDA equivalent: the im2col forward
kernel at detect_tools/upn/ops/src/cuda/ms_deform_im2col_cuda.cuh:237-299).

Design:

- **Flat lane layouts.** Round 1 computed the sampling math over 6-D
  [B, Lq, M, L, P, 2] tensors; XLA:TPU tiles the last two dims as (8, 128),
  so P=4/c=2 minors waste ~97% of every pass and force layout-conversion
  copies (profiled: over half the per-layer time was this glue). Everything
  here is [B, Lq, lanes] with lanes = (level, head, point[, corner/coord])
  flattened — per-(l,m,p) constants become precomputed lane vectors, level
  slices are contiguous lane ranges, and the kernel's per-head blocks are
  carved by the BlockSpec index map (lane-block index = head), so no
  per-head transpose/copy ever materializes.

- **Quad packing.** For each padded level map [Hp*Wp, D] we precompute, with
  cheap vectorized XLA shifts, a map

      val4[r] = concat(val[r], val[r+1], val[r+Wp], val[r+Wp+1])  # [R, 4D]

  so a sample's whole 2x2 bilinear neighborhood is ONE row of 4*D = 128
  lanes (D = 32 for UPN's d_model 256 / 8 heads) — a single dynamic VMEM
  load per sample, fully using the vector unit's lane width.

- **Hierarchical group-window fast paths.** Queries are processed in
  _SG=128-query supergroups. Per (supergroup, sample slot): if all 128
  sample rows fit one _WIN=256-row window (precomputed on the XLA side —
  the common encoder case: row index = y*(W+2)+x, so adjacent row-major
  queries sample near-consecutive rows), ONE (_WIN, 4D) load + a
  (_SG, _WIN) one-hot MXU matmul selects all 128 rows at once (full-rank
  MXU rows; r1-r3 used 64-query/128-row, which halved MXU utilization
  and doubled the per-slot scalar/branch overhead — the wider groups
  measure equal at the init regime and ~6% faster with trained-style
  jittered offsets); the in-window deltas arrive as an int32 VMEM
  column. The
  supergroup loop over slots is STRAIGHT-LINE with register accumulation:
  slots that miss the window carry delta -1 (an all-zero one-hot), so
  their matmul contributes exactly zero and no branch sits between MXU
  issues — a first cut that branched per (group, slot) and accumulated
  through a VMEM scratch measured ~4x slower than the matmul cost, all
  per-slot overhead. Missed slots are then patched in per 8-query
  sublane group behind a pl.when (statement-level — a real branch;
  lax.cond with vector results executes BOTH sides on Mosaic, measured
  2x): a 16-row window + (8,16) one-hot matmul (deltas packed 4 bits
  each in one SMEM word) when the 8 rows share it, else a per-sample
  aligned (8, 4D) load + dynamic-rotate + constant-row-mask merge.
  Supergroups with no occupied slot (out-of-band in a chunked pass) skip
  everything and write zeros.

- **Exact weights.** The per-query corner weights are expanded to the
  packed lane layout by a matmul against a constant 0/1 matrix; MXU matmuls
  at default precision round f32 operands to bf16 (a ~0.4% weight error
  that interpret mode hides — round 1 shipped with it), so the expansion
  runs as a bf16x3 split (three full-rate exact dots). Every kernel dot
  pins its precision EXPLICITLY (r4): the bf16 expansion dots to DEFAULT
  (a global jax_default_matmul_precision=highest would hand Mosaic fp32
  contract precision for bf16 operands — a compile error), and the
  one-hot selection dots to HIGHEST only when the value dtype is f32
  (exact for bf16 values at DEFAULT; the toolchain rounds f32 dot
  operands to bf16 at DEFAULT, which the f32 CPU-oracle parity tests
  would see as ~2e-3 error).

- **Level chunking.** A level map must fit in VMEM; large levels are split
  into row bands, with out-of-band samples masked to weight zero and a
  per-group occupancy flag (SMEM) skipping empty groups, so total work
  stays ~one pass over the samples regardless of chunk count. Small levels
  are concatenated into shared passes.

Numerics match `ms_deform_attn_core` to f32 round-off (verified on-device
against a CPU oracle, not just in interpret mode). Gradients: forward-only;
`ms_deform_attn_core_flat` wraps it in a custom_vjp whose backward
differentiates the XLA reference formulation — UPN is inference-only
(SURVEY §2.2), so that path only serves `jax.grad` parity tests.
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
# Supergroup fast-path geometry: _SG queries share one _WIN-row window +
# one-hot matmul. r4 widened 64/128 -> 128/256: half as many supergroup
# iterations (per-slot SMEM reads, branches, matmul issues) and the
# selection matmul runs with a full 128-row MXU operand.
_SG = 128
_WIN = 256
# Grouping threshold: consecutive small levels whose quad-packed maps fit
# this many bytes share ONE kernel pass (n_samp = P*glen; its w128 scratch
# is 2MB at n_samp=16, so 2 x 5MB band buffers + scratch + blocks fit the
# 16MB scoped VMEM limit). 5MB lets the 800/1333 encoder's levels 1-4
# (~4.8MB packed) run as a single pass.
_CHUNK_BYTES = 5 * 1024 * 1024
# Band budget for a single large level (n_samp = P): pass count, not band
# size, is what the wall-clock follows (measured: level-0 at 800/1333 in
# 4 bands = 67 ms/layer, 3 bands = 56, 2 bands = 50). Two 2-band buffers
# (2 x 7.2MB) + tile-padded index blocks exceed the 16MB scoped-VMEM
# limit when the kernel sits inside a scanned trunk body (16.54M
# observed), so 6.5MB -> 3 bands is the in-scan optimum.
_BAND_BYTES = 6656 * 1024


def _expansion_matrix(n_samp: int, d: int) -> np.ndarray:
    """[4*S, S*4*D] 0/1 matrix: row (s*4+c) has ones in lanes
    [s*4D + c*D, s*4D + (c+1)*D) — expands per-(slot, corner) scalars to the
    quad-packed lane layout."""
    ex = np.zeros((4 * n_samp, n_samp * 4 * d), np.float32)
    for s in range(n_samp):
        for c in range(4):
            ex[s * 4 + c, s * 4 * d + c * d:s * 4 * d + (c + 1) * d] = 1.0
    return ex


def _msda_level_kernel(code_ref, dvm_ref, gb_ref, dw_ref, s0r_ref, w4_ref,
                       ex_ref, val4_ref, out_ref, w128_ref, acc_ref, *,
                       n_samp: int, d: int, qb: int, xp=None):
    # Per-head-slab blocks; the 8-query index arrays are flattened to a
    # dense [.., QB*S/128, 128] layout (element k at [k >> 7, k & 127]) —
    # the only 128-lane-exact shape Pallas block rules accept, and free of
    # the up-to-32x tile padding a thin [.., S<128] minor dim would cost.
    # The per-group arrays (gb, dw) arrive replicated across each group's
    # 8 queries so all three share that layout.
    # code: [1, 8, 128] int32 SMEM — row j%8 (j = query-block program id;
    #     blocks of 8 query-blocks share one fetch since a (1,1,128) SMEM
    #     block violates Mosaic's 8-row rule): per (64-query supergroup g,
    #     slot s) at lane g*S+s: -2 skip (no nonzero weight in the slot) /
    #     -1 use the per-8 paths / >=0 the 8-aligned base of the 128-row
    #     window
    # dvm: [1, QB, S] int32 VMEM — per (query, slot) in-window delta for
    #     the supergroup fast path
    # gb: [1, QB*S/128, 128] int32 SMEM — per (8-group, slot): 8-aligned
    #     base of the 16-row fast-path window, -1 -> per-sample path, or
    #     -2 -> skip (no nonzero weight in the 8-group for this slot —
    #     out-of-band in a chunked pass; skipping saves the load+matmul)
    # dw: [1, QB*S/128, 128] int32 SMEM — the 8 queries' in-window offsets,
    #     packed 4 bits each (8-query fast path)
    # s0r: [1, QB*S/128, 128] int32 SMEM — per sample, (8-aligned row base)
    #     + (the circular shift landing the row on its query's sublane)
    # w4: [1, QB, 4S] f32 (lane order slot-major: s*4 + corner)
    # ex: [4S, S*4D] bf16   val4: [1, R, 4D]
    # out: [1, QB, D] f32
    # w128 scratch: [QB, S*4D] f32   acc scratch: [64, 4D] f32
    w4v = w4_ref[0]
    hi = w4v.astype(jnp.bfloat16)
    mid = (w4v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    lo = (w4v - hi.astype(jnp.float32)
          - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    exv = ex_ref[:]
    # bf16x3 split: exact f32 expansion at full MXU rate (default-precision
    # f32 matmuls silently round operands to bf16; HIGHEST is 6x slower and
    # rejected for bf16 operands). Precision pinned DEFAULT explicitly:
    # under a global jax_default_matmul_precision=highest (the parity-test
    # config) Mosaic would otherwise receive fp32 contract precision for
    # these bf16 dots and fail to compile ("Bad lhs type").
    dotd = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.DEFAULT)
    if xp != "floor_noexp":
        w128_ref[:] = dotd(hi, exv) + dotd(mid, exv) + dotd(lo, exv)
    vdt = val4_ref.dtype
    # One-hot selection is exact for bf16 values at DEFAULT precision, but
    # the current toolchain rounds f32 dot operands to bf16 at DEFAULT —
    # f32 values (the CPU-oracle parity dtype) need HIGHEST to stay exact.
    dots = functools.partial(
        jnp.dot, preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.HIGHEST if vdt == jnp.float32
                   else jax.lax.Precision.DEFAULT))
    iota16 = jax.lax.broadcasted_iota(jnp.int32, (8, 16), 1)
    iota_win = jax.lax.broadcasted_iota(jnp.int32, (_SG, _WIN), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    shifts = row_ids * 4

    def _fold(acc):
        return (acc[:, 0:d] + acc[:, d:2 * d]
                + acc[:, 2 * d:3 * d] + acc[:, 3 * d:4 * d])

    def idx(ref, k):
        return ref[0, k >> 7, k & 127]

    jrow = jax.lax.rem(pl.program_id(1), 8)

    if xp == "floor":
        # perf experiment: empty supergroup body (zeros out) — the
        # structural floor of the fori_loop + out-write skeleton
        def body_fl(g, _):
            q0 = pl.multiple_of(g * _SG, _SG)
            out_ref[0, pl.ds(q0, _SG), :] = jnp.zeros((_SG, d), jnp.float32)
            return 0

        jax.lax.fori_loop(0, qb // _SG, body_fl, 0)
        return

    if xp == "floor_block":
        # perf experiment: whole-block zeros write, NO fori_loop — vs
        # "floor" isolates the per-supergroup loop + thin-write granularity
        out_ref[0] = jnp.zeros((qb, d), jnp.float32)
        return

    if xp == "floor_noexp":
        # perf experiment: like floor_block but also skipping the w128
        # expansion + scratch write (w128_ref untouched) — with "floor"
        # and "floor_block" splits the skeleton into
        # (expansion+scratch) / (fori+thin writes) / (grid+DMA) shares.
        # NOTE: reads nothing; Mosaic may DCE input DMAs it can prove
        # unused, so treat as a lower bound.
        out_ref[0] = jnp.zeros((qb, d), jnp.float32)
        return

    if xp == "nodelta":
        # perf experiment: branchless matmul path with CONSTANT deltas —
        # isolates the cost of the (SG,1) thin dmat slices + broadcasts
        iota_col = jax.lax.broadcasted_iota(jnp.int32, (_SG, 1), 0)

        def body_nd(g, _):
            q0 = pl.multiple_of(g * _SG, _SG)
            codes = [code_ref[0, jrow, g * n_samp + s]
                     for s in range(n_samp)]
            acc = jnp.zeros((_SG, 4 * d), jnp.float32)
            for s in range(n_samp):
                base = pl.multiple_of(jnp.maximum(codes[s], 0), 8)
                oh = (iota_win == iota_col).astype(vdt)
                blk = val4_ref[0, pl.ds(base, _WIN), :]
                acc = acc + dots(oh, blk) * w128_ref[
                    pl.ds(q0, _SG), s * 4 * d:(s + 1) * 4 * d]
            out_ref[0, pl.ds(q0, _SG), :] = _fold(acc)
            return 0

        jax.lax.fori_loop(0, qb // _SG, body_nd, 0)
        return

    if xp == "branchless":
        # perf experiment: NO pl.when anywhere — every slot takes the
        # supergroup matmul path unconditionally (missed slots contribute
        # zero via the -1 delta all-zero one-hot; WRONG results for them).
        # Isolates the cost of the kernel's branch/skip machinery.
        def body_bl(g, _):
            q0 = pl.multiple_of(g * _SG, _SG)
            codes = [code_ref[0, jrow, g * n_samp + s]
                     for s in range(n_samp)]
            dmat = dvm_ref[0, pl.ds(q0, _SG), :]
            acc = jnp.zeros((_SG, 4 * d), jnp.float32)
            for s in range(n_samp):
                base = pl.multiple_of(jnp.maximum(codes[s], 0), 8)
                delta = jax.lax.slice(dmat, (0, s), (_SG, s + 1))
                oh = (iota_win == delta).astype(vdt)
                blk = val4_ref[0, pl.ds(base, _WIN), :]
                acc = acc + dots(oh, blk) * w128_ref[
                    pl.ds(q0, _SG), s * 4 * d:(s + 1) * 4 * d]
            out_ref[0, pl.ds(q0, _SG), :] = _fold(acc)
            return 0

        jax.lax.fori_loop(0, qb // _SG, body_bl, 0)
        return

    def body(g, _):
        q0 = pl.multiple_of(g * _SG, _SG)
        codes = [code_ref[0, jrow, g * n_samp + s] for s in range(n_samp)]
        act = codes[0]
        for s in range(1, n_samp):
            act = jnp.maximum(act, codes[s])  # all -2 -> nothing occupied

        @pl.when(act == -2)
        def _skip():
            out_ref[0, pl.ds(q0, _SG), :] = jnp.zeros((_SG, d), jnp.float32)

        @pl.when(act > -2)
        def _active():
            any_miss = codes[0] == -1
            for s in range(1, n_samp):
                any_miss = jnp.logical_or(any_miss, codes[s] == -1)

            @pl.when(any_miss)
            def _zero():
                acc_ref[...] = jnp.zeros((_SG, 4 * d), jnp.float32)

            dmat = dvm_ref[0, pl.ds(q0, _SG), :]       # (SG, S) i32
            acc = jnp.zeros((_SG, 4 * d), jnp.float32)
            for s in range(n_samp):
                # straight-line: missed slots carry delta -1 -> zero
                # one-hot -> exact zero contribution; base clamps to 0
                base = pl.multiple_of(jnp.maximum(codes[s], 0), 8)
                if xp == "staticbase":  # perf experiment knobs (wrong
                    base = 0            # results; see bench_msda_kernel)
                delta = jax.lax.slice(dmat, (0, s), (_SG, s + 1))  # (SG, 1)
                if xp == "nothing":    # slot loop stripped to the w-mult
                    acc = acc + delta.astype(jnp.float32)
                    continue
                if xp == "noload":     # skip blk load + one-hot + dots
                    acc = acc + (delta.astype(jnp.float32)
                                 * w128_ref[pl.ds(q0, _SG),
                                            s * 4 * d:(s + 1) * 4 * d])
                    continue
                if xp == "noonehot":
                    oh = iota_win.astype(vdt)
                else:
                    oh = (iota_win == delta).astype(vdt)
                if xp == "nodots":     # load + one-hot gen, no matmul
                    blk = val4_ref[0, pl.ds(base, _SG), :]        # (SG, 4D)
                    sel = blk.astype(jnp.float32) + oh[:, :1].astype(
                        jnp.float32)
                else:
                    blk = val4_ref[0, pl.ds(base, _WIN), :]       # (WIN, 4D)
                    sel = dots(oh, blk)
                if xp == "noweight":
                    acc = acc + sel
                else:
                    acc = acc + sel * w128_ref[pl.ds(q0, _SG),
                                               s * 4 * d:(s + 1) * 4 * d]

            if xp == "nowhen":
                # perf experiment: drop the per-8 patch paths (WRONG results
                # on missed slots) to measure the cost of evaluating the
                # n_samp per-slot pl.when branches on the all-hit fast path
                out_ref[0, pl.ds(q0, _SG), :] = _fold(acc)
                return

            for s in range(n_samp):
                @pl.when(codes[s] == -1)
                def _per8():
                    for sub in range(_SG // 8):
                        q8 = q0 + sub * 8
                        e = q8 * n_samp + s
                        b8 = idx(gb_ref, e)

                        @pl.when(b8 >= 0)
                        def _fast8():
                            base = pl.multiple_of(b8, 8)
                            word = idx(dw_ref, e)
                            delta8 = jnp.right_shift(
                                jnp.full((8, 1), word, jnp.int32),
                                shifts) & 15
                            blk = val4_ref[0, pl.ds(base, 16), :]  # (16,4D)
                            sel = dots((iota16 == delta8).astype(vdt), blk)
                            acc_ref[pl.ds(sub * 8, 8), :] += \
                                sel * w128_ref[pl.ds(q8, 8),
                                               s * 4 * d:(s + 1) * 4 * d]

                        @pl.when(b8 == -1)
                        def _slow8():
                            m = jnp.zeros((8, 4 * d), jnp.float32)
                            for i in range(8):
                                packed = idx(s0r_ref,
                                             (q8 + i) * n_samp + s)
                                rb = pl.multiple_of(packed & -8, 8)
                                blk = val4_ref[0, pl.ds(rb, 8), :]  # (8,4D)
                                # tpu.dynamic_rotate is 32-bit only -> f32
                                rot = pltpu.roll(blk.astype(jnp.float32),
                                                 packed & 7, 0)
                                m = jnp.where(row_ids == i, rot, m)
                            acc_ref[pl.ds(sub * 8, 8), :] += \
                                m * w128_ref[pl.ds(q8, 8),
                                             s * 4 * d:(s + 1) * 4 * d]

            @pl.when(any_miss)
            def _merge():
                out_ref[0, pl.ds(q0, _SG), :] = _fold(acc + acc_ref[...])

            @pl.when(jnp.logical_not(any_miss))
            def _direct():
                out_ref[0, pl.ds(q0, _SG), :] = _fold(acc)

        return 0

    jax.lax.fori_loop(0, qb // _SG, body, 0)


def _quad_pack(val_level: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """[BM, H*W, D] -> padded quad-packed [BM, R, 4D] with R a multiple of 8
    PLUS _WIN slack rows (the supergroup fast path's _WIN-row window may
    extend that far past the last sample's aligned base)."""
    bm, _, dd = val_level.shape
    vp = jnp.pad(val_level.reshape(bm, h, w, dd),
                 ((0, 0), (1, 1), (1, 1), (0, 0)))
    wp = w + 2
    flat = vp.reshape(bm, (h + 2) * wp, dd)
    r1 = jnp.roll(flat, -1, axis=1)
    rw = jnp.roll(flat, -wp, axis=1)
    rw1 = jnp.roll(flat, -(wp + 1), axis=1)
    packed = jnp.concatenate([flat, r1, rw, rw1], axis=-1)
    rpad = -(-packed.shape[1] // 8) * 8 - packed.shape[1] + _WIN
    return jnp.pad(packed, ((0, 0), (0, rpad), (0, 0)))


def _group_meta(starts_p, w4_p, b, m, lq_pad, n_samp, force=None):
    """Per-(group, head) kernel metadata from pass-local sample rows.

    starts_p [B, Lqp, M*S], w4_p [B, Lqp, M*4S] ->
      s0r  [B, Lqp, M*S]   packed (aligned base) + (rotate amount)
      gb   [B, Lqp, M*S]   per (8-group, slot) 16-row window base, -1
                           (per-sample path) or -2 (8-group unoccupied ->
                           skip), replicated across the group's 8 queries
      dw   [B, Lqp, M*S]   packed 4-bit deltas (8-query fast path)
      code [B, nq64, M*S]  per (64-query supergroup, slot): -2 skip /
                           -1 per-8 paths / >=0 128-row window base
      dvm  [B, Lqp, M*S]   per (query, slot) supergroup-window delta,
                           -1 (all-zero one-hot) where the slot missed

    `force` ("fast8" / "slow") disables the wider fast paths — a debug /
    microbench knob threaded from ms_deform_attn_core_flat's env read.
    """
    nq8 = lq_pad // 8
    nqg = lq_pad // _SG
    s0 = (starts_p // 8) * 8
    qmod8 = (jnp.arange(lq_pad, dtype=jnp.int32) % 8)[None, :, None]
    s0r = s0 + (qmod8 - (starts_p - s0)) % 8

    sg = starts_p.reshape(b, nq8, 8, m, n_samp)
    gmin = sg.min(axis=2)
    gmax = sg.max(axis=2)                       # [B, nq8, M, S]
    gb = (gmin // 8) * 8
    fast8 = (gmax - gb) < 16                    # [B, nq8, M, S]
    delta = jnp.clip(sg - gb[:, :, None], 0, 15)
    dw = (delta << (4 * jnp.arange(8, dtype=jnp.int32)
                    )[None, None, :, None, None]).sum(axis=2)

    # _SG-query supergroup windows
    sgg = starts_p.reshape(b, nqg, _SG, m, n_samp)
    gmin_g = sgg.min(axis=2)
    gmax_g = sgg.max(axis=2)                    # [B, nqg, M, S]
    base_g = (gmin_g // 8) * 8
    fast_g = (gmax_g - base_g) < _WIN
    wg = (w4_p != 0).reshape(b, nqg, _SG, m, 4 * n_samp)
    occ_g = wg.any(axis=2).reshape(b, nqg, m, n_samp, 4).any(-1)
    if force in ("slow", "fast8"):
        fast_g = jnp.zeros_like(fast_g)
    if force == "slow":
        fast8 = jnp.zeros_like(fast8)
    code = jnp.where(occ_g, jnp.where(fast_g, base_g, -1), -2)
    # per-8-group occupancy: subgroups with no nonzero weight in a slot
    # (out-of-band samples in a chunked row-band pass) skip the per-8
    # load+matmul entirely via the -2 sentinel
    occ8 = ((w4_p != 0).reshape(b, nq8, 8, m, 4 * n_samp).any(axis=2)
            .reshape(b, nq8, m, n_samp, 4).any(-1))
    rep_g = jnp.broadcast_to(fast_g[:, :, None],
                             (b, nqg, _SG, m, n_samp)
                             ).reshape(b, lq_pad, m * n_samp)
    dvm = jnp.where(
        rep_g,
        jnp.clip(starts_p - jnp.broadcast_to(
            base_g[:, :, None], (b, nqg, _SG, m, n_samp)
        ).reshape(b, lq_pad, m * n_samp), 0, _WIN - 1),
        -1)
    gb = jnp.where(occ8, jnp.where(fast8, gb, -1), -2)

    def rep8(x):  # replicate group values across their 8 queries so gb/dw
        # share s0r's dense [.., Lqp*S/128, 128] layout
        return jnp.broadcast_to(x[:, :, None], (b, nq8, 8, m, n_samp)
                                ).reshape(b, lq_pad, m * n_samp)

    return s0r, rep8(gb), rep8(dw), code.reshape(b, nqg, m * n_samp), dvm


def _to_slab2(x, m, last):
    """[B, rows, M*last] -> [B*M, rows*last] (dense 2-D, no tile padding)."""
    b, rows, _ = x.shape
    return x.reshape(b, rows, m, last).transpose(0, 2, 1, 3).reshape(
        b * m, rows * last)


def _to_slab3(x, m, last):
    """[B, rows, M*last] -> [B*M, rows, last]."""
    b, rows, _ = x.shape
    return x.reshape(b, rows, m, last).transpose(0, 2, 1, 3).reshape(
        b * m, rows, last)


def _fit_qb(qb_top: int, n_samp: int) -> int | None:
    """Largest qb = qb_top / 2^k satisfying the kernel block constraints
    for this pass's n_samp: _SG-divisible, dense index blocks 8-row exact
    ((qb*n_samp) % 1024 == 0), and the supergroup codes fitting one
    128-lane SMEM row ((qb//_SG)*n_samp <= 128). None if no power-of-two
    reduction fits — the caller then splits the level group instead."""
    q = qb_top
    while q >= _SG:
        if (q % _SG == 0 and (q * n_samp) % 1024 == 0
                and (q // _SG) * n_samp <= 128):
            return q
        q //= 2
    return None


def _pass_call(starts_p, w4_p, val4, *, b, m, n_samp, d, qb, interpret,
               force=None, xp=None):
    """One pallas_call over one (level-group or row-band) pass.
    starts_p [B, Lqp, M*S] (pass-local rows), w4_p [B, Lqp, M*4S] (zeroed
    outside the band), val4 [BM, Rband, 4D]. Returns [BM, Lqp, D] f32."""
    lq_pad = starts_p.shape[1]
    nqb = lq_pad // qb
    rband = val4.shape[1]
    assert (qb * n_samp) % 1024 == 0, (
        "qb*n_samp must be a multiple of 1024 so the dense [.., 128] index "
        f"blocks have 8-divisible rows (qb={qb}, n_samp={n_samp})")
    assert qb % _SG == 0 and (qb // _SG) * n_samp <= 128, (
        "per-block supergroup codes must fit one 128-lane SMEM row "
        f"(qb={qb}, n_samp={n_samp})")
    s0r, gb, dw, code, dvm = _group_meta(starts_p, w4_p, b, m, lq_pad,
                                         n_samp, force)
    # per-head slabs: index arrays flatten to the dense [BM, Lqp*S/128,
    # 128] layout (see kernel doc); w4/dvm keep thin [BM, Lqp, (4)S]
    # minors (tile-padded but small)
    rows = lq_pad * n_samp // 128

    def dense128(x):
        return _to_slab2(x, m, n_samp).reshape(b * m, rows, 128)

    s0r = dense128(s0r)
    gb = dense128(gb)
    dw = dense128(dw)
    gcodes = (qb // _SG) * n_samp
    code = _to_slab3(code, m, n_samp).reshape(b * m, nqb, gcodes)
    # pad lanes to 128 and rows to a multiple of 8 (Mosaic SMEM block
    # rules); padded rows carry -2 = skip, though no program reads them
    code = jnp.pad(code, ((0, 0), (0, (-nqb) % 8), (0, 128 - gcodes)),
                   constant_values=-2)
    dvm = _to_slab3(dvm, m, n_samp)
    w4s = _to_slab3(w4_p, m, 4 * n_samp)
    if xp == "nokernel":
        # perf experiment: skip the pallas_call but keep every kernel input
        # alive (cheap sums defeat DCE) — measures the XLA-side glue
        # (sampling math, _group_meta, slab relayouts, quad packing) alone
        keep = (code.sum() + dvm.sum() + gb.sum() + dw.sum() + s0r.sum()
                + w4s.sum().astype(jnp.float32)
                + val4.astype(jnp.float32).sum())
        return jnp.zeros((b * m, lq_pad, d), jnp.float32) + keep * 1e-30
    ex = jnp.asarray(_expansion_matrix(n_samp, d), jnp.bfloat16)
    brows = qb * n_samp // 128
    return pl.pallas_call(
        functools.partial(_msda_level_kernel, n_samp=n_samp, d=d, qb=qb,
                          xp=xp),
        grid=(b * m, nqb),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda i, j: (i, j // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, qb, n_samp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, brows, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, brows, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, brows, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, qb, 4 * n_samp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * n_samp, n_samp * 4 * d),
                         lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rband, 4 * d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, qb, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * m, lq_pad, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((qb, n_samp * 4 * d), jnp.float32),
                        pltpu.VMEM((_SG, 4 * d), jnp.float32)],
        interpret=interpret,
    )(code, dvm, gb, dw, s0r, w4s, ex, val4)


def _lane_perm(m, glen, n_points, per=1):
    """Permutation taking source lanes (level-major: j, m, p[, x]) to
    target lanes (head-major: m, j, p[, x]); `per` trailing elements per
    (j, m, p) move together."""
    src = np.arange(glen * m * n_points * per).reshape(
        glen, m, n_points, per)
    return src.transpose(1, 0, 2, 3).reshape(-1)


def _corner_perm(m, glen, n_points):
    """Source lanes (j, corner, m, p) -> target (m, j, p, corner)."""
    src = np.arange(glen * 4 * m * n_points).reshape(glen, 4, m, n_points)
    return src.transpose(2, 0, 3, 1).reshape(-1)


@functools.partial(
    jax.jit,
    static_argnames=("spatial_shapes", "n_heads", "interpret", "qb",
                     "chunk_rows", "force", "xp"))
def _msda_pallas(value, spatial_shapes, loc_flat, aw_flat, *, n_heads,
                 interpret=False, qb=256, chunk_rows=None, force=None,
                 xp=None):
    """Flat-layout MSDA core. loc_flat [B, Lq, L*M*P*2] and aw_flat
    [B, Lq, L*M*P] use lane order (level, head, point[, coord]) — level
    slices are contiguous; see module doc. Returns [B, Lq, M*D] f32."""
    import math

    row_bytes = 4 * value.shape[-1] * value.dtype.itemsize
    if chunk_rows is None:
        chunk_rows = _CHUNK_BYTES // row_bytes // 8 * 8
        # adaptive band budget for single-level passes (their scratch is
        # small, so bands can be bigger than the grouping threshold)
        band_rows_max = _BAND_BYTES // row_bytes // 8 * 8
    else:
        band_rows_max = chunk_rows  # explicit override (tests) keeps the
        # one-knob behavior
    b, s, m, d = value.shape
    assert m == n_heads
    L = len(spatial_shapes)
    lq = loc_flat.shape[1]
    n_points = loc_flat.shape[2] // (L * m * 2)
    P = n_points
    MP = m * P
    bm = b * m
    # every pass's (qb * n_samp) must be a multiple of 1024 so the dense
    # [.., 128] index blocks have 8-divisible rows; pass n_samp is always a
    # multiple of P, so sizing qb for P covers grouped passes too
    qmin = 1024 // math.gcd(P, 1024)
    qb = -(-qb // qmin) * qmin
    lq_pad = -(-lq // qb) * qb

    # ---- sampling math, fully flat ([B, Lq, lanes] with per-lane consts)
    wv = np.array([w for h, w in spatial_shapes], np.float32)
    hv = np.array([h for h, w in spatial_shapes], np.float32)
    w_l = np.repeat(wv, MP)                        # [L*MP]
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
                  + jnp.clip(x0i + 1, 0, wi))      # [B, Lq, L*MP]
    aw = jnp.where(ok, aw_flat.astype(jnp.float32), 0.0)
    # corner weights, quad order (r, r+1, r+W, r+W+1)
    w00 = (1 - ly) * (1 - lx) * aw
    w01 = (1 - ly) * lx * aw
    w10 = ly * (1 - lx) * aw
    w11 = ly * lx * aw

    def padq(x):
        return jnp.pad(x, ((0, 0), (0, lq_pad - lq), (0, 0)))

    starts_all = padq(starts_all)
    corners = [padq(x) for x in (w00, w01, w10, w11)]

    def level_slices(lvls):
        """Pass arrays for consecutive levels `lvls`: starts [B,Lqp,M*S]
        (head-major) and w4 [B,Lqp,M*4S] (head-major, slot*4+corner)."""
        glen = len(lvls)
        l0 = lvls[0]
        sl = slice(l0 * MP, (l0 + glen) * MP)
        st = starts_all[:, :, sl]
        w4 = jnp.concatenate(
            [c[:, :, l0 * MP + j * MP:(l0 + j + 1) * MP]
             for j in range(glen) for c in corners], axis=-1)
        if glen > 1:
            st = jnp.take(st, jnp.asarray(_lane_perm(m, glen, P)), axis=-1)
        w4 = jnp.take(w4, jnp.asarray(_corner_perm(m, glen, P)), axis=-1)
        return st, w4

    # ---- per level: quad-packed map
    level_data = []
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        val = value[:, start:start + h * w]                    # [B,HW,M,D]
        start += h * w
        val4 = _quad_pack(
            jnp.moveaxis(val, 2, 1).reshape(bm, h * w, d), h, w)
        level_data.append((val4, lvl))

    # ---- pack levels into kernel passes (one VMEM-resident map each)
    out = jnp.zeros((bm, lq_pad, d), jnp.float32)
    group: list = []          # pending small consecutive levels
    group_rows = 0

    def flush(out, group):
        if not group:
            return out
        glen = len(group)
        qb_p = _fit_qb(qb, P * glen)
        if qb_p is not None and P * glen > 8:
            # multi-level grouped passes carry a qb*n_samp*4D f32 w128
            # scratch next to two ~5MB band buffers; qb 128 halves that
            # scratch (speed-neutral, measured) and keeps the scoped-VMEM
            # request under the 16MB limit even inside a scanned body
            # (observed 16.36M > 16M at qb 256 in upn_forward's scan)
            qb_p = min(qb_p, _fit_qb(128, P * glen) or qb_p)
        if qb_p is None:
            # no block size fits this many packed levels in one pass —
            # split the group rather than assert (large P*glen configs)
            half = glen // 2
            out = flush(out, group[:half])
            return flush(out, group[half:])
        offs = np.cumsum([0] + [g[0].shape[1] for g in group[:-1]])
        gval = jnp.concatenate([g[0] for g in group], 1)
        lvls = [g[1] for g in group]
        st, w4 = level_slices(lvls)
        if glen > 1:
            # per-level row offsets into the concatenated map, as a lane
            # vector in head-major (m, j, p) order
            off_lane = np.repeat(np.tile(offs.astype(np.int32), m), P)
            st = st + jnp.asarray(off_lane)
        else:
            st = st + jnp.int32(0)
        return out + _pass_call(st, w4, gval, b=b, m=m, n_samp=P * glen,
                                d=d, qb=qb_p, interpret=interpret,
                                force=force, xp=xp)

    for val4, lvl in level_data:
        rtot = val4.shape[1]
        if rtot > chunk_rows:
            out = flush(out, group)
            group, group_rows = [], 0
            st, w4 = level_slices([lvl])
            # minimize pass count first, then split evenly: wall-clock
            # follows the number of passes, not the band size
            nbands = -(-rtot // band_rows_max)
            per_band = -(-rtot // nbands)
            brows = -(-per_band // 8) * 8            # even split, 8-aligned
            cid = (st // 8) * 8 // brows
            for c in range(nbands):
                in_band = cid == c
                st_c = jnp.where(in_band, st - c * brows, 0)
                w4_c = jnp.where(jnp.repeat(in_band, 4, axis=-1), w4, 0.0)
                hi_r = min(c * brows + brows + _WIN, rtot)
                band = val4[:, c * brows:hi_r]
                rpad = (-band.shape[1]) % 8 + _WIN
                band = jnp.pad(band, ((0, 0), (0, rpad), (0, 0)))
                out = out + _pass_call(st_c, w4_c, band, b=b, m=m,
                                       n_samp=P, d=d, qb=_fit_qb(qb, P),
                                       interpret=interpret, force=force,
                                       xp=xp)
            continue
        if group_rows + rtot > chunk_rows:
            out = flush(out, group)
            group, group_rows = [], 0
        group.append((val4, lvl))
        group_rows += rtot
    out = flush(out, group)

    out = out[:, :lq].reshape(b, m, lq, d)
    return jnp.moveaxis(out, 1, 2).reshape(b, lq, m * d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4, 5, 6))
def ms_deform_attn_core_flat(value, spatial_shapes, loc_flat, aw_flat,
                             n_heads, interpret=False, qb=256):
    """Flat-layout MSDA ([B,Lq,M*D] out), Pallas forward — the production
    entry (msda_layer builds loc/aw directly in this layout, so no 6-D
    tensor ever materializes). Lane order (level, head, point[, coord]).

    `interpret=True` runs the kernel in interpreter mode (CPU tests).
    Backward falls back to autodiff of the XLA formulation (inference never
    takes it)."""
    import os

    return _msda_pallas(value, tuple(spatial_shapes), loc_flat, aw_flat,
                        n_heads=n_heads, interpret=interpret, qb=qb,
                        force=os.environ.get("VLM_FO1_MSDA_FORCE"))


def _flat_to_6d(spatial_shapes, loc_flat, aw_flat, n_heads):
    b, lq = loc_flat.shape[:2]
    L = len(spatial_shapes)
    P = loc_flat.shape[2] // (L * n_heads * 2)
    loc = loc_flat.reshape(b, lq, L, n_heads, P, 2).transpose(0, 1, 3, 2, 4,
                                                              5)
    aw = aw_flat.reshape(b, lq, L, n_heads, P).transpose(0, 1, 3, 2, 4)
    return loc, aw


def _flat_fwd(value, spatial_shapes, loc_flat, aw_flat, n_heads, interpret,
              qb):
    out = ms_deform_attn_core_flat(value, spatial_shapes, loc_flat, aw_flat,
                                   n_heads, interpret, qb)
    return out, (value, loc_flat, aw_flat)


def _flat_bwd(spatial_shapes, n_heads, interpret, qb, res, g):
    value, loc_flat, aw_flat = res
    import os

    backend = os.environ.get("VLM_FO1_MSDA_BWD", "auto")
    if backend == "auto":
        backend = ("pallas" if jax.default_backend() == "tpu"
                   and (4 * value.shape[-1]) % 128 == 0 else "xla")
    if backend == "pallas":
        # TPU-native col2im (ops/msda_pallas_bwd.py) — the XLA autodiff
        # path below lowers the transposed gather to a serial scatter loop
        # on TPU, which made UPN training impractical on-chip (VERDICT r4
        # #5; reference CUDA equivalent ms_deform_im2col_cuda.cuh:301-922)
        from vlm_fo1_tpu.ops.msda_pallas_bwd import msda_backward_pallas

        return msda_backward_pallas(
            value, tuple(spatial_shapes), loc_flat, aw_flat, g,
            n_heads=n_heads, interpret=interpret)

    def ref(v, lf, af):
        loc, aw = _flat_to_6d(spatial_shapes, lf, af, n_heads)
        return ms_deform_attn_core(v, spatial_shapes, loc, aw)

    _, vjp = jax.vjp(ref, value, loc_flat, aw_flat)
    return vjp(g.astype(jnp.float32))


ms_deform_attn_core_flat.defvjp(_flat_fwd, _flat_bwd)


def ms_deform_attn_core_fast(value, spatial_shapes, sampling_locations,
                             attention_weights, interpret=False, qb=256):
    """Drop-in for `ms_deform_attn_core` (6-D [B,Lq,M,L,P,2] inputs,
    [B,Lq,M*D] out). Transposes to the flat lane layout once; production
    code (msda_layer) calls ms_deform_attn_core_flat directly instead."""
    b, lq, m = sampling_locations.shape[:3]
    loc_flat = sampling_locations.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, lq, -1)
    aw_flat = attention_weights.transpose(0, 1, 3, 2, 4).reshape(b, lq, -1)
    return ms_deform_attn_core_flat(value, tuple(spatial_shapes), loc_flat,
                                    aw_flat, m, interpret, qb)
