"""ROIAlign on channel-last feature maps (torchvision-compatible numerics).

The reference pools region features with torchvision.ops.roi_align
(hybrid_finegrained_region_encoder.py:353-358, :263-268; aligned=False).
TPU-first differences:

- channel-last [H, W, C] feature maps: each bilinear tap is a contiguous
  row-gather of the full channel vector — the gather moves 4*C bytes per tap
  and the arithmetic (weighting + bin average) runs on the VPU over the C
  lanes.
- the per-bin-grid forms (`roi_align`, `roi_align_mean`) take a static
  `sampling_ratio`; torchvision's adaptive ratio (ceil(roi_h / out_h) taps
  per bin, sampling_ratio=-1 — the reference's default) is data-dependent
  per box, which would force dynamic shapes under jit in those forms.
- `roi_align_mean_separable` recovers EXACT adaptive-ratio numerics with
  static shapes for the pooled form the HFRE consumes: the pooled weight
  matrix separates into per-axis 1-D vectors, where the adaptive tap count
  only moves weights inside a fixed-size tap buffer. It is also the fastest
  form (two 1-D scatters + an outer product + one MXU matmul).

Border semantics match torchvision exactly: a sample point with y < -1 or
y > H contributes 0; otherwise coordinates clamp to [0, H-1] and bilinear
corners clamp high (low == high at the border).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def roi_align(
    feat: jnp.ndarray,        # [H, W, C] (single image) float
    boxes: jnp.ndarray,       # [N, 4] xyxy in input-pixel coords
    output_size: int,
    spatial_scale: float,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """Returns [N, output_size, output_size, C] float32."""
    h, w, c = feat.shape
    oh = ow = int(output_size)
    ns = int(sampling_ratio)
    boxes = boxes.astype(jnp.float32) * spatial_scale
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / ow
    bin_h = roi_h / oh

    # sample grid: [N, o, ns] per axis
    iy = (jnp.arange(ns, dtype=jnp.float32) + 0.5) / ns
    ph = jnp.arange(oh, dtype=jnp.float32)
    ys = (y1[:, None, None]
          + (ph[None, :, None] + iy[None, None, :]) * bin_h[:, None, None])
    pw = jnp.arange(ow, dtype=jnp.float32)
    xs = (x1[:, None, None]
          + (pw[None, :, None] + iy[None, None, :]) * bin_w[:, None, None])

    # all sample points: [N, oh, ns_y, ow, ns_x]
    y = ys[:, :, :, None, None]
    x = xs[:, None, None, :, :]
    y = jnp.broadcast_to(y, (boxes.shape[0], oh, ns, ow, ns))
    x = jnp.broadcast_to(x, (boxes.shape[0], oh, ns, ow, ns))

    out_of_bounds = (y < -1.0) | (y > h) | (x < -1.0) | (x > w)
    yc = jnp.clip(y, 0.0, h - 1)
    xc = jnp.clip(x, 0.0, w - 1)
    y0 = jnp.floor(yc).astype(jnp.int32)
    x0 = jnp.floor(xc).astype(jnp.int32)
    y1i = jnp.minimum(y0 + 1, h - 1)
    x1i = jnp.minimum(x0 + 1, w - 1)
    ly = yc - y0
    lx = xc - x0
    hy, hx = 1.0 - ly, 1.0 - lx

    # gather in the source dtype (keeps the big map in bf16 HBM); the
    # bilinear weighting upcasts per-tap to fp32
    flat = feat.reshape(h * w, c)

    def tap(yi, xi, wgt):
        g = jnp.take(flat, (yi * w + xi).reshape(-1), axis=0)
        g = g.reshape(*yi.shape, c).astype(jnp.float32)
        return g * wgt[..., None]

    val = (tap(y0, x0, hy * hx) + tap(y0, x1i, hy * lx)
           + tap(y1i, x0, ly * hx) + tap(y1i, x1i, ly * lx))
    val = jnp.where(out_of_bounds[..., None], 0.0, val)
    # average taps within each bin: [N, oh, ns, ow, ns, C] -> [N, oh, ow, C]
    return val.mean(axis=(2, 4))


def _pooled_corner_weights(boxes, h, w, output_size, spatial_scale,
                           sampling_ratio):
    """Shared tap math for the pooled (matmul) ROIAlign forms.

    Returns (y0, x0, y1i, x1i, cw): integer corner rows/cols [N, T] in the
    [h, w] grid and the 4 per-tap corner weights cw [N, T, 4] (ordered
    (y0,x0), (y0,x1), (y1,x0), (y1,x1)), already scaled by the bin-average
    tap weight and zeroed for out-of-bounds taps."""
    n, oh, ow, ns = boxes.shape[0], int(output_size), int(output_size), \
        int(sampling_ratio)
    boxes = boxes.astype(jnp.float32) * spatial_scale
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bin_w = jnp.maximum(x2 - x1, 1.0) / ow
    bin_h = jnp.maximum(y2 - y1, 1.0) / oh

    frac = (jnp.arange(ns, dtype=jnp.float32) + 0.5) / ns
    ys = (y1[:, None, None] + (jnp.arange(oh, dtype=jnp.float32)[None, :, None]
                               + frac[None, None, :]) * bin_h[:, None, None])
    xs = (x1[:, None, None] + (jnp.arange(ow, dtype=jnp.float32)[None, :, None]
                               + frac[None, None, :]) * bin_w[:, None, None])
    # flatten taps: [N, T] with T = oh*ns * ow*ns
    y = jnp.broadcast_to(ys.reshape(n, oh * ns, 1), (n, oh * ns, ow * ns))
    x = jnp.broadcast_to(xs.reshape(n, 1, ow * ns), (n, oh * ns, ow * ns))
    y, x = y.reshape(n, -1), x.reshape(n, -1)

    oob = (y < -1.0) | (y > h) | (x < -1.0) | (x > w)
    yc = jnp.clip(y, 0.0, h - 1)
    xc = jnp.clip(x, 0.0, w - 1)
    y0 = jnp.floor(yc).astype(jnp.int32)
    x0 = jnp.floor(xc).astype(jnp.int32)
    y1i = jnp.minimum(y0 + 1, h - 1)
    x1i = jnp.minimum(x0 + 1, w - 1)
    ly, lx = yc - y0, xc - x0
    hy, hx = 1.0 - ly, 1.0 - lx

    tap_w = 1.0 / (oh * ow * ns * ns)
    cw = jnp.stack([hy * hx, hy * lx, ly * hx, ly * lx], axis=-1) * tap_w
    cw = jnp.where(oob[..., None], 0.0, cw)
    return y0, x0, y1i, x1i, cw


def roi_align_mean(feat, boxes, output_size, spatial_scale, sampling_ratio=2):
    """ROIAlign followed by spatial mean-pool -> [N, C] (the only form the
    HFRE consumes, hybrid...:361-363).

    TPU formulation: pooled ROIAlign is a *linear functional* of the feature
    map, so instead of 4 * taps row-gathers (memory-bound, ~1.2GB of traffic
    for 100 boxes on the 192x192x3840 aux stack) we scatter the ~78k bilinear
    corner weights into one [N, H*W] matrix and do a single [N, H*W] @
    [H*W, C] matmul on the MXU — the map is read exactly once. Numerically
    identical to roi_align(...).mean((1, 2)) up to fp32 summation order."""
    h, w, c = feat.shape
    n = boxes.shape[0]
    y0, x0, y1i, x1i, cw = _pooled_corner_weights(
        boxes, h, w, output_size, spatial_scale, sampling_ratio)
    idx = jnp.stack([y0 * w + x0, y0 * w + x1i,
                     y1i * w + x0, y1i * w + x1i], axis=-1)      # [N, T, 4]

    wmat = jnp.zeros((n, h * w), jnp.float32)
    wmat = wmat.at[jnp.arange(n)[:, None],
                   idx.reshape(n, -1)].add(cw.reshape(n, -1))
    flat = feat.reshape(h * w, c).astype(jnp.float32)
    return jax.numpy.matmul(wmat, flat, precision=jax.lax.Precision.HIGHEST)


def roi_align_mean_upsampled(feat, boxes, output_size, spatial_scale,
                             upsample: int, sampling_ratio=2):
    """Pooled ROIAlign over a *virtually* bilinear-upsampled feature map.

    Numerically equals
        roi_align_mean(resize(feat, upsample x, 'bilinear'), boxes, ...)
    — the HFRE aux path (reference hybrid...:338-358 upsamples DaViT stages
    to stage-0 resolution before roi_align) — but never materializes the
    upsampled map: sampling a bilinearly-upsampled map is itself a linear
    functional of the original map, so the two interpolations COMPOSE into
    one scatter-weight matrix at the original resolution. Each tap's 4
    upsampled-grid corners expand into <=16 original-grid corners. For the
    [24, 24, 2048] DaViT stage-4 map this replaces a 300MB-per-image fp32
    upsample (plus its layout copy) with a [N, 576] matmul.

    feat: [h, w, c]; spatial_scale maps box pixels to UPSAMPLED grid units;
    upsample: integer factor (half-pixel-center bilinear, the
    F.interpolate(align_corners=False) convention)."""
    h, w, c = feat.shape
    n = boxes.shape[0]
    f = float(upsample)
    h0, w0 = int(round(h * f)), int(round(w * f))
    yu0, xu0, yu1, xu1, cw = _pooled_corner_weights(
        boxes, h0, w0, output_size, spatial_scale, sampling_ratio)

    def split(iu, size):
        """Upsampled integer index -> (lo, hi, frac) in the original grid
        (half-pixel centers, edges clamped — matches jax.image.resize /
        F.interpolate bilinear for integer upscale)."""
        src = (iu.astype(jnp.float32) + 0.5) / f - 0.5
        src = jnp.clip(src, 0.0, size - 1)
        lo = jnp.floor(src).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, size - 1)
        return lo, hi, src - lo.astype(jnp.float32)

    idx_parts, w_parts = [], []
    for ci, (yu, xu) in enumerate(((yu0, xu0), (yu0, xu1),
                                   (yu1, xu0), (yu1, xu1))):
        ylo, yhi, ty = split(yu, h)
        xlo, xhi, tx = split(xu, w)
        base = cw[..., ci]
        for yy, wy in ((ylo, 1.0 - ty), (yhi, ty)):
            for xx, wx in ((xlo, 1.0 - tx), (xhi, tx)):
                idx_parts.append(yy * w + xx)
                w_parts.append(base * wy * wx)
    idx = jnp.stack(idx_parts, axis=-1).reshape(n, -1)   # [N, T*16]
    ws = jnp.stack(w_parts, axis=-1).reshape(n, -1)

    wmat = jnp.zeros((n, h * w), jnp.float32)
    wmat = wmat.at[jnp.arange(n)[:, None], idx].add(ws)
    flat = feat.reshape(h * w, c).astype(jnp.float32)
    return jax.numpy.matmul(wmat, flat, precision=jax.lax.Precision.HIGHEST)


def _axis_pooled_weights(lo, hi, size, out_bins, ns_max, sampling_ratio):
    """1-D pooled-ROIAlign weight vectors.

    Pooled (mean over the out_bins x out_bins output) ROIAlign weights
    SEPARATE per axis: every tap position is (y_tap, x_tap) from a tensor
    product grid and its bilinear weight is a product of per-axis terms, so
    the [N, H*W] pooled weight matrix is the outer product of a [N, H] and a
    [N, W] vector. This is what makes torchvision's *adaptive* sampling
    ratio (sampling_ratio=-1: ceil(extent / out_bins) taps per bin per axis,
    the reference's default at hybrid...:353-358) shape-static under jit:
    the data-dependent tap count only changes tap positions/weights inside a
    static (out_bins * ns_max)-tap buffer, never an array shape.

    lo, hi: [N] box start/end on this axis, already in feature-grid units.
    Returns [N, size] fp32 (weights include the 1/(out_bins * ns) bin-mean
    factor; out-of-bounds taps contribute 0 — multiplying the two axis
    vectors reproduces the 2-D `(y oob) | (x oob)` zeroing).
    """
    n = lo.shape[0]
    extent = jnp.maximum(hi - lo, 1.0)
    bin_sz = extent / out_bins
    if sampling_ratio > 0:
        ns = jnp.full((n,), int(sampling_ratio), jnp.int32)
        ns_max = int(sampling_ratio)
    else:  # torchvision adaptive: ceil(roi_extent / pooled_extent)
        ns = jnp.clip(jnp.ceil(bin_sz).astype(jnp.int32), 1, ns_max)
    t = jnp.arange(out_bins * ns_max)
    pb = (t // ns_max).astype(jnp.float32)          # output bin
    s = t % ns_max                                  # tap within bin
    nsf = ns.astype(jnp.float32)[:, None]
    pos = (lo[:, None]
           + (pb[None] + (s[None].astype(jnp.float32) + 0.5) / nsf)
           * bin_sz[:, None])                       # [N, T]
    live = (s[None] < ns[:, None]) & (pos >= -1.0) & (pos <= size)
    wt = jnp.where(live, 1.0 / (out_bins * nsf), 0.0)
    pc = jnp.clip(pos, 0.0, size - 1)
    i0 = jnp.floor(pc).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, size - 1)
    frac = pc - i0
    w = jnp.zeros((n, size), jnp.float32)
    rows = jnp.arange(n)[:, None]
    w = w.at[rows, i0].add(wt * (1.0 - frac))
    w = w.at[rows, i1].add(wt * frac)
    return w


def _upsample_matrix_1d(size: int, factor: int) -> np.ndarray:
    """[size*factor, size] 1-D bilinear upsample weights (half-pixel centers,
    edge clamp — jax.image.resize / F.interpolate align_corners=False)."""
    hi_size = size * factor
    u = np.zeros((hi_size, size), np.float32)
    src = np.clip((np.arange(hi_size) + 0.5) / factor - 0.5, 0.0, size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, size - 1)
    t = (src - lo).astype(np.float32)
    np.add.at(u, (np.arange(hi_size), lo), 1.0 - t)
    np.add.at(u, (np.arange(hi_size), hi), t)
    return u


def roi_align_mean_separable(feat, boxes, output_size, spatial_scale,
                             sampling_ratio=-1, upsample=1):
    """Pooled ROIAlign -> [N, C] with EXACT torchvision numerics including
    the adaptive sampling ratio (sampling_ratio=-1, the reference default —
    torchvision roi_align's signature — at hybrid...:248-268, 353-358).

    Separable formulation: per-axis 1-D pooled weight vectors (see
    _axis_pooled_weights), outer-product to the [N, H*W] weight matrix, one
    MXU matmul against the map — the feature map is read exactly once and no
    per-tap 2-D scatters are built. With upsample > 1 the map is *virtually*
    upsampled: the 1-D weights are computed on the upsampled grid and folded
    through a static [H*f, H] bilinear matrix, composing both interpolations
    without materializing the upsampled map (reference hybrid...:338-358).

    Caveat: with sampling_ratio=-1 the static tap buffer bounds the adaptive
    ratio by ceil(grid / output_size) — exact for every box that lies within
    the image (preprocessing clamps boxes there), conservative only beyond.
    """
    h, w, c = feat.shape
    f = int(upsample)
    h0, w0 = h * f, w * f
    boxes = boxes.astype(jnp.float32) * spatial_scale
    ns_max_y = -(-h0 // int(output_size))
    ns_max_x = -(-w0 // int(output_size))
    wy = _axis_pooled_weights(boxes[:, 1], boxes[:, 3], h0,
                              int(output_size), ns_max_y, sampling_ratio)
    wx = _axis_pooled_weights(boxes[:, 0], boxes[:, 2], w0,
                              int(output_size), ns_max_x, sampling_ratio)
    if f > 1:
        wy = jax.numpy.matmul(wy, jnp.asarray(_upsample_matrix_1d(h, f)),
                              precision=jax.lax.Precision.HIGHEST)
        wx = jax.numpy.matmul(wx, jnp.asarray(_upsample_matrix_1d(w, f)),
                              precision=jax.lax.Precision.HIGHEST)
    wmat = (wy[:, :, None] * wx[:, None, :]).reshape(boxes.shape[0], h * w)
    flat = feat.reshape(h * w, c).astype(jnp.float32)
    return jax.numpy.matmul(wmat, flat, precision=jax.lax.Precision.HIGHEST)


def roi_align_mean_reference(feat, boxes, output_size, spatial_scale,
                             sampling_ratio=2):
    """Gather-formulation oracle for roi_align_mean (slow path)."""
    pooled = roi_align(feat, boxes, output_size, spatial_scale, sampling_ratio)
    return pooled.mean(axis=(1, 2))


def roi_align_adaptive(
    feat: np.ndarray, boxes: np.ndarray, output_size: int,
    spatial_scale: float,
) -> np.ndarray:
    """Host/numpy reference with torchvision's *adaptive* sampling ratio
    (sampling_ratio=-1: ceil(roi extent / output bins) taps per bin). Tap
    positions are computed in float32 like torchvision's kernels on float32
    inputs (the position rounding is observable: ~1e-4 in the pooled output
    for image-sized boxes). Used in tests as the exact-parity oracle; not
    jit-compatible."""
    h, w, c = feat.shape
    oh = ow = int(output_size)
    out = np.zeros((len(boxes), oh, ow, c), np.float32)
    feat = feat.astype(np.float32)
    f32 = np.float32
    for n, (bx1, by1, bx2, by2) in enumerate(np.asarray(boxes, np.float32)):
        x1, y1 = f32(bx1 * f32(spatial_scale)), f32(by1 * f32(spatial_scale))
        x2, y2 = f32(bx2 * f32(spatial_scale)), f32(by2 * f32(spatial_scale))
        roi_w, roi_h = max(x2 - x1, f32(1.0)), max(y2 - y1, f32(1.0))
        bw, bh = f32(roi_w / ow), f32(roi_h / oh)
        nsy = int(np.ceil(f32(roi_h / oh)))
        nsx = int(np.ceil(f32(roi_w / ow)))
        for py in range(oh):
            for px in range(ow):
                acc = np.zeros(c, np.float32)
                for sy in range(nsy):
                    yy = f32(y1 + f32(f32(py + f32((sy + 0.5) / nsy)) * bh))
                    for sx in range(nsx):
                        xx = f32(x1 + f32(f32(px + f32((sx + 0.5) / nsx)) * bw))
                        if yy < -1.0 or yy > h or xx < -1.0 or xx > w:
                            continue
                        yc, xc = min(max(yy, 0.0), h - 1), min(max(xx, 0.0), w - 1)
                        y0, x0 = int(yc), int(xc)
                        y1i, x1i = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                        ly, lx = yc - y0, xc - x0
                        acc += ((1 - ly) * (1 - lx) * feat[y0, x0]
                                + (1 - ly) * lx * feat[y0, x1i]
                                + ly * (1 - lx) * feat[y1i, x0]
                                + ly * lx * feat[y1i, x1i]).astype(np.float32)
                out[n, py, px] = acc / (nsy * nsx)
    return out
