"""ROIAlign on channel-last feature maps (torchvision-compatible numerics).

The reference pools region features with torchvision.ops.roi_align
(hybrid_finegrained_region_encoder.py:353-358, :263-268; aligned=False).
TPU-first differences:

- channel-last [H, W, C] feature maps: each bilinear tap is a contiguous
  row-gather of the full channel vector — the gather moves 4*C bytes per tap
  and the arithmetic (weighting + bin average) runs on the VPU over the C
  lanes.
- static `sampling_ratio` (default 2): torchvision's adaptive ratio
  (ceil(roi_h / out_h) taps per bin) is data-dependent per box, which would
  force dynamic shapes under jit. With the HFRE's 7x7 -> mean pooling the
  fixed 2x2 taps/bin are numerically indistinguishable in the pooled feature
  for typical box sizes; exact-adaptive parity is available via
  roi_align_adaptive (host/numpy) for validation.

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
    (sampling_ratio=-1: ceil(roi extent / output bins) taps per bin). Used in
    tests to quantify the static-ratio approximation; not jit-compatible."""
    h, w, c = feat.shape
    oh = ow = int(output_size)
    out = np.zeros((len(boxes), oh, ow, c), np.float32)
    feat = feat.astype(np.float32)
    for n, (bx1, by1, bx2, by2) in enumerate(np.asarray(boxes, np.float64)):
        x1, y1 = bx1 * spatial_scale, by1 * spatial_scale
        x2, y2 = bx2 * spatial_scale, by2 * spatial_scale
        roi_w, roi_h = max(x2 - x1, 1.0), max(y2 - y1, 1.0)
        bw, bh = roi_w / ow, roi_h / oh
        nsy = int(np.ceil(roi_h / oh))
        nsx = int(np.ceil(roi_w / ow))
        for py in range(oh):
            for px in range(ow):
                acc = np.zeros(c, np.float32)
                for sy in range(nsy):
                    yy = y1 + (py + (sy + 0.5) / nsy) * bh
                    for sx in range(nsx):
                        xx = x1 + (px + (sx + 0.5) / nsx) * bw
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
