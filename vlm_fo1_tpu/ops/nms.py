"""Non-maximum suppression.

Host numpy implementation matching torchvision.ops.nms semantics (keep the
highest-scoring box, drop boxes with IoU strictly greater than the threshold)
— used by UPNWrapper.filter (reference inference_wrapper.py:186-237). A
jittable fixed-iteration variant is provided for on-device pipelines.
"""

from __future__ import annotations

import numpy as np


def nms_numpy(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float
              ) -> np.ndarray:
    """boxes [N, 4] xyxy, scores [N] -> kept indices (score-descending)."""
    boxes = np.asarray(boxes, np.float32)
    scores = np.asarray(scores, np.float32)
    order = np.argsort(-scores, kind="stable")
    x1, y1, x2, y2 = boxes.T
    areas = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        rest = order[1:]
        xx1 = np.maximum(x1[i], x1[rest])
        yy1 = np.maximum(y1[i], y1[rest])
        xx2 = np.minimum(x2[i], x2[rest])
        yy2 = np.minimum(y2[i], y2[rest])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        iou = inter / np.maximum(areas[i] + areas[rest] - inter, 1e-9)
        order = rest[iou <= iou_threshold]
    return np.asarray(keep, np.int64)


def nms_jax(boxes, scores, iou_threshold: float, max_out: int | None = None):
    """Jittable NMS: returns (keep_mask [N] bool). O(N^2) memory; fine for
    N <= a few thousand proposals."""
    import jax.numpy as jnp
    import jax

    n = boxes.shape[0]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(xx2 - xx1, 0) * jnp.maximum(yy2 - yy1, 0)
    iou = inter / jnp.maximum(areas[:, None] + areas[None, :] - inter, 1e-9)

    order = jnp.argsort(-scores, stable=True)
    inv = jnp.argsort(order)
    iou_sorted = iou[order][:, order]  # sorted by score desc

    def body(i, keep):
        # suppress i if any higher-scoring kept box overlaps it
        sup = jnp.any(keep[:i] * (iou_sorted[i, :i] > iou_threshold)
                      ) if False else jnp.sum(
            jnp.where(jnp.arange(n) < i,
                      keep & (iou_sorted[i] > iou_threshold), False)) > 0
        return keep.at[i].set(~sup)

    keep_sorted = jax.lax.fori_loop(
        0, n, body, jnp.ones((n,), bool))
    return keep_sorted[inv]
