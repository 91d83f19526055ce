"""Self-contained COCO mAP scorer (evaluation/coco_map.py) against
hand-computed values — the reference defers scoring to external pycocotools
(reference evaluation/eval_coco.py:86-89); our implementation must reproduce
COCOeval bbox semantics."""

import numpy as np
import pytest

from vlm_fo1_tpu.evaluation.coco_map import (
    AREA_RANGES,
    IOU_THRS,
    evaluate_detections,
    format_metrics,
    iou_xywh,
)


def _gt(images_boxes, categories=(1,), crowd=()):
    """images_boxes: {image_id: [(cat, x, y, w, h), ...]}."""
    anns, aid = [], 1
    for img, boxes in images_boxes.items():
        for cat, x, y, w, h in boxes:
            anns.append({"id": aid, "image_id": img, "category_id": cat,
                         "bbox": [x, y, w, h], "area": w * h,
                         "iscrowd": 1 if aid in crowd else 0})
            aid += 1
    return {
        "images": [{"id": i} for i in images_boxes],
        "annotations": anns,
        "categories": [{"id": c, "name": f"c{c}"} for c in categories],
    }


def _det(image_id, cat, box, score):
    return {"image_id": image_id, "category_id": cat, "bbox": list(box),
            "score": score}


def test_iou_basics():
    d = [[0, 0, 10, 10]]
    g = [[0, 0, 10, 10], [5, 5, 10, 10], [20, 20, 5, 5]]
    ious = iou_xywh(d, g, np.zeros(3, bool))
    assert np.allclose(ious[0], [1.0, 25 / 175, 0.0])
    # crowd: union = det area
    ious_c = iou_xywh([[2, 2, 4, 4]], [[0, 0, 100, 100]], np.ones(1, bool))
    assert np.allclose(ious_c, 1.0)


def test_perfect_detection():
    gt = _gt({1: [(1, 0, 0, 50, 50)], 2: [(1, 10, 10, 60, 60)]})
    dets = [_det(1, 1, [0, 0, 50, 50], 0.9),
            _det(2, 1, [10, 10, 60, 60], 0.8)]
    m = evaluate_detections(gt, dets)
    assert m["AP"] == pytest.approx(1.0)
    assert m["AP50"] == pytest.approx(1.0)
    assert m["AR100"] == pytest.approx(1.0)


def test_fp_after_tp_does_not_hurt_ap():
    # TP at score .9, spurious FP at .8: interpolated precision at every
    # sampled recall <= 1.0 stays 1.0
    gt = _gt({1: [(1, 0, 0, 50, 50)]})
    dets = [_det(1, 1, [0, 0, 50, 50], 0.9),
            _det(1, 1, [200, 200, 10, 10], 0.8)]
    m = evaluate_detections(gt, dets)
    assert m["AP"] == pytest.approx(1.0)


def test_fp_before_tp_halves_ap():
    # FP outranks the TP: precision at full recall = 1/2, envelope flat 0.5
    gt = _gt({1: [(1, 0, 0, 50, 50)]})
    dets = [_det(1, 1, [200, 200, 10, 10], 0.9),
            _det(1, 1, [0, 0, 50, 50], 0.8)]
    m = evaluate_detections(gt, dets)
    assert m["AP"] == pytest.approx(0.5)


def test_localization_gates_iou_thresholds():
    # IoU exactly 0.6 -> matches at thresholds {.5,.55,.6} = 3/10 of AP
    gt = _gt({1: [(1, 0, 0, 10, 10)]})
    dets = [_det(1, 1, [0, 0, 10, 6], 0.9)]
    ious = iou_xywh([[0, 0, 10, 6]], [[0, 0, 10, 10]], np.zeros(1, bool))
    assert np.isclose(ious[0, 0], 0.6)
    m = evaluate_detections(gt, dets)
    assert m["AP"] == pytest.approx(3 / 10)
    assert m["AP50"] == pytest.approx(1.0)
    assert m["AP75"] == pytest.approx(0.0)


def test_crowd_absorbs_detections_without_fp():
    # one real GT (matched) + crowd region; two extra dets inside the crowd
    # are ignored, not FPs -> AP stays 1. Without crowd flag they'd be FPs.
    boxes = {1: [(1, 0, 0, 50, 50), (1, 100, 100, 500, 500)]}
    gt = _gt(boxes, crowd=(2,))
    dets = [_det(1, 1, [0, 0, 50, 50], 0.9),
            _det(1, 1, [150, 150, 20, 20], 0.85),
            _det(1, 1, [300, 300, 20, 20], 0.8)]
    m = evaluate_detections(gt, dets)
    assert m["AP"] == pytest.approx(1.0)

    gt_nc = _gt(boxes)  # same but the big region is a normal GT
    m2 = evaluate_detections(gt_nc, dets)
    assert m2["AP"] < 1.0


def test_area_range_splits():
    # one small (16x16=256 < 32^2) and one large GT (200x200), both matched
    gt = _gt({1: [(1, 0, 0, 16, 16), (1, 300, 300, 200, 200)]})
    dets = [_det(1, 1, [0, 0, 16, 16], 0.9),
            _det(1, 1, [300, 300, 200, 200], 0.8)]
    m = evaluate_detections(gt, dets)
    assert m["APsmall"] == pytest.approx(1.0)
    assert m["APlarge"] == pytest.approx(1.0)
    assert m["APmedium"] == -1.0  # no medium GT anywhere -> undefined
    assert m["AP"] == pytest.approx(1.0)


def test_maxdets_caps_recall():
    # 3 GTs, 3 perfect dets: AR1 sees only the top-scored det -> 1/3
    gt = _gt({1: [(1, 0, 0, 50, 50), (1, 100, 0, 50, 50),
                  (1, 200, 0, 50, 50)]})
    dets = [_det(1, 1, [0, 0, 50, 50], 0.9),
            _det(1, 1, [100, 0, 50, 50], 0.8),
            _det(1, 1, [200, 0, 50, 50], 0.7)]
    m = evaluate_detections(gt, dets)
    assert m["AR1"] == pytest.approx(1 / 3)
    assert m["AR10"] == pytest.approx(1.0)


def test_double_detection_is_fp():
    # two dets on one GT: second is an unmatched FP at the same recall
    gt = _gt({1: [(1, 0, 0, 50, 50)]})
    dets = [_det(1, 1, [0, 0, 50, 50], 0.9),
            _det(1, 1, [1, 1, 50, 50], 0.8)]
    m = evaluate_detections(gt, dets)
    assert m["AP"] == pytest.approx(1.0)  # envelope: TP first
    m2 = evaluate_detections(gt, dets[::-1])
    assert m2["AP"] == pytest.approx(1.0)  # scores decide order, not input


def test_missing_category_detections_zero():
    gt = _gt({1: [(1, 0, 0, 50, 50), (2, 100, 100, 50, 50)]},
             categories=(1, 2))
    dets = [_det(1, 1, [0, 0, 50, 50], 0.9)]  # nothing for cat 2
    m = evaluate_detections(gt, dets)
    assert m["AP"] == pytest.approx(0.5)  # mean over cats: 1.0 and 0.0


def test_multi_image_pooling():
    # cat pooled across images: img1 TP@.9, img2 FP@.95 ranks first
    gt = _gt({1: [(1, 0, 0, 50, 50)], 2: [(1, 0, 0, 50, 50)]})
    dets = [_det(1, 1, [0, 0, 50, 50], 0.9),
            _det(2, 1, [300, 300, 10, 10], 0.95)]
    m = evaluate_detections(gt, dets)
    # rc=[0,.5], pr=[0,.5]; envelope .5; npig=2 -> q=.5 for thr<=0.5 (51 of
    # 101 samples), 0 beyond -> AP = .5*51/101
    assert m["AP"] == pytest.approx(0.5 * 51 / 101)


def test_format_metrics_smoke():
    gt = _gt({1: [(1, 0, 0, 50, 50)]})
    m = evaluate_detections(gt, [_det(1, 1, [0, 0, 50, 50], 0.9)])
    txt = format_metrics(m)
    assert "Average Precision" in txt and "= 1.000" in txt


def test_randomized_sanity():
    rng = np.random.default_rng(0)
    images = {i: [(1, *rng.uniform(0, 300, 2), *rng.uniform(20, 80, 2))
                  for _ in range(rng.integers(1, 5))] for i in range(1, 6)}
    gt = _gt(images)
    dets = []
    for img, boxes in images.items():
        for _, x, y, w, h in boxes:
            if rng.uniform() < 0.7:  # jittered TP candidate
                dets.append(_det(img, 1,
                                 [x + rng.uniform(-5, 5),
                                  y + rng.uniform(-5, 5), w, h],
                                 float(rng.uniform(0.5, 1.0))))
        dets.append(_det(img, 1, list(rng.uniform(0, 300, 4)),
                         float(rng.uniform(0.0, 0.5))))
    m = evaluate_detections(gt, dets)
    assert 0.0 <= m["AP"] <= 1.0
    assert m["AP50"] >= m["AP"] >= m["AP75"] - 1e-9
    # drowning the pool in high-scored FPs can only lower AP
    spam = dets + [_det(1, 1, [500, 500, 5, 5], 0.99) for _ in range(20)]
    assert evaluate_detections(gt, spam)["AP"] <= m["AP"] + 1e-9
    assert len(IOU_THRS) == 10 and len(AREA_RANGES) == 4
