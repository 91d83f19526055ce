"""Evaluation runner tests on the tiny model with fabricated data files."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from vlm_fo1_tpu.config import FO1Config
from vlm_fo1_tpu.evaluation.runners import eval_coco, eval_countbench, extract_count
from vlm_fo1_tpu.models.fo1 import FO1Model


def test_extract_count():
    assert extract_count("There are <region1><region2> 4 oranges") == 4
    assert extract_count("<region12><region3>") == 0
    assert extract_count("no numbers here") == 0
    assert extract_count("I count 12 items") == 12


@pytest.fixture(scope="module")
def model():
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import StubTokenizer

    return FO1Model.random_init(FO1Config.tiny(), seed=0,
                                tokenizer=StubTokenizer())


def _write_images(tmp, rng, names):
    for n in names:
        Image.fromarray(rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)
                        ).save(os.path.join(tmp, n))


def test_eval_countbench_runs(tmp_path, model, rng):
    tmp = str(tmp_path)
    _write_images(tmp, rng, ["a.jpg", "b.jpg"])
    data = [
        {"question": "How many x?", "answer": 2, "image": "a.jpg",
         "bboxes": [[1, 1, 30, 30], [5, 5, 60, 50]], "scores": [0.9, 0.8]},
        {"question": "How many y?", "answer": 1, "image": "b.jpg",
         "bboxes": [[2, 2, 40, 40]], "scores": [0.7]},
    ]
    path = os.path.join(tmp, "count.json")
    json.dump(data, open(path, "w"))
    out = eval_countbench(model, path, tmp, max_new_tokens=4, verbose=False)
    assert out["total"] == 2
    assert 0.0 <= out["accuracy"] <= 1.0
    assert len(out["predictions"]) == 2


def test_eval_coco_runs(tmp_path, model, rng, monkeypatch):
    tmp = str(tmp_path)
    _write_images(tmp, rng, ["c.jpg"])
    rows = [{"id": 42, "image": "c.jpg",
             "bbox_list": [[1, 1, 30, 30], [5, 5, 60, 50]],
             "score_list": [0.9, 0.8],
             "conversations": [{"value": "Please detect cat."}]}]
    eval_path = os.path.join(tmp, "eval.jsonl")
    with open(eval_path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    orig_path = os.path.join(tmp, "instances.json")
    json.dump({"categories": [{"name": "cat", "id": 7}]}, open(orig_path, "w"))

    # random weights emit no markup; patch generate to a grounded answer to
    # exercise the COCO record construction
    class R:
        text = "<ground>cat</ground><objects><region0><region1></objects>"

    monkeypatch.setattr(model, "generate", lambda *a, **k: R())
    out_path = os.path.join(tmp, "pred.json")
    res = eval_coco(model, eval_path, orig_path, tmp, out_path)
    assert len(res) == 2
    assert res[0]["image_id"] == 42
    assert res[0]["category_id"] == 7
    assert res[0]["bbox"] == [1, 1, 29, 29]
    assert res[0]["score"] == 0.9
    assert os.path.exists(out_path)


_REF_DATA = "/root/reference/evaluation/processed_data"


@pytest.mark.skipif(not os.path.isdir(_REF_DATA),
                    reason="reference frozen eval data not present")
def test_eval_countbench_on_reference_frozen_data(tmp_path, model):
    """Pin the runner to the reference's REAL frozen eval files
    (evaluation/processed_data/*_with_upn_score_0.3_0.8.json): schema,
    bbox/score threading, and the <=100-box cap. The benchmark images are
    not shipped with the reference, so stub JPEGs stand in for them — the
    point is the data plumbing, not the accuracy number."""
    cb = json.load(open(os.path.join(
        _REF_DATA, "countbench_with_upn_score_0.3_0.8.json")))
    px = json.load(open(os.path.join(
        _REF_DATA, "pixmoCount_with_upn_score_0.3_0.8.json")))
    # frozen-file invariants the runner relies on
    assert len(cb) == 487 and len(px) == 529
    for item in cb:
        assert set(item) == {"question", "answer", "image", "bboxes",
                             "scores"}
        assert len(item["bboxes"]) == len(item["scores"]) <= 100
        assert all(len(b) == 4 for b in item["bboxes"])
        # the filename's 0.3_0.8 = (score floor, NMS threshold): scores
        # are floored at 0.3 but range up to ~0.92 in the frozen file
        assert all(0.3 <= s <= 1.0 for s in item["scores"])
    for item in px:  # pixmo rows carry no scores key
        assert set(item) == {"question", "answer", "image", "bboxes"}
        assert len(item["bboxes"]) <= 100

    # run the first rows of each file through the tiny model with stub
    # images named as the frozen data expects
    tmp = str(tmp_path)
    rng = np.random.default_rng(0)
    subset = cb[:2] + px[:1]
    _write_images(tmp, rng, [item["image"] for item in subset])
    sub_path = os.path.join(tmp, "ref_subset.json")
    json.dump(subset, open(sub_path, "w"))
    out = eval_countbench(model, sub_path, tmp, max_new_tokens=4,
                          verbose=False)
    assert out["total"] == 3
    assert out["ground_truth"] == [item["answer"] for item in subset]
    assert all(isinstance(p, int) for p in out["predictions"])


def test_eval_countbench_batched_matches_sequential(tmp_path, model, rng):
    """batch_size=2 must yield the same greedy predictions as batch_size=1."""
    tmp = str(tmp_path)
    _write_images(tmp, rng, ["a.jpg", "b.jpg", "c.jpg"])
    data = [
        {"question": "How many x?", "answer": 2, "image": "a.jpg",
         "bboxes": [[1, 1, 30, 30], [5, 5, 60, 50]], "scores": [0.9, 0.8]},
        {"question": "How many y?", "answer": 1, "image": "b.jpg",
         "bboxes": [[2, 2, 40, 40]], "scores": [0.7]},
        {"question": "How many z?", "answer": 3, "image": "c.jpg",
         "bboxes": [[3, 3, 20, 25]], "scores": [0.6]},
    ]
    path = os.path.join(tmp, "count.json")
    json.dump(data, open(path, "w"))
    seq = eval_countbench(model, path, tmp, max_new_tokens=4, verbose=False)
    bat = eval_countbench(model, path, tmp, max_new_tokens=4, verbose=False,
                          batch_size=2)
    assert bat["total"] == 3
    assert bat["predictions"] == seq["predictions"]


def test_eval_countbench_pipelined_matches_batched(tmp_path, model, rng):
    """pipelined=True is a host-scheduling change only: same predictions."""
    tmp = str(tmp_path)
    _write_images(tmp, rng, ["a.jpg", "b.jpg", "c.jpg"])
    data = [
        {"question": "How many x?", "answer": 2, "image": "a.jpg",
         "bboxes": [[1, 1, 30, 30], [5, 5, 60, 50]], "scores": [0.9, 0.8]},
        {"question": "How many y?", "answer": 1, "image": "b.jpg",
         "bboxes": [[2, 2, 40, 40]], "scores": [0.7]},
        {"question": "How many z?", "answer": 3, "image": "c.jpg",
         "bboxes": [[3, 3, 20, 25]], "scores": [0.6]},
    ]
    path = os.path.join(tmp, "count.json")
    json.dump(data, open(path, "w"))
    bat = eval_countbench(model, path, tmp, max_new_tokens=4, verbose=False,
                          batch_size=2)
    pipe = eval_countbench(model, path, tmp, max_new_tokens=4, verbose=False,
                           batch_size=2, pipelined=True)
    assert pipe["predictions"] == bat["predictions"]
