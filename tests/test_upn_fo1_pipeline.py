"""Combined UPN->FO1 pipeline (runtime/serving.UPNFO1Pipeline, VERDICT r4
#9): the overlapped two-stage serving path must produce exactly the results
of the reference-shaped sequential flow (examples/inference_with_upn.py:
UPN inference -> filter -> bbox_list -> FO1 generate), in input order."""

import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.dirname(__file__))

from vlm_fo1_tpu.config import FO1Config
from vlm_fo1_tpu.models.fo1 import FO1Model
from vlm_fo1_tpu.runtime.serving import UPNFO1Options, UPNFO1Pipeline
from vlm_fo1_tpu.upn.model import UPNConfig
from vlm_fo1_tpu.upn.swin import SwinConfig
from vlm_fo1_tpu.upn.wrapper import UPNWrapper

TINY_SWIN = SwinConfig(embed_dim=16, depths=(1, 1, 2, 1),
                       num_heads=(1, 2, 4, 8), window_size=4)
TINY_UPN = UPNConfig(d_model=32, n_heads=4, n_points=2,
                     num_encoder_layers=2, num_decoder_layers=2,
                     d_ffn=64, num_queries=20, gn_groups=8, pos_feats=16)


@pytest.fixture(scope="module")
def models():
    from conftest import StubTokenizer

    upn = UPNWrapper.random_init(cfg=TINY_UPN, swin_cfg=TINY_SWIN)
    orig = upn.transform_image
    upn.transform_image = lambda img, **kw: orig(img, short_side=64,
                                                 max_size=96)
    fo1 = FO1Model.random_init(FO1Config.tiny(), seed=0,
                               tokenizer=StubTokenizer())
    return upn, fo1


def test_upn_fo1_pipeline_matches_sequential(tmp_path, models, rng):
    upn, fo1 = models
    paths = []
    img = rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)
    for i in range(5):
        p = os.path.join(str(tmp_path), f"im{i}.jpg")
        Image.fromarray(img).save(p)  # same pixels -> one geometry bucket
        paths.append(p)
    reqs = [{"image": p, "text": f"Find object {i}."}
            for i, p in enumerate(paths)]

    opts = UPNFO1Options(batch_size=2, min_score=0.0, nms_value=0.8,
                         max_boxes=10, max_new_tokens=6,
                         device_preproc=False)
    pipe = UPNFO1Pipeline(upn, fo1, opts)
    got = pipe.run(reqs)
    assert len(got) == 5

    # sequential reference flow per request
    for i, req in enumerate(reqs):
        raw = upn.inference(req["image"])
        det = upn.filter(raw, min_score=0.0, nms_value=0.8)
        bl = [[float(v) for v in b]
              for b in det["original_xyxy_boxes"][0][:10]]
        messages = [{
            "role": "user",
            "content": [
                {"type": "image_url", "image_url": {"url": req["image"]}},
                {"type": "text", "text": req["text"]},
            ],
            "bbox_list": bl,
        }]
        res = fo1.generate_batch([messages], max_new_tokens=6)[0]
        assert got[i]["proposals"] == bl, f"request {i}: proposal mismatch"
        assert got[i]["text"] == res.text, f"request {i}: text mismatch"
        assert isinstance(got[i]["fo1_bboxes"], dict)
