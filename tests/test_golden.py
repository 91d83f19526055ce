"""Golden end-to-end regressions: frozen inputs + seeded weights -> pinned
outputs, so a silent cross-round numerics drift anywhere in the
prepare -> encode -> splice -> prefill -> decode pipeline (or the UPN
proposal path) breaks CI instead of passing every unit test (VERDICT r2 #5;
the reference's frozen evaluation/processed_data regression pattern,
SURVEY §4).

Goldens were generated on CPU fp32 under this suite's config (8 virtual
devices, jax_default_matmul_precision=highest). To regenerate after an
INTENDED numerics change: run the bodies below and update the constants —
the diff then documents the drift.
"""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from vlm_fo1_tpu.config import FO1Config
from vlm_fo1_tpu.models.fo1 import FO1Model
from vlm_fo1_tpu.task_templates import OD_template

# --------------------------------------------------------------- fixtures

SEED_IMAGE = 1234  # np.random.default_rng stream shared by both goldens


def _frozen_fo1_inputs():
    g = np.random.default_rng(SEED_IMAGE)
    arr = g.integers(0, 255, size=(120, 160, 3), dtype=np.uint8)
    boxes = [[10.0, 5.0, 60.0, 45.0], [40.0, 30.0, 100.0, 80.0],
             [80.0, 60.0, 150.0, 110.0]]
    msgs = [{
        "role": "user",
        "content": [
            {"type": "image_url", "image_url": {"url": Image.fromarray(arr)}},
            {"type": "text", "text": OD_template.format("orange")},
        ],
        "bbox_list": boxes,
    }]
    return g, msgs


@pytest.fixture(scope="module")
def model():
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import StubTokenizer

    return FO1Model.random_init(FO1Config.tiny(), seed=0,
                                tokenizer=StubTokenizer())


# ---------------------------------------------------------------- goldens

GOLDEN_FO1_TOKENS = [10, 10, 10, 10, 10, 10, 10, 10]
GOLDEN_FO1_PROMPT_LEN = 182
GOLDEN_TOP5_IDS = [10, 104, 356, 395, 474]
GOLDEN_TOP5_LOGITS = [0.940428, 0.39714, 0.381001, 0.340168, 0.321552]
GOLDEN_LOGIT_MEAN = -0.00465545
GOLDEN_LOGIT_STD = 0.1387607

GOLDEN_UPN_BOXES = [
    [98.61819458007812, 30.599998474121094, 105.0181884765625,
     35.400001525878906],
    [17.16363525390625, 0.6000003218650818, 23.563636779785156,
     5.40000057220459],
    [22.981815338134766, 72.60000610351562, 29.381816864013672,
     77.39999389648438],
    [104.43636322021484, 84.60000610351562, 110.83635711669922,
     89.39999389648438],
    [61.86666488647461, 74.4000015258789, 87.46666717529297,
     93.60000610351562],
]
GOLDEN_UPN_SCORES = [0.9999779462814331, 0.9999717473983765,
                     0.9998805522918701, 0.999647855758667,
                     0.9992725253105164]


def test_golden_fo1_generated_tokens(model):
    """Full pipeline greedy decode: token-for-token pinned."""
    _, msgs = _frozen_fo1_inputs()
    r = model.generate(msgs, max_new_tokens=8, max_pixels=128 * 128,
                       eos_token_id=-1)
    assert r.prompt_len == GOLDEN_FO1_PROMPT_LEN
    np.testing.assert_array_equal(np.asarray(r.token_ids),
                                  GOLDEN_FO1_TOKENS)


def test_golden_fo1_prefill_logits(model):
    """First-step fp32 logits pinned (top-5 ids exact, values to 5e-4,
    full-vocab mean/std to 1e-5) — catches numerics drift even when the
    greedy argmax would not flip."""
    from vlm_fo1_tpu.models.fo1 import _splice_embeds
    from vlm_fo1_tpu.runtime.generate import pad_to_bucket, prefill

    _, msgs = _frozen_fo1_inputs()
    prep = model.prepare(msgs, max_pixels=128 * 128)
    vt, _, nb, regp = model.encode(prep)
    info = prep["splice"]
    s = info.seq_len
    pad_len = pad_to_bucket(s, 128)
    reg_pos = np.full(nb, s, np.int32)
    reg_pos[:len(info.region_positions)] = info.region_positions
    embeds = _splice_embeds(
        model.params["text"], jnp.asarray(info.input_ids), vt,
        jnp.asarray(info.image_positions), regp, jnp.asarray(reg_pos),
        pad_len=pad_len)
    pos = np.zeros((3, 1, pad_len), np.int32)
    pos[:, :, :s] = prep["position_ids"]
    _, logits = prefill(model.params["text"], model.cfg.text, embeds,
                        jnp.asarray(pos), jnp.asarray([s]),
                        cache_len=pad_len + 8)
    lg = np.asarray(logits, np.float64)[0]
    np.testing.assert_array_equal(np.argsort(-lg)[:5], GOLDEN_TOP5_IDS)
    np.testing.assert_allclose(lg[GOLDEN_TOP5_IDS], GOLDEN_TOP5_LOGITS,
                               atol=5e-4, rtol=0)
    np.testing.assert_allclose(lg.mean(), GOLDEN_LOGIT_MEAN, atol=1e-5)
    np.testing.assert_allclose(lg.std(), GOLDEN_LOGIT_STD, atol=1e-5)


def test_golden_upn_proposals():
    """UPN tiny-config proposal set pinned: top-5 score-sorted boxes
    (original-pixel xyxy) and scores."""
    from vlm_fo1_tpu.upn.model import UPNConfig
    from vlm_fo1_tpu.upn.swin import SwinConfig
    from vlm_fo1_tpu.upn.wrapper import UPNWrapper

    tiny_swin = SwinConfig(embed_dim=16, depths=(1, 1, 2, 1),
                           num_heads=(1, 2, 4, 8), window_size=4)
    tiny_upn = UPNConfig(d_model=32, n_heads=4, n_points=2,
                         num_encoder_layers=2, num_decoder_layers=2,
                         d_ffn=64, num_queries=20, gn_groups=8, pos_feats=16)
    upn = UPNWrapper.random_init(cfg=tiny_upn, swin_cfg=tiny_swin)
    g, _ = _frozen_fo1_inputs()
    # consume the image draw so the UPN image matches the generator state
    # the goldens were produced with (FO1 image drawn first from the stream)
    img = Image.fromarray(g.integers(0, 255, size=(96, 128, 3),
                                     dtype=np.uint8))
    orig = upn.transform_image
    upn.transform_image = lambda im: orig(im, short_side=64, max_size=96)
    raw = upn.inference(img)
    np.testing.assert_allclose(raw["original_xyxy_boxes"][0, :5],
                               GOLDEN_UPN_BOXES, atol=1e-2, rtol=0)
    np.testing.assert_allclose(raw["scores"][0, :5, 0],
                               GOLDEN_UPN_SCORES, atol=1e-4, rtol=0)
