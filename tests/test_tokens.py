"""Prompt assembly / sentinel splice / parsing tests."""

import numpy as np

from vlm_fo1_tpu.constants import (
    IM_END_TOKEN_ID,
    IM_START_TOKEN_ID,
    IMAGE_TOKEN_INDEX,
    REGION_TOKEN_INDEX,
)
from vlm_fo1_tpu.postprocess import (
    extract_predictions_to_bboxes,
    extract_predictions_to_indexes,
    first_integer,
    strip_region_tokens,
)
from vlm_fo1_tpu.preprocess.tokens import (
    build_chat_tokens,
    expand_multimodal_tokens,
    tokenizer_image_region_token,
    tokenizer_image_token,
)


def test_image_token_splice(stub_tokenizer):
    ids = tokenizer_image_token("ab<image>cd", stub_tokenizer)
    assert ids == [ord("a"), ord("b"), IMAGE_TOKEN_INDEX, ord("c"), ord("d")]


def test_image_region_token_splice(stub_tokenizer):
    ids = tokenizer_image_region_token(
        "x<image>y<regionfeat>z<regionfeat>w", stub_tokenizer)
    assert ids == [
        ord("x"), IMAGE_TOKEN_INDEX, ord("y"), REGION_TOKEN_INDEX,
        ord("z"), REGION_TOKEN_INDEX, ord("w"),
    ]


def test_build_chat_tokens_injects_system_and_assistant(stub_tokenizer):
    messages = [{
        "role": "user",
        "content": [
            {"type": "image_url", "image_url": {"url": "img.jpg"}},
            {"type": "text", "text": "hello"},
        ],
        "bbox_list": [[1, 2, 3, 4], [5, 6, 7, 8]],
    }]
    prompt, tokens, urls, boxes = build_chat_tokens(stub_tokenizer, messages)
    assert prompt.startswith("<|im_start|>system\n")
    assert prompt.endswith("<|im_start|>assistant\n")
    assert "<region0><regionfeat><region1><regionfeat>" in prompt
    assert urls == ["img.jpg"]
    assert boxes == [[1, 2, 3, 4], [5, 6, 7, 8]]
    assert tokens.count(IMAGE_TOKEN_INDEX) == 1
    assert tokens.count(REGION_TOKEN_INDEX) == 2
    assert tokens.count(IM_START_TOKEN_ID) == 3  # system, user, assistant
    assert tokens.count(IM_END_TOKEN_ID) == 2


def test_expand_multimodal_tokens():
    tokens = [7, IMAGE_TOKEN_INDEX, 9, REGION_TOKEN_INDEX, REGION_TOKEN_INDEX, 11]
    info = expand_multimodal_tokens(tokens, units_per_image=[3],
                                    image_token_id=500)
    np.testing.assert_array_equal(
        info.input_ids,
        [7, 500, 500, 500, 9, REGION_TOKEN_INDEX, REGION_TOKEN_INDEX, 11])
    np.testing.assert_array_equal(info.image_positions, [1, 2, 3])
    np.testing.assert_array_equal(info.region_positions, [5, 6])
    assert info.seq_len == 8


def test_extract_predictions():
    text = ("I found <ground>orange</ground><objects><region3><region7>"
            "</objects> and <ground>apple</ground><objects><region1></objects>"
            " and more <ground>orange</ground><objects><region2></objects>")
    idx = extract_predictions_to_indexes(text)
    assert idx == {"orange": {3, 7, 2}, "apple": {1}}
    boxes = [[i, i, i + 1, i + 1] for i in range(8)]
    out = extract_predictions_to_bboxes(text, boxes)
    assert sorted(out["orange"]) == [boxes[2], boxes[3], boxes[7]]


def test_counting_helpers():
    s = "There are <region1><region2><region3> 3 oranges"
    assert strip_region_tokens(s) == "There are  3 oranges"
    assert first_integer(strip_region_tokens(s)) == 3
    assert first_integer("no digits") is None
