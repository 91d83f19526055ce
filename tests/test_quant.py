"""Weight-only int8 quantization tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlm_fo1_tpu import nn
from vlm_fo1_tpu.quant import dequantize_linear, quantize_linear, quantize_params


def test_quantize_roundtrip_error_bound(rng):
    w = rng.standard_normal((64, 32)).astype(np.float32)
    p = {"w": jnp.asarray(w), "b": jnp.zeros(32)}
    q = quantize_linear(p)
    assert q["w_q"].dtype == jnp.int8
    deq = np.asarray(dequantize_linear(q, jnp.float32)["w"])
    # per-channel symmetric int8: error <= scale/2 per weight
    scale = np.asarray(q["scale"])
    assert (np.abs(deq - w) <= scale[None, :] / 2 + 1e-7).all()


def test_linear_dispatch_quantized(rng):
    x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    p = {"w": jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32)),
         "b": jnp.asarray(rng.standard_normal(32).astype(np.float32))}
    y_full = np.asarray(nn.linear(p, x))
    y_q = np.asarray(nn.linear(quantize_linear(p), x))
    # relative error small for well-conditioned weights
    rel = np.abs(y_q - y_full).max() / (np.abs(y_full).max() + 1e-6)
    assert rel < 0.02


def test_quantize_params_targets_trunk_only(rng):
    from vlm_fo1_tpu.config import FO1Config
    from vlm_fo1_tpu.models.fo1 import FO1Model

    model = FO1Model.random_init(FO1Config.tiny(), seed=0)
    q = quantize_params(model.params)
    # trunk projections quantized (stacked layers)
    assert "w_q" in q["text"]["layers"]["attn"]["q_proj"]
    assert q["text"]["layers"]["attn"]["q_proj"]["w_q"].dtype == jnp.int8
    assert "w_q" in q["text"]["layers"]["mlp"]["down_proj"]
    # vision towers untouched
    assert "w" in q["vision_tower"]["patch_embed"]["proj"]
    assert "w" in q["mm_projector"]["layers"][0]
    # embedding untouched (tied head)
    assert "w" in q["text"]["embed_tokens"]


def test_quantized_generate_close_to_full(rng):
    """End-to-end: int8 trunk produces a similar (often identical) greedy
    path on the tiny model."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import StubTokenizer
    from PIL import Image

    from vlm_fo1_tpu.config import FO1Config
    from vlm_fo1_tpu.models.fo1 import FO1Model

    model = FO1Model.random_init(FO1Config.tiny(), seed=0,
                                 tokenizer=StubTokenizer())
    img = Image.fromarray(rng.integers(0, 255, (96, 96, 3), dtype=np.uint8))
    msgs = [{"role": "user", "content": [
        {"type": "image_url", "image_url": {"url": img}},
        {"type": "text", "text": "hello"}],
        "bbox_list": [[3.0, 3.0, 60.0, 60.0]]}]
    r_full = model.generate(msgs, max_new_tokens=4, max_pixels=128 * 128)

    qmodel = FO1Model(model.cfg, quantize_params(model.params),
                      tokenizer=model.tokenizer)
    r_q = qmodel.generate(msgs, max_new_tokens=4, max_pixels=128 * 128)
    assert r_q.num_steps >= 1
    assert np.isfinite(np.asarray(r_q.token_ids)).all()
