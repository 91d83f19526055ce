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
    # embedding untouched (tied head) under the DEFAULT patterns
    assert "w" in q["text"]["embed_tokens"]


def test_quantized_embedding_roundtrip_and_tied_head(rng):
    """ALL_QUANT_PATTERNS row-quantizes the tied embedding: gather and
    tied-head logits must both track the full-precision path."""
    import jax

    from vlm_fo1_tpu.config import FO1Config
    from vlm_fo1_tpu.models import llm
    from vlm_fo1_tpu.models.fo1 import FO1Model
    from vlm_fo1_tpu.quant import ALL_QUANT_PATTERNS

    cfg = FO1Config.tiny()
    model = FO1Model.random_init(cfg, seed=0)
    emb_full = model.params["text"]["embed_tokens"]["w"]
    q = quantize_params(jax.tree.map(lambda x: x, model.params),
                        ALL_QUANT_PATTERNS)
    emb_q = q["text"]["embed_tokens"]
    assert "w_q" in emb_q and emb_q["scale"].ndim == 1

    ids = jnp.asarray(rng.integers(0, cfg.text.vocab_size, (2, 5)))
    got = np.asarray(llm.embed_tokens(q["text"], ids), np.float32)
    want = np.asarray(jnp.take(emb_full, ids, axis=0), np.float32)
    denom = np.abs(want).max() or 1.0
    assert np.abs(got - want).max() / denom < 0.02  # int8 row quant error

    hidden = jnp.asarray(
        rng.standard_normal((1, 3, cfg.text.hidden_size)).astype(np.float32))
    lq = np.asarray(llm.lm_head_logits(q["text"], cfg.text, hidden))
    lf = np.asarray(llm.lm_head_logits(model.params["text"], cfg.text,
                                       hidden))
    # relative to the logit magnitude, per-row int8 stays well under 2%
    assert np.abs(lq - lf).max() / (np.abs(lf).max() or 1.0) < 0.02


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


def test_w8a8_linear_close_to_full_precision(rng):
    """Dynamic activation quant on top of int8 weights: error stays small
    (two independent int8 roundings) and well above gross breakage."""
    from vlm_fo1_tpu.quant import mark_w8a8

    p = {"w": jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32)),
         "b": jnp.asarray(rng.standard_normal(32).astype(np.float32))}
    x = jnp.asarray(rng.standard_normal((5, 64)).astype(np.float32))
    full = np.asarray(nn.linear(p, x))
    q = quantize_linear(dict(p))
    w8 = np.asarray(nn.linear(q, x))
    w8a8 = np.asarray(nn.linear(mark_w8a8(dict(q)), x))
    denom = np.abs(full).max() + 1e-6
    assert np.abs(w8a8 - full).max() / denom < 0.04
    # activation quant adds error on top of weight-only int8, but same order
    assert np.abs(w8a8 - full).mean() <= 4 * np.abs(w8 - full).mean() + 1e-4


def test_w8a8_outlier_channels_survive(rng):
    """LLM.int8-style static-k outlier decomposition: activation channels
    with extreme magnitudes (Qwen-family trunks have them) bypass the int8
    path, so they neither clip nor blow up the per-token scale. Without the
    decomposition this input makes naive symmetric quant flush ~all normal
    channels to zero (scale = amax/127 with amax 1e4)."""
    from vlm_fo1_tpu.quant import mark_w8a8

    p = {"w": jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))}
    x = rng.standard_normal((5, 64)).astype(np.float32)
    x[:, [3, 17]] *= 1e4  # two outlier channels, LLM.int8's motivating case
    x = jnp.asarray(x)
    full = np.asarray(nn.linear(p, x))
    w8a8 = np.asarray(nn.linear(mark_w8a8(quantize_linear(dict(p))), x))
    denom = np.abs(full).max() + 1e-6
    assert np.abs(w8a8 - full).max() / denom < 0.04


def test_w8a8_decode_step_stays_weight_only(rng):
    """Single-token (decode-shaped) calls skip activation quant: decode is
    HBM-bound, so a8 would add error for zero gain (ADVICE r1). The marked
    tree must produce bit-identical output to the weight-only tree."""
    from vlm_fo1_tpu.quant import mark_w8a8

    p = {"w": jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))}
    q = quantize_linear(dict(p))
    x = jnp.asarray(rng.standard_normal((2, 1, 64)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(nn.linear(mark_w8a8(dict(q)), x)),
        np.asarray(nn.linear(q, x)))


def test_w8a8_without_load_8bit_raises():
    """api.load_pretrained_model(w8a8=True) without load_8bit was a silent
    no-op (ADVICE r1) — now a ValueError, raised before any checkpoint IO."""
    import pytest

    from vlm_fo1_tpu.api import load_pretrained_model

    with pytest.raises(ValueError, match="w8a8"):
        load_pretrained_model("/nonexistent", w8a8=True)
    with pytest.raises(ValueError, match="w8a8"):
        load_pretrained_model("/nonexistent", load_4bit=True, w8a8=True)


def test_w8a8_marks_linears_not_embeddings(rng):
    from vlm_fo1_tpu.config import FO1Config
    from vlm_fo1_tpu.models.fo1 import FO1Model
    from vlm_fo1_tpu.quant import ALL_QUANT_PATTERNS, quantize_params_w8a8

    model = FO1Model.random_init(FO1Config.tiny(), seed=0)
    q = quantize_params_w8a8(model.params, ALL_QUANT_PATTERNS)
    assert "a8" in q["text"]["layers"]["attn"]["q_proj"]
    assert "a8" in q["vision_tower"]["blocks"]["full"]["mlp"]["gate_proj"]
    # row-quantized embedding stays on the weight-only path
    assert "w_q" in q["text"]["embed_tokens"]
    assert "a8" not in q["text"]["embed_tokens"]


def test_w8a8_generate_runs(rng):
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import StubTokenizer
    from PIL import Image

    from vlm_fo1_tpu.config import FO1Config
    from vlm_fo1_tpu.models.fo1 import FO1Model
    from vlm_fo1_tpu.quant import quantize_params_w8a8

    model = FO1Model.random_init(FO1Config.tiny(), seed=0,
                                 tokenizer=StubTokenizer())
    model.params = quantize_params_w8a8(model.params)
    img = Image.fromarray(rng.integers(0, 255, (96, 96, 3), dtype=np.uint8))
    msgs = [{"role": "user", "content": [
        {"type": "image_url", "image_url": {"url": img}},
        {"type": "text", "text": "hello"}],
        "bbox_list": [[3.0, 3.0, 60.0, 60.0]]}]
    r = model.generate(msgs, max_new_tokens=4, max_pixels=128 * 128)
    assert r.num_steps >= 1
    assert np.isfinite(np.asarray(r.token_ids)).all()


def test_int4_pack_unpack_roundtrip(rng):
    from vlm_fo1_tpu.quant import _quantize_weight_int4, unpack_int4

    w = jnp.asarray(rng.standard_normal((8, 6)).astype(np.float32))
    packed, scale = _quantize_weight_int4(w)
    assert packed.shape == (4, 6) and packed.dtype == jnp.int8
    q = np.asarray(unpack_int4(packed))
    assert q.min() >= -8 and q.max() <= 7
    # dequantized weights within half a quantization step
    deq = q.astype(np.float32) * np.asarray(scale)[None, :]
    step = np.asarray(scale)[None, :]
    assert np.all(np.abs(deq - np.asarray(w)) <= 0.5 * step + 1e-6)


def test_int4_linear_close_to_full_precision(rng):
    from vlm_fo1_tpu.quant import quantize_linear_int4
    from vlm_fo1_tpu import nn

    p = {"w": jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32)),
         "b": jnp.asarray(rng.standard_normal(8).astype(np.float32))}
    x = jnp.asarray(rng.standard_normal((3, 16)).astype(np.float32))
    full = np.asarray(nn.linear(p, x))
    q4 = np.asarray(nn.linear(quantize_linear_int4(dict(p)), x))
    # int4 is coarse: per-weight error ~scale/2 over a 16-term contraction
    # gives ~10% relative error on random weights; just bound it sanely and
    # require it to sit between the int8 error and gross breakage
    from vlm_fo1_tpu.quant import quantize_linear

    q8 = np.asarray(nn.linear(quantize_linear(dict(p)), x))
    denom = np.abs(full).mean() + 1e-6
    err4 = np.abs(q4 - full).mean() / denom
    err8 = np.abs(q8 - full).mean() / denom
    assert err8 < err4 < 0.25, (err8, err4)


def test_int4_generate_runs(rng):
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import StubTokenizer
    from PIL import Image

    from vlm_fo1_tpu.config import FO1Config
    from vlm_fo1_tpu.models.fo1 import FO1Model
    from vlm_fo1_tpu.quant import quantize_params_int4

    model = FO1Model.random_init(FO1Config.tiny(), seed=0,
                                 tokenizer=StubTokenizer())
    model.params = quantize_params_int4(model.params)
    assert any("w_q4" in str(p) for p in [model.params["text"]["layers"]])
    img = Image.fromarray(rng.integers(0, 255, (96, 96, 3), dtype=np.uint8))
    msgs = [{"role": "user", "content": [
        {"type": "image_url", "image_url": {"url": img}},
        {"type": "text", "text": "hello"}],
        "bbox_list": [[3.0, 3.0, 60.0, 60.0]]}]
    r = model.generate(msgs, max_new_tokens=4, max_pixels=128 * 128)
    assert r.num_steps >= 1
    assert np.isfinite(np.asarray(r.token_ids)).all()


@pytest.mark.parametrize("m,k,n", [(1, 32, 24), (5, 64, 48), (9, 16, 130),
                                   (128, 64, 128)])
def test_int4_matmul_kernel_matches_reference(rng, m, k, n):
    """Pallas int4 matmul (interpret mode) vs the dequantize-then-dot
    oracle, including M/N padding paths."""
    from vlm_fo1_tpu.ops.int4_matmul import int4_matmul, int4_matmul_reference
    from vlm_fo1_tpu.quant import _quantize_weight_int4

    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
    packed, scale = _quantize_weight_int4(w)
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    got = np.asarray(int4_matmul(x, packed, scale, interpret=True))
    want = np.asarray(int4_matmul_reference(x, packed, scale))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("m,d,i", [(1, 64, 256), (5, 256, 768),
                                   (16, 128, 128), (200, 128, 256),
                                   (300, 64, 128)])
def test_int4_mlp_kernel_matches_reference(rng, m, d, i):
    """Fused int4 SwiGLU kernel (interpret mode) vs its dequantize-then-
    SwiGLU oracle, covering M padding and both tile widths (256/128)."""
    from vlm_fo1_tpu.ops.int4_mlp import int4_mlp_matmul, int4_mlp_reference
    from vlm_fo1_tpu.quant import quantize_mlp_int4

    mlp = {
        "gate_proj": {"w": jnp.asarray(
            rng.standard_normal((d, i)).astype(np.float32) * 0.05)},
        "up_proj": {"w": jnp.asarray(
            rng.standard_normal((d, i)).astype(np.float32) * 0.05)},
        "down_proj": {"w": jnp.asarray(
            rng.standard_normal((i, d)).astype(np.float32) * 0.05)},
    }
    node = quantize_mlp_int4(mlp)["fused_int4"]
    x = jnp.asarray(rng.standard_normal((m, d)).astype(np.float32))
    got = np.asarray(int4_mlp_matmul(x, node, interpret=True))
    want = np.asarray(int4_mlp_reference(x, node))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    # bf16 activations (the serving dtype) stay finite and close
    xb = x.astype(jnp.bfloat16)
    gotb = np.asarray(int4_mlp_matmul(xb, node, interpret=True), np.float32)
    wantb = np.asarray(int4_mlp_reference(xb, node), np.float32)
    np.testing.assert_allclose(gotb, wantb, rtol=2e-2, atol=2e-2)


def test_int4_mlp_close_to_full_precision(rng):
    """Error positioning: fused-int4 MLP sits between int8 and breakage,
    same bound pattern as test_int4_linear_close_to_full_precision."""
    from vlm_fo1_tpu.ops.int4_mlp import int4_mlp
    from vlm_fo1_tpu.quant import quantize_mlp_int4

    d, i, m = 256, 512, 7
    mlp = {
        "gate_proj": {"w": jnp.asarray(
            rng.standard_normal((d, i)).astype(np.float32) * 0.05)},
        "up_proj": {"w": jnp.asarray(
            rng.standard_normal((d, i)).astype(np.float32) * 0.05)},
        "down_proj": {"w": jnp.asarray(
            rng.standard_normal((i, d)).astype(np.float32) * 0.05)},
    }
    x = jnp.asarray(rng.standard_normal((m, d)).astype(np.float32))

    def silu(v):
        return v * jax.nn.sigmoid(v)

    full = np.asarray((silu(x @ mlp["gate_proj"]["w"])
                       * (x @ mlp["up_proj"]["w"])) @ mlp["down_proj"]["w"])
    node = quantize_mlp_int4(mlp)["fused_int4"]
    got = np.asarray(int4_mlp(x, node))
    err = np.abs(got - full).mean() / (np.abs(full).mean() + 1e-6)
    assert err < 0.25, err


def test_int4_mlp_generate_runs(rng):
    """quantize_params_int4_mlp end to end on the tiny model: trunk MLP
    becomes the fused node, attention/embedding go int8, generate runs."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import StubTokenizer
    from PIL import Image

    from vlm_fo1_tpu.config import FO1Config
    from vlm_fo1_tpu.models.fo1 import FO1Model
    from vlm_fo1_tpu.quant import quantize_params_int4_mlp

    model = FO1Model.random_init(FO1Config.tiny(), seed=0,
                                 tokenizer=StubTokenizer())
    model.params = quantize_params_int4_mlp(model.params)
    mlp = model.params["text"]["layers"]["mlp"]
    if "fused_int4" in mlp:
        assert set(mlp["fused_int4"]) == {"gate_pk", "gate_s", "up_pk",
                                          "up_s", "down_pk", "down_s"}
    assert "w_q" in model.params["text"]["layers"]["attn"]["q_proj"]
    img = Image.fromarray(rng.integers(0, 255, (96, 96, 3), dtype=np.uint8))
    msgs = [{"role": "user", "content": [
        {"type": "image_url", "image_url": {"url": img}},
        {"type": "text", "text": "hello"}],
        "bbox_list": [[3.0, 3.0, 60.0, 60.0]]}]
    r = model.generate(msgs, max_new_tokens=4, max_pixels=128 * 128)
    assert r.num_steps >= 1
    assert np.isfinite(np.asarray(r.token_ids)).all()
