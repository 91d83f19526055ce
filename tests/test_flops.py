"""FLOP accounting (runtime/flops.py) oracled against XLA's own
cost_analysis on compiled forwards. The analytic counts cover MXU-shaped
work only, so the expected ratio is slightly below 1 (norms/softmax/rotary
omitted); the bounds here catch order-of-magnitude and padded-vs-unpadded
accounting errors, which is what MFU reporting needs.

Note: XLA cost_analysis counts a lax.scan body ONCE regardless of trip
count, so scanned trunks are checked with num_layers=1.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlm_fo1_tpu.config import DaViTConfig, FO1Config
from vlm_fo1_tpu.runtime import flops as F


def _xla_flops(fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def test_davit_flops_vs_xla():
    from vlm_fo1_tpu.models.davit import davit_forward, init_davit_params

    cfg = DaViTConfig(depths=(1, 1, 2, 1))  # davit-large dims, sliced depth
    p = init_davit_params(jax.random.PRNGKey(0), cfg)
    img = jnp.zeros((1, 192, 192, 3))
    got = _xla_flops(lambda pp, x: davit_forward(pp, cfg, x), p, img)
    want = F.davit_flops(cfg, 192)
    assert 0.90 < want / got < 1.05, (want, got)


def test_swin_flops_vs_xla():
    from vlm_fo1_tpu.upn.swin import (
        SwinConfig,
        init_swin_params,
        swin_forward,
    )

    cfg = SwinConfig()  # real Swin-L
    p = init_swin_params(jax.random.PRNGKey(0), cfg)
    img = jnp.zeros((1, 192, 192, 3))
    got = _xla_flops(lambda pp, x: swin_forward(pp, cfg, x), p, img)
    want = F.swin_flops(cfg, 192, 192)
    assert 0.90 < want / got < 1.05, (want, got)


def test_prefill_flops_vs_xla():
    from vlm_fo1_tpu.models import llm
    from vlm_fo1_tpu.runtime.generate import prefill

    t = dataclasses.replace(FO1Config.tiny().text, num_hidden_layers=1,
                            hidden_size=128, intermediate_size=256,
                            num_attention_heads=4, num_key_value_heads=2,
                            head_dim=32, mrope_section=(4, 6, 6))
    p = llm.init_text_params(jax.random.PRNGKey(0), t)
    s = 128
    emb = jnp.zeros((1, s, t.hidden_size))
    pos = jnp.zeros((3, 1, s), jnp.int32)
    sl = jnp.asarray([s], np.int32)
    got = _xla_flops(
        lambda pp, e: prefill(pp, t, e, pos, sl, cache_len=s), p, emb)
    want = F.prefill_flops(t, s)
    assert 0.85 < want / got < 1.1, (want, got)


def test_decode_flops_scaling():
    t = FO1Config().text
    base = F.decode_flops(t, 1, 0)
    # ~2x params-stream per token: qkv+o+mlp+head dominate at short context
    assert base > 2 * (t.num_hidden_layers
                       * (t.hidden_size * t.intermediate_size * 3))
    # attention term grows with context
    far = F.decode_flops(t, 1, 4096)
    assert far > base
    # n tokens ~ n * per-token at fixed context scale
    n32 = F.decode_flops(t, 32, 1000)
    assert 31 * F.decode_flops(t, 1, 1000) < n32 < 33 * F.decode_flops(
        t, 1, 1032)


def test_upn_flops_magnitude():
    from vlm_fo1_tpu.upn.model import UPNConfig
    from vlm_fo1_tpu.upn.swin import SwinConfig

    total = F.upn_flops(UPNConfig(), SwinConfig(), 832, 1344)
    swin = F.swin_flops(SwinConfig(), 832, 1344)
    # backbone must dominate but not be the whole thing
    assert swin < total < 3 * swin
    # encoder MSDA over ~36k tokens is the next-largest block
    assert total / 1e12 > 1.0  # >1 TFLOP at the 800/1333 transform


def test_mfu_report_shape():
    rep = F.mfu_report({"encode": (1e12, 0.5), "decode": (1e11, 0.25)})
    assert rep["encode"]["tflop_s"] == 2.0
    assert rep["encode"]["mfu"] == pytest.approx(2.0 / 197.0, abs=1e-4)
    assert rep["total"]["gflops"] == pytest.approx(1100.0, rel=1e-3)
    assert rep["peak_tflop_s"] == pytest.approx(197.0)
