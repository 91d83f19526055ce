"""DaViT aux encoder: stage shapes, window-attention equivalences."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlm_fo1_tpu.config import DaViTConfig
from vlm_fo1_tpu.models.davit import (
    _channel_attention,
    _window_attention,
    davit_forward,
    init_davit_params,
)
from vlm_fo1_tpu import nn


def test_stage_shapes(rng):
    cfg = DaViTConfig(depths=(1, 1, 2, 1), embed_dims=(8, 16, 32, 64),
                      num_heads=(1, 2, 4, 8), num_groups=(1, 2, 4, 8),
                      image_size=96)
    params = init_davit_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.standard_normal((1, 96, 96, 3)).astype(np.float32))
    outs = davit_forward(params, cfg, x)
    shapes = [tuple(o.shape) for o in outs]
    assert shapes == [(1, 24, 24, 8), (1, 12, 12, 16),
                      (1, 6, 6, 32), (1, 3, 3, 64)]
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()


def test_window_attention_single_window_equals_full(rng):
    """When the window covers the whole map, window attention must equal a
    plain MHA over all tokens."""
    dim, heads = 16, 2
    key = jax.random.PRNGKey(1)
    p = {
        "norm": nn.layer_norm_init(dim),
        "qkv": nn.linear_init(key, dim, dim * 3),
        "proj": nn.linear_init(jax.random.PRNGKey(2), dim, dim),
    }
    x = jnp.asarray(rng.standard_normal((1, 6, 6, dim)).astype(np.float32))
    out_win = _window_attention(p, x, heads, window=6)

    # manual full attention
    y = nn.layer_norm(p["norm"], x).reshape(1, 36, dim)
    qkv = nn.linear(p["qkv"], y).reshape(1, 36, 3, heads, dim // heads)
    full = nn.sdpa(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2])
    full = nn.linear(p["proj"], full.reshape(1, 36, dim)).reshape(1, 6, 6, dim)
    np.testing.assert_allclose(np.asarray(out_win), np.asarray(x + full),
                               atol=1e-5)


def test_window_attention_locality(rng):
    """Tokens in different windows must not influence each other."""
    dim, heads = 8, 1
    p = {
        "norm": nn.layer_norm_init(dim),
        "qkv": nn.linear_init(jax.random.PRNGKey(1), dim, dim * 3),
        "proj": nn.linear_init(jax.random.PRNGKey(2), dim, dim),
    }
    x = rng.standard_normal((1, 8, 8, dim)).astype(np.float32)
    out1 = np.asarray(_window_attention(p, jnp.asarray(x), heads, window=4))
    x2 = x.copy()
    x2[0, 6, 6] += 10.0  # perturb bottom-right window
    out2 = np.asarray(_window_attention(p, jnp.asarray(x2), heads, window=4))
    # top-left window output unchanged
    np.testing.assert_allclose(out1[0, :4, :4], out2[0, :4, :4], atol=1e-6)
    # bottom-right window did change
    assert np.abs(out1[0, 4:, 4:] - out2[0, 4:, 4:]).max() > 1e-3


def test_depthwise_taps_match_grouped_conv(rng):
    """The shifted multiply-add depthwise formulation must equal XLA's
    grouped conv (the lowering it replaces for speed on TPU)."""
    from vlm_fo1_tpu.models.davit import _conv_nhwc

    c = 24
    p = {
        "w": jnp.asarray(rng.standard_normal((c, 1, 3, 3)).astype(np.float32)),
        "b": jnp.asarray(rng.standard_normal(c).astype(np.float32)),
    }
    x = jnp.asarray(rng.standard_normal((2, 9, 11, c)).astype(np.float32))
    got = _conv_nhwc(p, x, stride=1, padding=1, groups=c)
    want = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "OIHW", "NHWC"), feature_group_count=c,
    ) + p["b"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_channel_attention_shape(rng):
    dim, groups = 12, 3
    p = {
        "norm": nn.layer_norm_init(dim),
        "qkv": nn.linear_init(jax.random.PRNGKey(1), dim, dim * 3),
        "proj": nn.linear_init(jax.random.PRNGKey(2), dim, dim),
    }
    x = jnp.asarray(rng.standard_normal((2, 5, 7, dim)).astype(np.float32))
    out = _channel_attention(p, x, groups)
    assert out.shape == (2, 5, 7, dim)
    assert np.isfinite(np.asarray(out)).all()
