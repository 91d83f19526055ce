"""SimpleFPN (ViTDet-style) pyramid from a single ViT feature map.

Re-implementation of the reference SimpleFP (simple_fpn.py:100-216), used by
the HFRE when `mm_use_simpleFPN_for_vt` is set: scale factors [4, 2, 1, 0.5]
built with transposed convs / max-pool, each followed by 1x1 and 3x3 convs
with channel LayerNorms. Channel-last activations; kernels stored in
checkpoint layout (deconv: IOHW, conv: OIHW).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vlm_fo1_tpu import nn


def init_simple_fpn_params(key, dim: int = 1280, out_channels: int = 512,
                           dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 16)
    ki = iter(keys)

    def deconv(in_c, out_c):
        return {"w": nn.lecun_normal(next(ki), (in_c, out_c, 2, 2), dtype),
                "b": jnp.zeros((out_c,), dtype)}

    def conv(in_c, out_c, k):
        return nn.conv2d_init(next(ki), in_c, out_c, k, bias=False, dtype=dtype)

    def head(in_c):
        return {
            "lateral": conv(in_c, out_channels, 1),
            "lateral_norm": nn.layer_norm_init(out_channels, dtype),
            "output": conv(out_channels, out_channels, 3),
            "output_norm": nn.layer_norm_init(out_channels, dtype),
        }

    return {
        "scale4": {
            "deconv1": deconv(dim, dim // 2),
            "norm": nn.layer_norm_init(dim // 2, dtype),
            "deconv2": deconv(dim // 2, dim // 4),
            **head(dim // 4),
        },
        "scale2": {"deconv1": deconv(dim, dim // 2), **head(dim // 2)},
        "scale1": head(dim),
        "scale05": head(dim),
    }


def _deconv2x(p, x):
    """Channel-last 2x transposed conv with the checkpoint's IOHW kernel."""
    y = jax.lax.conv_transpose(
        x, p["w"], strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "IOHW", "NHWC"))
    return y + p["b"]


def _head(p, x):
    y = nn.conv2d(p["lateral"], x.transpose(0, 3, 1, 2)).transpose(0, 2, 3, 1)
    y = nn.layer_norm(p["lateral_norm"], y)
    y = nn.conv2d(p["output"], y.transpose(0, 3, 1, 2),
                  padding=1).transpose(0, 2, 3, 1)
    return nn.layer_norm(p["output_norm"], y)


def simple_fpn_forward(params: dict, x: jnp.ndarray) -> list[jnp.ndarray]:
    """x: [B, H, W, dim] single ViT map -> 4 maps at scales [4, 2, 1, 0.5]
    relative to the input (strides [3.5, 7, 14, 28] for a 14px-patch ViT)."""
    p4 = params["scale4"]
    y = _deconv2x(p4["deconv1"], x)
    y = jax.nn.gelu(nn.layer_norm(p4["norm"], y), approximate=False)
    y = _deconv2x(p4["deconv2"], y)
    out4 = _head(p4, y)

    p2 = params["scale2"]
    out2 = _head(p2, _deconv2x(p2["deconv1"], x))

    out1 = _head(params["scale1"], x)

    b, h, w, c = x.shape
    pooled = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    out05 = _head(params["scale05"], pooled)
    return [out4, out2, out1, out05]
