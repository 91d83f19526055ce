"""Multimodal projectors (reference multimodal_projector/builder.py:39-115).

The released FO1 checkpoint uses `mlpNx_gelu` stacks (Sequential of Linear /
GELU); `linear` and `identity` are also supported. CAbstractor / TokenPacker
variants exist in the reference builder but are not used by the released
checkpoint; they can be added behind the same interface.
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp

from vlm_fo1_tpu import nn


def init_projector_params(key, projector_type: str, in_dim: int, out_dim: int,
                          dtype=jnp.float32) -> dict:
    if projector_type == "identity":
        return {}
    if projector_type == "linear":
        return {"layers": [nn.linear_init(key, in_dim, out_dim, dtype=dtype)]}
    m = re.match(r"^mlp(\d+)x_gelu$", projector_type)
    if m:
        depth = int(m.group(1))
        keys = jax.random.split(key, depth)
        layers = [nn.linear_init(keys[0], in_dim, out_dim, dtype=dtype)]
        for i in range(1, depth):
            layers.append(nn.linear_init(keys[i], out_dim, out_dim, dtype=dtype))
        return {"layers": layers}
    raise ValueError(f"unknown projector type: {projector_type}")


def projector_forward(params: dict, projector_type: str, x: jnp.ndarray):
    if projector_type == "identity":
        return x
    layers = params["layers"]
    y = nn.linear(layers[0], x)
    for lp in layers[1:]:
        y = nn.linear(lp, jax.nn.gelu(y, approximate=False))
    return y


def convert_projector_params(sd: dict, projector_type: str) -> dict:
    """HF Sequential state dict ('0.weight', '2.weight', ...) -> pytree."""
    import numpy as np

    if projector_type == "identity":
        return {}
    if projector_type == "linear":
        p = {"w": np.ascontiguousarray(np.asarray(sd["weight"]).T)}
        if "bias" in sd:
            p["b"] = np.asarray(sd["bias"])
        return {"layers": [p]}
    if re.match(r"^mlp(\d+)x_gelu$", projector_type):
        idxs = sorted({int(k.split(".")[0]) for k in sd if k[0].isdigit()})
        layers = []
        for i in idxs:
            p = {"w": np.ascontiguousarray(np.asarray(sd[f"{i}.weight"]).T)}
            if f"{i}.bias" in sd:
                p["b"] = np.asarray(sd[f"{i}.bias"])
            layers.append(p)
        return {"layers": layers}
    raise ValueError(f"unknown projector type: {projector_type}")
