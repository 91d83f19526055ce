"""Device-mesh parallelism: DP + TP via NamedSharding over a Mesh.

The reference is single-GPU (SURVEY.md §2.4: no distributed code anywhere);
its config carries a dormant HF tensor-parallel plan
(configuration_qwen2_5_vl.py:178-186 — q/k/v/gate/up colwise, o/down rowwise)
which we realise natively here: parameters get NamedShardings matching that
plan, jit/GSPMD inserts the all-reduces over the mesh's ICI axis, and data
parallelism shards the batch axis. No explicit collectives are written —
XLA derives reduce-scatter/all-gather from the shardings.

Mesh convention: axis "data" for batch sharding (DP), axis "model" for
tensor parallelism (TP). Sequence-parallel growth path: shard the sequence
axis of activations over "model" between attention blocks (not required for
reference parity; see SURVEY.md §2.4).
"""

from __future__ import annotations

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(data: int = 1, model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh. With devices=None uses all local devices;
    total must equal data*model."""
    if devices is None:
        devices = jax.devices()
    n = data * model
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


# (path regex, PartitionSpec) — first match wins. Kernel layout is [in, out].
_RULES: list[tuple[str, P]] = [
    # LLM trunk (stacked [num_layers, ...] for the scanned forward):
    # the HF tp_plan expressed natively
    (r"text/layers/attn/(q_proj|k_proj|v_proj)/w$", P(None, None, "model")),
    (r"text/layers/attn/(q_proj|k_proj|v_proj)/b$", P(None, "model")),
    (r"text/layers/attn/o_proj/w$", P(None, "model", None)),
    (r"text/layers/mlp/(gate_proj|up_proj)/w$", P(None, None, "model")),
    (r"text/layers/mlp/down_proj/w$", P(None, "model", None)),
    (r"text/embed_tokens/w$", P(None, "model")),
    (r"text/lm_head/w$", P(None, "model")),
    # ViT blocks (stacked [G, ...] or [G, W, ...] scan layouts): shard the
    # trailing in/out dims, replicate the leading stack dims
    (r"vision_tower/blocks/window/attn/qkv/w$", P(None, None, None, "model")),
    (r"vision_tower/blocks/window/attn/proj/w$", P(None, None, "model", None)),
    (r"vision_tower/blocks/window/mlp/(gate_proj|up_proj)/w$",
     P(None, None, None, "model")),
    (r"vision_tower/blocks/window/mlp/down_proj/w$",
     P(None, None, "model", None)),
    (r"vision_tower/blocks/full/attn/qkv/w$", P(None, None, "model")),
    (r"vision_tower/blocks/full/attn/proj/w$", P(None, "model", None)),
    (r"vision_tower/blocks/full/mlp/(gate_proj|up_proj)/w$",
     P(None, None, "model")),
    (r"vision_tower/blocks/full/mlp/down_proj/w$", P(None, "model", None)),
    # everything else (DaViT, HFRE, projectors, norms) replicated
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_shardings(params, mesh: Mesh):
    """PartitionSpec tree for a param pytree, by path rules. Dimensions that
    don't divide evenly by the mesh axis fall back to replication (XLA
    requires even shards for NamedSharding on weight matrices)."""
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))

    def spec_for(path, leaf):
        s = _path_str(path)
        # int8-quantized leaves reuse the full-precision rules: w_q has w's
        # exact layout; a linear's per-out-channel scale is w's spec with
        # the `in` axis (second-to-last) dropped. The embedding's per-ROW
        # scale ([V] against w_q [V, D~model]) correctly degrades to
        # replicated via the divisibility check below.
        if s.endswith("/w_q"):
            s = s[:-2]
        elif s.endswith("/scale"):
            if s.endswith("embed_tokens/scale"):
                # per-ROW scale [V]; w_q shards D, so V stays whole
                return NamedSharding(mesh, P())
            s = s[: -len("scale")] + "w"
            for pat, spec in _RULES:
                if re.search(pat, s):
                    spec = P(*(spec[:-2] + spec[-1:])) if len(spec) >= 2 \
                        else spec
                    if all(a is None for a in spec):
                        spec = P()
                    ok = all(
                        name is None
                        or (dim < leaf.ndim
                            and leaf.shape[dim] % axis_sizes[name] == 0)
                        for dim, name in enumerate(spec))
                    return NamedSharding(mesh, spec if ok else P())
            return NamedSharding(mesh, P())
        for pat, spec in _RULES:
            if re.search(pat, s):
                # verify divisibility per sharded dim
                ok = True
                for dim, name in enumerate(spec):
                    if name is None:
                        continue
                    if dim >= leaf.ndim or leaf.shape[dim] % axis_sizes[name]:
                        ok = False
                        break
                return NamedSharding(mesh, spec if ok else P())
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh: Mesh):
    """Place a param pytree onto the mesh with the TP plan."""
    shardings = param_shardings(params, mesh)
    return jax.device_put(params, shardings)


def data_sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
