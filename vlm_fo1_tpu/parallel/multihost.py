"""Multi-host / multi-slice meshes: ICI within a slice, DCN across slices.

The reference is single-process, single-GPU (SURVEY.md §2.4). This module is
the growth path beyond one host: `initialize_distributed()` wraps
`jax.distributed.initialize` for multi-process SPMD launches, and
`create_hybrid_mesh()` builds a (data, model) mesh whose **model axis always
rides ICI** (intra-slice links) while the slower DCN (inter-slice network)
only ever carries the data axis's gradient/eval all-reduces — the standard
TPU-pod layout: TP collectives are per-layer and latency-bound, DP
collectives are once-per-step and bandwidth-bound.

The resulting mesh uses the same ("data", "model") axis names as
`sharding.create_mesh`, so every NamedSharding rule, the serving pipeline,
and `dryrun_multichip` work unchanged on a multi-slice mesh.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Initialize multi-process JAX (no-op when already initialized or when
    running single-process with no coordinator configured).

    On Cloud TPU pods the three arguments are auto-detected from the
    environment and may all be None; elsewhere pass them explicitly.
    """
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (ValueError, RuntimeError):
        # single-process run (no coordinator env) — a 1-process "cluster"
        if coordinator_address is not None:
            raise


def create_hybrid_mesh(ici_data: int = 1, ici_model: int = 1,
                       num_slices: int = 1, devices=None) -> Mesh:
    """Build a ("data", "model") mesh over `num_slices` slices.

    Per slice the devices form an (ici_data, ici_model) ICI mesh; slices are
    stacked along the data axis, so the final mesh is
    (num_slices * ici_data, ici_model) with the model axis entirely
    intra-slice. Falls back to a plain reshape when the devices carry no
    slice topology (CPU/virtual devices in tests).
    """
    if devices is None:
        devices = jax.devices()
    n = num_slices * ici_data * ici_model
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    devices = devices[:n]

    has_slices = (num_slices > 1
                  and getattr(devices[0], "slice_index", None) is not None)
    if has_slices:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            (ici_data, ici_model), (num_slices, 1), devices=devices)
    else:
        # no slice topology (single slice, or virtual/CPU devices): group
        # consecutive device ids per "slice" so the model axis stays within
        # a contiguous block — the best proxy for ICI locality
        arr = np.array(devices).reshape(
            num_slices, ici_data, ici_model).reshape(-1, ici_model)
    return Mesh(arr, axis_names=("data", "model"))
