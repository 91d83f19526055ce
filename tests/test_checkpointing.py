"""Training checkpoint save/resume round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlm_fo1_tpu.training.checkpointing import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
    save_params_safetensors,
)


def _tree(seed=0):
    k = jax.random.PRNGKey(seed)
    return {"a": {"w": jax.random.normal(k, (4, 8)),
                  "b": jnp.zeros(8)},
            "layers": [{"w": jnp.ones((2, 2))}, {"w": jnp.full((2, 2), 3.0)}]}


def test_save_restore_roundtrip(tmp_path):
    params = _tree()
    p1 = save_checkpoint(str(tmp_path), 10, params)
    p2 = save_checkpoint(str(tmp_path), 25, jax.tree.map(lambda x: x + 1,
                                                         params))
    assert latest_checkpoint(str(tmp_path)) == p2

    template = {"params": _tree(1), "step": 0}
    restored = restore_checkpoint(p1, template)
    assert restored["step"] == 10
    for a, b in zip(jax.tree.leaves(restored["params"]),
                    jax.tree.leaves(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_safetensors_export(tmp_path):
    from safetensors.numpy import load_file

    params = _tree()
    path = str(tmp_path / "params.safetensors")
    save_params_safetensors(path, params)
    flat = load_file(path)
    assert "a.w" in flat and "layers.1.w" in flat
    np.testing.assert_allclose(flat["layers.1.w"], 3.0)
