"""Training checkpoint save / resume (orbax).

The reference is load-only (SURVEY.md §5: safetensors scan, no save/resume);
this adds the save side for the training capability: params + optimizer
state + step, atomically, with restore-into-matching-structure.
"""

from __future__ import annotations

import os

import jax


def save_checkpoint(ckpt_dir: str, step: int, params, opt_state=None,
                    extra: dict | None = None) -> str:
    """Write an atomic checkpoint under ckpt_dir/step_<N>. Returns the path."""
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    payload = {"params": params, "step": step}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    if extra:
        payload["extra"] = extra
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(ckpt_dir: str) -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_", 1)[1]))
            except ValueError:
                continue
    if not steps:
        return None
    return os.path.join(ckpt_dir, f"step_{max(steps)}")


def restore_checkpoint(path: str, template) -> dict:
    """Restore into the structure of `template` (same pytree as saved)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=template)


def save_params_safetensors(path: str, params) -> None:
    """Flat safetensors export of a param pytree (interop / cold storage)."""
    from safetensors.numpy import save_file
    import numpy as np

    flat = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}.{k}" if prefix else k)
        elif isinstance(node, list):
            for i, v in enumerate(node):
                walk(v, f"{prefix}.{i}")
        else:
            flat[prefix] = np.asarray(node)

    walk(params, "")
    save_file(flat, path)


def load_params_safetensors(path: str):
    """Inverse of save_params_safetensors: rebuild the nested pytree from
    flat 'a.b.0.c' keys (contiguous integer keys -> list)."""
    from safetensors.numpy import load_file

    flat = load_file(path)
    root: dict = {}
    for key, arr in flat.items():
        parts = key.split(".")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr

    def listify(node):
        if not isinstance(node, dict):
            return node
        out = {k: listify(v) for k, v in node.items()}
        if out and all(k.isdigit() for k in out):
            idxs = sorted(int(k) for k in out)
            if idxs == list(range(len(idxs))):
                return [out[str(i)] for i in idxs]
        return out

    return listify(root)
