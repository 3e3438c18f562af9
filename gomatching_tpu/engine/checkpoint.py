"""Parameter checkpoint I/O.

Native format: flat ``.npz`` with '/'-joined pytree paths (fast, dependency-free).
Orbax directories are also supported for training state. The PyTorch->JAX weight
converter for reference DeepSolo/GoMatching checkpoints lives in
``tools/convert_torch_weights.py``.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np


def _flatten(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_params(path: str, params) -> None:
    import jax

    host = jax.device_get(params)
    np.savez(path, **_flatten(host))


def load_params(path: str):
    if os.path.isdir(path):  # orbax checkpoint dir
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(path))
    data = np.load(path, allow_pickle=False)
    return _unflatten({k: data[k] for k in data.files})


# ---------------------------------------------------------------------------
# full train-state checkpointing (params + optimizer + step), orbax-backed —
# the resume_or_load semantics of the reference (train_net.py:62-73)
# ---------------------------------------------------------------------------
def save_train_state(ckpt_dir: str, step: int, state_tree) -> str:
    """Save an arbitrary pytree (e.g. {'trainable', 'opt_state', 'step'}) as
    ``<ckpt_dir>/state_<step>``; returns the path."""
    import jax
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"state_{step:07d}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state_tree), force=True)
    ckptr.wait_until_finished()
    return path


def latest_train_state(ckpt_dir: str):
    """-> (path, step) of the newest saved train state, or (None, 0)."""
    if not os.path.isdir(ckpt_dir):
        return None, 0
    best = None
    best_step = 0
    for name in os.listdir(ckpt_dir):
        if name.startswith("state_") and os.path.isdir(os.path.join(ckpt_dir, name)):
            try:
                step = int(name.split("_")[1])
            except ValueError:
                continue
            if step >= best_step:
                best, best_step = os.path.join(ckpt_dir, name), step
    return best, best_step


def load_train_state(path: str, target=None):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        import jax

        return ckptr.restore(
            os.path.abspath(path), target=jax.tree.map(np.asarray, target)
        )
    return ckptr.restore(os.path.abspath(path))
