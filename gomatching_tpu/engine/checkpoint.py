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
