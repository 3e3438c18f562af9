"""Device mesh + sharding utilities (SPMD layer).

The reference's only parallelism is DDP data-parallel over GPUs
(train_net.py:186-209; SURVEY.md §2.7). The TPU-native equivalent is one
``jax.sharding.Mesh`` whose 'data' axis shards whole video clips (training) or
frame batches (inference); XLA inserts the gradient/metric collectives that the
reference issues manually (comm.reduce_dict, all_reduce(num_inst)). A 'model'
axis is provisioned for optional tensor sharding of the encoder at large input
sizes (DSText nq=300) — unused by the parity configs.

Multi-host: ``train_net.py --num-machines N --machine-rank R --dist-url ...``
calls ``jax.distributed.initialize()`` (train_net.maybe_init_distributed) before
``build_mesh``; ``jax.devices()`` then enumerates every host's chips and the
same code runs across slices (ICI within a slice, DCN across).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_mesh(cfg=None, devices=None) -> Mesh:
    """('data', 'model') mesh from TPU.MESH_DATA / TPU.MESH_MODEL
    (-1 = all remaining devices on the data axis)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    model = 1
    data = n
    if cfg is not None:
        model = max(int(cfg.TPU.MESH_MODEL), 1)
        data = int(cfg.TPU.MESH_DATA)
        if data <= 0:
            data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    return Mesh(devices.reshape(data, model), ("data", "model"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def clip_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (clip / frame-batch) sharding over 'data'."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch, mesh: Mesh):
    """device_put every array in the pytree with its leading axis on 'data'."""
    s = clip_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def shard_params(params, mesh: Mesh):
    """Replicate parameters across the mesh (DP: weights identical per chip)."""
    s = replicate(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), params)
