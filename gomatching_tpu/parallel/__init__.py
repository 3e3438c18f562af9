from .mesh import (  # noqa: F401
    build_mesh,
    clip_sharding,
    replicate,
    shard_batch,
    shard_params,
)
