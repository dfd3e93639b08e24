from .mesh import (  # noqa: F401
    MeshSpec,
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
)
