from .mesh import (  # noqa: F401
    MeshSpec,
    batch_sharding,
    initialize_distributed,
    make_mesh,
    replicated,
    shard_batch,
)
