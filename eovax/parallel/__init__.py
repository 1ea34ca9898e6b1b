from eovax.parallel.mesh import (  # noqa: F401
    ShardingFallbackWarning,
    batch_sharding,
    init_distributed,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)
