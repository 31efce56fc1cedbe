from .mesh import (
    data_parallel_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
