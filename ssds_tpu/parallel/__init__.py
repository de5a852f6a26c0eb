from ssds_tpu.parallel.sharding import (
    batch_sharding,
    create_mesh,
    image_sharding,
    replicate,
    shard_batch,
)

__all__ = ["create_mesh", "batch_sharding", "image_sharding", "replicate",
           "shard_batch"]
