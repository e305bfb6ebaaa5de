from texttoaudiogrounding_tpu.parallel.mesh import (
    batch_sharding,
    get_mesh,
    replicate,
    shard_batch,
)

__all__ = ["get_mesh", "batch_sharding", "shard_batch", "replicate"]
