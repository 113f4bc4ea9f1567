from dalle2_video_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    create_mesh,
    replicated,
    shard_batch,
    shard_with,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "create_mesh",
    "replicated",
    "shard_batch",
    "shard_with",
]
