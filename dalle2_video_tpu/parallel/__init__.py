from dalle2_video_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    create_mesh,
    replicated,
    shard_batch,
    shard_with,
)
from dalle2_video_tpu.parallel.pipeline import (
    pipeline_apply,
    stack_transformer_params,
    unstack_transformer_params,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "create_mesh",
    "replicated",
    "shard_batch",
    "shard_with",
    "pipeline_apply",
    "stack_transformer_params",
    "unstack_transformer_params",
]
