from dalle2_video_tpu.utils.config import (
    apply_overrides,
    config_from_argv,
    load_config,
)
from dalle2_video_tpu.utils.contrastive import (
    clip_loss,
    l2_normalize,
    retrieval_metrics,
    sharded_clip_loss,
)
from dalle2_video_tpu.utils.logging import MetricsLogger

__all__ = [
    "MetricsLogger",
    "apply_overrides",
    "clip_loss",
    "config_from_argv",
    "l2_normalize",
    "load_config",
    "retrieval_metrics",
    "sharded_clip_loss",
]
