from dalle2_video_tpu.engine.conditioner import (
    LowresConditionerConfig,
    lowres_condition,
    noise_video,
)
from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig

__all__ = [
    "LowresConditionerConfig",
    "VideoDecoder",
    "VideoDecoderConfig",
    "lowres_condition",
    "noise_video",
]
