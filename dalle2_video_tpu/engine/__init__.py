from dalle2_video_tpu.engine.conditioner import (
    LowresConditionerConfig,
    lowres_condition,
    noise_video,
)
from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig
from dalle2_video_tpu.engine.longvideo import generate_long_video

__all__ = [
    "LowresConditionerConfig",
    "VideoDecoder",
    "VideoDecoderConfig",
    "generate_long_video",
    "lowres_condition",
    "noise_video",
]
