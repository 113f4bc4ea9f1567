from dalle2_video_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from dalle2_video_tpu.train.ema import EMAConfig, EMAState, ema_init, ema_update
from dalle2_video_tpu.train.trainer import (
    DecoderTrainer,
    DecoderTrainerConfig,
    TrainState,
)

__all__ = [
    "DecoderTrainer",
    "DecoderTrainerConfig",
    "EMAConfig",
    "EMAState",
    "TrainState",
    "ema_init",
    "ema_update",
    "load_checkpoint",
    "save_checkpoint",
]
