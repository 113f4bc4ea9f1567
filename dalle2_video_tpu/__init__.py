"""dalle2_video_tpu — a TPU-native (JAX/XLA/Pallas/pjit) text-to-video
diffusion framework with the capabilities of SeanNobel/DALLE2-video.

Layer map (mirrors SURVEY.md §1, rebuilt TPU-first):
  diffusion/  pure DDPM math (schedules, q/p process, VLB)
  ops/        TPU ops: resize, blur, pixel-shuffle, attention, Pallas kernels
  models/     UNet3D, ViViT video encoder, diffusion prior, VAEs
  engine/     VideoDecoder cascade (training loss + scan-based sampling)
  train/      GSPMD trainers (optax, EMA, orbax checkpointing)
  parallel/   mesh + sharding rules
  data/       preprocessing, datasets, CLIP BPE tokenizer
  utils/      config, logging, metrics
"""

__version__ = "0.1.0"
