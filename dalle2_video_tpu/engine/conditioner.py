"""Low-resolution cascade conditioning (blur/noise augmentation).

TPU-native rewrite of reference ``LowresVideoConditioner``
(/root/reference/dalle2_video/dalle2_video.py:1044-1166): downsample-first,
50%-probability Gaussian blur, resize to target, optional Imagen-style
noising with a dedicated linear-1000 schedule.

RNG discipline: the reference's global ``random.random()`` coin and
``torch.randn`` draws become explicit key splits; the blur coin is one
Bernoulli per call (matching the reference's whole-batch coin), executed
with ``lax.cond`` so the blur cost is only paid when drawn.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from dalle2_video_tpu.diffusion import DiffusionSchedule
from dalle2_video_tpu.ops.video import (
    gaussian_blur_video,
    resize_video,
    resize_video_time,
)


@dataclasses.dataclass(frozen=True)
class LowresConditionerConfig:
    downsample_first: bool = True
    use_blur: bool = True
    blur_prob: float = 0.5
    blur_sigma: float = 0.6
    blur_kernel_size: int = 3
    use_noise: bool = False
    input_video_range: Tuple[float, float] = (0.0, 1.0)
    # normalize/unnormalize applied around noising when auto-normalizing
    auto_normalize: bool = True


def make_noise_schedule() -> DiffusionSchedule:
    """The conditioner's own schedule (reference :1069-1072: linear, 1000, l2)."""
    return DiffusionSchedule.create("linear", timesteps=1000, loss_type="l2")


def noise_video(
    rng: jax.Array,
    cond_video: jnp.ndarray,
    schedule: DiffusionSchedule,
    cfg: LowresConditionerConfig,
    noise_levels: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Imagen-style aug-noising of the conditioning video (reference :1075-1089).

    `rng` may be a single key or per-row keys (utils/keys.py) — with
    per-row keys both the level draw and the noise are vmapped per sample."""
    from dalle2_video_tpu.utils import keys as keyutil

    b = cond_video.shape[0]
    k_t, k_n = keyutil.split(rng)
    if cfg.auto_normalize:
        cond_video = cond_video * 2.0 - 1.0
    if noise_levels is None:
        if keyutil.is_batched(k_t):
            noise_levels = jax.vmap(
                lambda k: schedule.sample_random_times(k, 1)[0]
            )(k_t)
        else:
            noise_levels = schedule.sample_random_times(k_t, b)
    noise = keyutil.normal(k_n, cond_video.shape, cond_video.dtype)
    cond_video = schedule.q_sample(cond_video, noise_levels, noise)
    if cfg.auto_normalize:
        cond_video = (cond_video + 1.0) * 0.5
    return cond_video, noise_levels


def lowres_condition(
    rng: jax.Array,
    video: jnp.ndarray,
    cfg: LowresConditionerConfig,
    *,
    target_frame_size: int,
    downsample_frame_size: Optional[int] = None,
    target_frame_number: Optional[int] = None,
    downsample_frame_number: Optional[int] = None,
    noise_schedule: Optional[DiffusionSchedule] = None,
    should_blur: bool = True,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Build the conditioning video for an SR stage (reference forward :1115-1166).

    Extends the reference with temporal downsampling/upsampling via the
    ``*_frame_number`` args (the reference accepted but ignored them —
    SURVEY.md §2e.6); enables real temporal-SR cascades.
    """
    k_blur_coin, k_noise = jax.random.split(rng)

    if cfg.downsample_first and downsample_frame_size is not None:
        video = resize_video(
            video, downsample_frame_size, method="nearest",
            clamp_range=cfg.input_video_range,
        )
    if cfg.downsample_first and downsample_frame_number is not None:
        video = resize_video_time(video, downsample_frame_number, method="nearest")

    if cfg.use_blur and should_blur and cfg.blur_prob > 0:
        coin = jax.random.bernoulli(k_blur_coin, cfg.blur_prob)
        video = jax.lax.cond(
            coin,
            lambda v: gaussian_blur_video(v, cfg.blur_kernel_size, cfg.blur_sigma),
            lambda v: v,
            video,
        )

    video = resize_video(
        video, target_frame_size, method="nearest", clamp_range=cfg.input_video_range
    )
    if target_frame_number is not None:
        video = resize_video_time(video, target_frame_number, method="nearest")

    noise_levels = None
    if cfg.use_noise:
        assert noise_schedule is not None
        video, noise_levels = noise_video(k_noise, video, noise_schedule, cfg)

    return video, noise_levels
