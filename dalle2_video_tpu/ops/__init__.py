from dalle2_video_tpu.ops.video import (
    from_torch_layout,
    gaussian_blur_video,
    normalize_neg_one_to_one,
    pixel_shuffle_spatial,
    pixel_unshuffle_spatial,
    resize_video,
    resize_video_time,
    to_torch_layout,
    unnormalize_zero_to_one,
)

__all__ = [
    "from_torch_layout",
    "gaussian_blur_video",
    "normalize_neg_one_to_one",
    "pixel_shuffle_spatial",
    "pixel_unshuffle_spatial",
    "resize_video",
    "resize_video_time",
    "to_torch_layout",
    "unnormalize_zero_to_one",
]
