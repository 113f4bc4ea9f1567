from dalle2_video_tpu.diffusion.schedule import (
    NAT,
    DiffusionSchedule,
    approx_standard_normal_cdf,
    discretized_gaussian_log_likelihood,
    make_beta_schedule,
    normal_kl,
)

__all__ = [
    "NAT",
    "DiffusionSchedule",
    "approx_standard_normal_cdf",
    "discretized_gaussian_log_likelihood",
    "make_beta_schedule",
    "normal_kl",
]
