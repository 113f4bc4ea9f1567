"""UnetTemporalConv — frame-wise 2D U-Net + temporal conv mixer.

The reference ships this as a "very preliminary ... probably doesn't work"
alternative (reference dalle2_video.py:955-1041, SURVEY.md §2e.4): a 2D
DALLE2 U-Net applied per frame (time folded into batch) followed by one
Conv3d with kernel (3,1,1) mixing adjacent frames. We keep the concept and
make it work: the spatial U-Net is UNet3D with per-frame attention (every
conv is already space-only), and the temporal mixer is a zero-init residual
temporal conv so the model starts as exactly the per-frame 2D unet.

Drop-in compatible with VideoDecoder: same __call__ signature as UNet3D.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from dalle2_video_tpu.models.unet3d import UNet3D, UNet3DConfig


class TemporalConv(nn.Module):
    """(k,1,1) conv over the frame axis, SAME padding; zero-init residual."""

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        # fold space into batch: conv over time only
        y = jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(b * h * w, t, c)
        y = nn.Conv(
            self.features,
            (self.kernel_size,),
            padding="SAME",
            kernel_init=nn.initializers.zeros,
            name="conv",
        )(y)
        y = y.reshape(b, h, w, t, self.features)
        return jnp.transpose(y, (0, 3, 1, 2, 4))


class UnetTemporalConv(nn.Module):
    """Per-frame spatial U-Net + residual temporal conv mixer."""

    cfg: UNet3DConfig

    @nn.compact
    def __call__(self, x, time, **kwargs):
        spatial_cfg = dataclasses.replace(self.cfg, joint_time_attention=False)
        out = UNet3D(spatial_cfg, name="unet2d")(x, time, **kwargs)
        # zero-init mixer: identity at init, learns temporal coherence
        return out + TemporalConv(out.shape[-1], name="temporal_conv")(out)
