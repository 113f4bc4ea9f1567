"""PatchGAN discriminator for VQGAN-VAE adversarial training.

Rebuild of the discriminator the inherited ``VQGanVAE`` trains against
(dalle2-pytorch vqgan_vae.py; the reference imports VQGanVAE at
/root/reference/dalle2_video/dalle2_video.py:14 but never trains one —
NullVQGanVAE ships). Semantics follow the taming-transformers
NLayerDiscriminator that dalle2-pytorch mirrors: stride-2 4x4 conv
pyramid, LeakyReLU(0.2), channel cap at 8x base width, 1-channel patch
logits map.

TPU-first: frame-wise 2D convs over the folded (B*T) batch (same layout
rule as every other conv in this repo), GroupNorm instead of BatchNorm
(batch statistics don't shard cleanly across a data-parallel mesh and
bf16 running stats drift; documented divergence — normalization choice,
not architecture).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from dalle2_video_tpu.models.layers import torch_kernel_init


class PatchDiscriminator(nn.Module):
    """(B, T, H, W, C) video -> (B*T, H', W', 1) patch realness logits."""

    base_dim: int = 64
    num_layers: int = 3
    groups: int = 8

    @nn.compact
    def __call__(self, video: jnp.ndarray) -> jnp.ndarray:
        b, t, h, w, c = video.shape
        x = video.reshape(b * t, h, w, c)
        x = nn.Conv(self.base_dim, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    kernel_init=torch_kernel_init)(x)
        x = nn.leaky_relu(x, 0.2)
        mult = 1
        for i in range(1, self.num_layers + 1):
            mult = min(2**i, 8)
            stride = 2 if i < self.num_layers else 1
            x = nn.Conv(
                self.base_dim * mult, (4, 4), strides=(stride, stride),
                padding=((1, 1), (1, 1)), use_bias=False,
                kernel_init=torch_kernel_init,
            )(x)
            x = nn.GroupNorm(num_groups=min(self.groups, self.base_dim * mult))(x)
            x = nn.leaky_relu(x, 0.2)
        return nn.Conv(1, (4, 4), strides=(1, 1), padding=((1, 1), (1, 1)),
                       kernel_init=torch_kernel_init)(x)


def hinge_d_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray) -> jnp.ndarray:
    """Discriminator hinge loss (taming-transformers/vqgan default)."""
    return 0.5 * (
        jnp.mean(nn.relu(1.0 - logits_real)) + jnp.mean(nn.relu(1.0 + logits_fake))
    )


def hinge_g_loss(logits_fake: jnp.ndarray) -> jnp.ndarray:
    """Generator adversarial term: push fake logits up."""
    return -jnp.mean(logits_fake)
